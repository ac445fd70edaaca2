"""Round-2 regression tests for the two round-1 runtime gaps:

1. tp>1 training through the Trainer must actually shard (round 1 jitted the
   step with replicated param in_shardings, silently un-sharding TP params),
   and a tp=2 run must match a tp=1 run numerically.
2. Resume must restore params + opt_state + EMA + step and continue the exact
   trajectory (ref --resume_step/--resume_weight re-entry,
   /root/reference/lib/utils.py:79-85 — which never restored optimizer state).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

TINY_CFG = {"args": {
    "diffuser_cfg_list": [
        ["image", {"type": "openai_unet_2d_next", "args": dict(
            in_channels=4, model_channels=32, out_channels=4,
            num_res_blocks=[1, 1], attention_resolutions=[1, 2],
            channel_mult=[1, 2], num_heads=4, context_dim=128)}],
        ["text", {"type": "openai_unet_0d_next", "args": dict(
            input_channels=24, model_channels=32, output_channels=24,
            num_noattn_blocks=[1, 1], channel_mult=[1, 2], second_dim=[4, 4],
            with_attn=[True, True], num_heads=4, context_dim=128)}],
    ],
    "global_layer_ptr": "image", "timesteps": 100,
    "beta_linear_start": 0.00085, "beta_linear_end": 0.012,
}}


def _make_trainer(mesh=None, ckpt_dir=None, grad_accum=1, async_ckpt=False,
                  ckpt_every=None):
    from vdtpu.models.vd import VDModel
    from vdtpu.parallel.mesh import shard_params
    from vdtpu.training.harness import Trainer
    from vdtpu.training.optim import get_optimizer
    from vdtpu.training.schedulers import ConstantScheduler
    model = VDModel.from_config(TINY_CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    if mesh is not None:
        params = shard_params(mesh, params)
    tx, set_lr = get_optimizer("adamw", params=params)
    return Trainer(model, params, tx, set_lr,
                   scheduler=ConstantScheduler(lr=1e-3),
                   ema_decay=0.999, grad_accum=grad_accum, mesh=mesh,
                   log_every=10**9, ckpt_dir=ckpt_dir,
                   ckpt_every=ckpt_every, async_ckpt=async_ckpt)


def _batches(skip=0):
    def gen():
        i = skip
        while True:
            rs = np.random.RandomState(1000 + i)
            yield {"x": rs.randn(8, 8, 8, 4).astype(np.float32),
                   "ctx": rs.randn(8, 7, 128).astype(np.float32)}
            i += 1
    return gen()


def _leaf(params):
    return np.asarray(jax.device_get(
        params["image"]["data_blocks.0.0"]["kernel"])).astype(np.float64)


def test_tp2_training_through_trainer_matches_tp1():
    from vdtpu.parallel.mesh import make_mesh
    t1 = _make_trainer(mesh=make_mesh(8, tp=1))
    t2 = _make_trainer(mesh=make_mesh(8, tp=2))
    s1 = t1.run(_batches(), num_iters=3)
    s2 = t2.run(_batches(), num_iters=3)

    # the Trainer's own jit must KEEP the tp sharding (round-1 bug: forced
    # replicated) — at least one updated param leaf stays tp-sharded
    flat = jax.tree_util.tree_leaves_with_path(s2.params)
    n_tp = sum(1 for _, leaf in flat
               if any(ax is not None for ax in leaf.sharding.spec))
    assert n_tp > 0, "tp=2 Trainer produced fully-replicated params"

    np.testing.assert_allclose(_leaf(s1.params), _leaf(s2.params),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(_leaf(s1.ema.shadow), _leaf(s2.ema.shadow),
                               atol=2e-5, rtol=1e-5)
    assert abs(t1.last_loss - t2.last_loss) < 1e-4


def test_resume_continues_exact_trajectory(tmp_path):
    # uninterrupted 4-step run
    ta = _make_trainer(ckpt_dir=str(tmp_path / "a"))
    sa = ta.run(_batches(), num_iters=4)

    # killed after 2 steps, then restored into a FRESH trainer
    tb = _make_trainer(ckpt_dir=str(tmp_path / "b"))
    tb.run(_batches(), num_iters=2)

    tc = _make_trainer(ckpt_dir=str(tmp_path / "b"))
    state = tc.restore()
    assert state.step == 2
    assert int(state.ema.num_updates) == 2
    # data loader fast-forwarded to where the stream stopped
    sc = tc.run(_batches(skip=2), num_iters=4)

    assert sc.step == 4
    np.testing.assert_allclose(_leaf(sa.params), _leaf(sc.params),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(_leaf(sa.ema.shadow), _leaf(sc.ema.shadow),
                               atol=1e-6, rtol=1e-6)
    # optimizer moments continued too (adam mu must match, not restart at 0)
    assert abs(ta.last_loss - tc.last_loss) < 1e-5


def test_restore_under_tp_mesh(tmp_path):
    """restore() re-places params under the Trainer's tp shardings."""
    from vdtpu.parallel.mesh import make_mesh
    mesh = make_mesh(8, tp=2)
    t1 = _make_trainer(mesh=mesh, ckpt_dir=str(tmp_path))
    t1.run(_batches(), num_iters=2)

    t2 = _make_trainer(mesh=mesh, ckpt_dir=str(tmp_path))
    state = t2.restore()
    assert state.step == 2
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    assert any(any(ax is not None for ax in leaf.sharding.spec)
               for _, leaf in flat)
    s2 = t2.run(_batches(skip=2), num_iters=3)
    assert s2.step == 3 and np.isfinite(t2.last_loss)


def test_async_checkpointing_commits_and_matches_sync(tmp_path):
    """async_ckpt=True hands cadence saves to orbax's commit thread; the run
    still ends with every tag on disk (run() waits on exit) and a restore
    from the async run reproduces the sync run's state bit-for-bit."""
    ts = _make_trainer(ckpt_dir=str(tmp_path / "sync"), ckpt_every=2)
    ss = ts.run(_batches(), num_iters=4)
    ta = _make_trainer(ckpt_dir=str(tmp_path / "async"), ckpt_every=2,
                       async_ckpt=True)
    sa = ta.run(_batches(), num_iters=4)
    # every cadence tag committed by the time run() returned
    for tag in ("iter_2", "iter_4", "last"):
        assert (tmp_path / "async" / tag).is_dir(), f"missing async tag {tag}"

    tb = _make_trainer(ckpt_dir=str(tmp_path / "async"))
    st = tb.restore()
    assert st.step == 4
    np.testing.assert_array_equal(_leaf(st.params), _leaf(sa.params))
    np.testing.assert_array_equal(_leaf(st.params), _leaf(ss.params))
    np.testing.assert_array_equal(_leaf(st.ema.shadow), _leaf(ss.ema.shadow))


def test_restore_waits_for_inflight_async_save(tmp_path):
    """restore_checkpoint must join an in-flight async save of the same tag
    (no half-written directory race)."""
    from vdtpu.training.checkpoints import restore_checkpoint, save_checkpoint
    t = _make_trainer()
    t.run(_batches(), num_iters=1)
    save_checkpoint(str(tmp_path), "t", t.state, block=False)
    payload = restore_checkpoint(str(tmp_path), "t")  # must not race
    assert int(np.asarray(payload["step"])) == 1
    np.testing.assert_array_equal(
        np.asarray(payload["params"]["image"]["data_blocks.0.0"]["kernel"]),
        _leaf(t.state.params))
