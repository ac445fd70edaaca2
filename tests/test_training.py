"""Training subsystem: EMA parity, schedulers vs reference, optimizer groups,
trainer loop on the tiny two-diffuser model, checkpoint round-trip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from _reference import ref_module  # noqa: E402

TINY_CFG = {"args": {
    "diffuser_cfg_list": [
        ["image", {"type": "openai_unet_2d_next", "args": dict(
            in_channels=4, model_channels=32, out_channels=4,
            num_res_blocks=[1, 1], attention_resolutions=[1, 2],
            channel_mult=[1, 2], num_heads=4, context_dim=16)}],
        ["text", {"type": "openai_unet_0d_next", "args": dict(
            input_channels=24, model_channels=32, output_channels=24,
            num_noattn_blocks=[1, 1], channel_mult=[1, 2], second_dim=[4, 4],
            with_attn=[True, True], num_heads=4, context_dim=16)}],
    ],
    "global_layer_ptr": "image", "timesteps": 100,
    "beta_linear_start": 0.00085, "beta_linear_end": 0.012,
}}


def test_ema_matches_reference():
    from vdtpu.training.ema import ema_init, ema_params, ema_update
    ref_ema = ref_module("lib.model_zoo.ema")
    torch.manual_seed(0)
    lin = torch.nn.Linear(4, 4)
    lit = ref_ema.LitEma(lin, decay=0.999)

    # copy=True: jax CPU arrays can zero-copy-alias the torch storage, which
    # the in-place updates below would silently mutate
    params = {"kernel": jnp.asarray(np.array(lin.weight.detach().numpy(), copy=True)),
              "bias": jnp.asarray(np.array(lin.bias.detach().numpy(), copy=True))}
    state = ema_init(params)

    for step in range(5):
        with torch.no_grad():
            lin.weight += 0.1
            lin.bias -= 0.05
        lit(lin)
        params = {"kernel": params["kernel"] + 0.1, "bias": params["bias"] - 0.05}
        state = ema_update(state, params, decay=0.999)

    ref_w = dict(lit.named_buffers())["weight"].numpy()
    ref_b = dict(lit.named_buffers())["bias"].numpy()
    np.testing.assert_allclose(np.asarray(ema_params(state)["kernel"]), ref_w, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ema_params(state)["bias"]), ref_b, rtol=1e-5)


def test_schedulers_match_reference_shapes():
    from vdtpu.training.schedulers import (
        ConstantScheduler, LambdaWarmUpCosineScheduler, MultiStageScheduler,
        PolyScheduler, SequentialScheduler, with_pg_lrscale)
    c = ConstantScheduler(lr=0.1, num_itr=10)
    assert c[0] == c[9] == 0.1
    p = PolyScheduler(start_lr=1.0, end_lr=0.0, num_itr=11, power=1.0)
    np.testing.assert_allclose(p[5], 0.5, atol=1e-9)
    m = MultiStageScheduler(start_lr=1.0, milestones=[5, 8], gamma=0.1, num_itr=10)
    assert m[4] == 1.0 and abs(m[5] - 0.1) < 1e-12 and abs(m[8] - 0.01) < 1e-12
    s = SequentialScheduler([c, m])
    assert s.step_num == 20 and s[3] == 0.1 and s[14] == 1.0
    w = LambdaWarmUpCosineScheduler(base_lr=2.0, warm_up_steps=10, lr_min=0.0,
                                    lr_max=1.0, lr_start=0.0, max_decay_steps=100)
    assert w[0] == 0.0 and abs(w[10] - 2.0) < 1e-9 and w[100] < 1e-9
    pg = with_pg_lrscale(c, {"diffuser_image_data": 1.0, "diffuser_text_data": 0.5})
    assert pg["diffuser_text_data"](0) == 0.05


def test_optimizer_parameter_groups():
    from vdtpu.models.vd import VDModel
    from vdtpu.training.optim import get_optimizer, parameter_group_of
    model = VDModel.from_config(TINY_CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    assert parameter_group_of(("image", "time_embed", "0", "kernel")) == \
        "diffuser_image_global"
    assert parameter_group_of(("text", "data_blocks.0.0", "kernel")) == \
        "diffuser_text_data"
    tx, set_lr = get_optimizer(
        "adamw", params=params,
        pg_lrscale={"diffuser_image_context": 0.5})
    opt_state = tx.init(params)
    opt_state = set_lr(opt_state, 1e-3)
    import optax
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    # context group should get half the step size of data group
    up_ctx = updates["image"]["context_blocks.0.0"]["proj_in"]["kernel"]
    up_dat = updates["image"]["data_blocks.0.0"]["kernel"]
    ratio = np.abs(np.asarray(up_ctx)).mean() / np.abs(np.asarray(up_dat)).mean()
    np.testing.assert_allclose(ratio, 0.5, rtol=1e-3)


def test_trainer_loop_and_checkpoint(tmp_path):
    from vdtpu.models.vd import VDModel
    from vdtpu.training.harness import Trainer
    from vdtpu.training.optim import get_optimizer
    from vdtpu.training.schedulers import ConstantScheduler
    from vdtpu.training.checkpoints import restore_checkpoint

    model = VDModel.from_config(TINY_CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    tx, set_lr = get_optimizer("adamw", params=params)
    trainer = Trainer(model, params, tx, set_lr,
                      scheduler=ConstantScheduler(lr=1e-4),
                      ema_decay=0.999, grad_accum=2, log_every=2,
                      ckpt_dir=str(tmp_path))

    def batches():
        rs = np.random.RandomState(0)
        while True:
            yield {"x": rs.randn(4, 8, 8, 4).astype(np.float32),
                   "ctx": rs.randn(4, 7, 16).astype(np.float32)}

    state = trainer.run(batches(), num_iters=3)
    assert state.step == 3
    assert state.ema is not None and int(state.ema.num_updates) == 3

    restored = restore_checkpoint(str(tmp_path), "last")
    assert restored["step"] == 3
    w0 = np.asarray(state.params["image"]["data_blocks.0.0"]["kernel"])
    w1 = np.asarray(restored["params"]["image"]["data_blocks.0.0"]["kernel"])
    np.testing.assert_allclose(w0, w1)


def test_evaluators():
    from vdtpu.training.evaluator import (
        ClipSimilarityEvaluator, FIDEvaluator, frechet_distance, get_evaluator)
    rs = np.random.RandomState(0)
    feats = lambda imgs: np.asarray(imgs).reshape(len(imgs), -1)[:, :8]
    fid = get_evaluator("fid", feature_fn=feats)
    a = rs.randn(64, 2, 2, 2)
    fid.add_batch(a, a)
    assert abs(fid.summarize()["fid"]) < 1e-6
    fid.clear()
    fid.add_batch(rs.randn(64, 2, 2, 2) + 3.0, a)
    assert fid.summarize()["fid"] > 1.0

    sim = ClipSimilarityEvaluator(
        image_embed_fn=lambda im: feats(im), text_embed_fn=lambda tx: feats(tx))
    x = rs.randn(8, 2, 2, 2)
    sim.add_batch(x, x)
    np.testing.assert_allclose(sim.summarize()["clip_similarity"], 1.0, atol=1e-6)


def test_remat_flags_reach_diffusers_through_system():
    """launch.main passes train: use_checkpoint / remat_max_channels into
    VDSystem; they must land on the MultiDiffuser (and thus each UNet)."""
    from vdtpu.serving.api import VDSystem
    s = VDSystem("vd_test_tiny", use_checkpoint=True, remat_max_channels=64)
    assert s.model.diffuser.use_checkpoint is True
    assert s.model.diffuser.remat_max_channels == 64
    assert VDSystem("vd_test_tiny").model.diffuser.use_checkpoint is False


def _tiny_batches(n=4):
    rs = np.random.RandomState(7)
    while True:
        yield {"x": rs.randn(n, 8, 8, 4).astype(np.float32),
               "ctx": rs.randn(n, 7, 16).astype(np.float32)}


def test_freeze_groups_hold_params_and_carry_no_moments():
    """get_optimizer(freeze=...) + Trainer(freeze_groups=...): the frozen
    subtree's params never move, Adam holds NO mu/nu for it (the
    single-chip full-size memory lever, optim.py), and set_lr skips the
    stateless set_to_zero branch."""
    from vdtpu.models.vd import VDModel
    from vdtpu.training.harness import Trainer
    from vdtpu.training.optim import get_optimizer
    from vdtpu.training.schedulers import ConstantScheduler

    model = VDModel.from_config(TINY_CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    freeze = ("diffuser_text_data", "diffuser_text_global")
    tx, set_lr = get_optimizer("adamw", params=params, freeze=list(freeze))
    trainer = Trainer(model, params, tx, set_lr,
                      scheduler=ConstantScheduler(lr=1e-3),
                      ema_decay=0.999, log_every=10,
                      freeze_groups=freeze)
    frozen_leaf = sorted(params["text"]["data_blocks.0.0"])[0]
    w_frozen0 = np.asarray(params["text"]["data_blocks.0.0"][frozen_leaf])
    w_train0 = np.asarray(params["image"]["data_blocks.0.0"]["kernel"])

    state = trainer.run(_tiny_batches(), num_iters=2)

    w_frozen1 = np.asarray(state.params["text"]["data_blocks.0.0"][frozen_leaf])
    w_train1 = np.asarray(state.params["image"]["data_blocks.0.0"]["kernel"])
    np.testing.assert_array_equal(w_frozen0, w_frozen1)
    assert np.abs(w_train1 - w_train0).max() > 0

    # set_to_zero holds NO optimizer state for the frozen group
    frozen_state = state.opt_state.inner_states["frozen"]
    assert not jax.tree_util.tree_leaves(frozen_state)
    # ... while the default group carries full Adam moments
    assert jax.tree_util.tree_leaves(state.opt_state.inner_states["default"])


def test_optimizer_mu_dtype_bfloat16():
    """optimizer_args.mu_dtype: Adam's mu rides bf16 (halves moment HBM)."""
    from vdtpu.models.vd import VDModel
    from vdtpu.training.optim import get_optimizer

    model = VDModel.from_config(TINY_CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    kshape = params["image"]["data_blocks.0.0"]["kernel"].shape
    tx, _ = get_optimizer("adamw", params=params, mu_dtype="bfloat16")
    st = tx.init(params)
    leaves = [l for l in jax.tree_util.tree_leaves(st)
              if hasattr(l, "shape") and l.shape == kshape]
    assert leaves, "no param-shaped moment leaves found"
    assert any(l.dtype == jnp.bfloat16 for l in leaves), \
        [l.dtype for l in leaves]


def test_trainer_donate_matches_undonated():
    """donate=True (buffer donation into the jitted step) must not change
    the training trajectory — params and EMA match the undonated run
    bit-for-bit after 3 steps. (On CPU donation is advisory; on TPU it
    reuses the old state's HBM — the full-size memory lever.)"""
    from vdtpu.models.vd import VDModel
    from vdtpu.training.harness import Trainer
    from vdtpu.training.optim import get_optimizer
    from vdtpu.training.schedulers import ConstantScheduler

    model = VDModel.from_config(TINY_CFG)

    def run(donate):
        params = model.init_params(jax.random.PRNGKey(0))
        tx, set_lr = get_optimizer("adamw", params=params)
        tr = Trainer(model, params, tx, set_lr,
                     scheduler=ConstantScheduler(lr=1e-3),
                     ema_decay=0.999, log_every=10, donate=donate)
        return tr.run(_tiny_batches(), num_iters=3)

    a, b = run(False), run(True)
    for pa, pb in zip(jax.tree_util.tree_leaves(a.params),
                      jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for ea, eb in zip(jax.tree_util.tree_leaves(a.ema),
                      jax.tree_util.tree_leaves(b.ema)):
        np.testing.assert_array_equal(np.asarray(ea), np.asarray(eb))
