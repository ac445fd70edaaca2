"""System-level checkpoint round trip: VDSystem export -> flat torch-scheme
state_dict (diffuser./vae./ctx.*.model. prefixes) -> load back == identity."""
import numpy as np
import pytest

import jax

from vdtpu.serving.api import VDSystem


@pytest.fixture(scope="module")
def system():
    return VDSystem("vd_test_tiny").init_random(0, image_size=64)


def test_export_key_scheme(system):
    sd = system.export_torch_checkpoint()
    prefixes = {k.split(".")[0] for k in sd}
    assert prefixes == {"diffuser", "vae", "ctx"}
    assert any(k.startswith("diffuser.image.data_blocks.0.0.") for k in sd)
    assert any(k.startswith("diffuser.text.context_blocks.") for k in sd)
    assert any(k.startswith("vae.image.encoder.down.0.block.0.") for k in sd)
    assert any(k.startswith("vae.text.encoder.encoder.layer.0.") for k in sd)
    assert any(k.startswith("vae.text.decoder.transformer.h.0.") for k in sd)
    assert any(k.startswith("ctx.image.model.vision_model.") for k in sd)
    assert any(k.startswith("ctx.text.model.text_model.") for k in sd)
    # 0-D FC blocks export as [O, I, 1, 1] 1x1 convs like the reference
    fc = next(k for k in sd if "diffuser.text." in k and
              k.endswith("in_layers.2.weight") and "data_blocks" in k)
    assert sd[fc].ndim == 4 and sd[fc].shape[2:] == (1, 1)
    # context-transformer projections likewise
    pj = next(k for k in sd if k.endswith("proj_in.weight"))
    assert sd[pj].ndim == 4


def test_load_export_roundtrip_identity(system):
    sd = system.export_torch_checkpoint()
    before = jax.tree_util.tree_map(np.asarray, system.params)
    missing = system.load_torch_checkpoint(sd, strict=True)
    assert missing == []
    after = system.params
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_vdtpu_checkpoint_prefers_ema(tmp_path, system):
    """A Trainer-produced orbax checkpoint serves through VDSystem:
    use_ema=True loads the EMA shadow (the reference samples under
    ema_scope, vd.py:188-198), use_ema=False the raw params."""
    from vdtpu.models.vd import VDModel
    from vdtpu.training.checkpoints import save_checkpoint
    from vdtpu.training.harness import Trainer
    from vdtpu.training.optim import get_optimizer
    from vdtpu.training.schedulers import ConstantScheduler

    model = VDModel.from_config(system.cfg)
    params = model.init_params(jax.random.PRNGKey(3))
    tx, set_lr = get_optimizer("adamw", params=params)
    t = Trainer(model, params, tx, set_lr,
                scheduler=ConstantScheduler(lr=1e-2), ema_decay=0.5,
                log_every=10**9, ckpt_dir=str(tmp_path))

    def batches():
        rs = np.random.RandomState(7)
        while True:
            yield {"x": rs.randn(2, 8, 8, 4).astype(np.float32),
                   "ctx": rs.randn(2, 7, system.model.diffuser
                                   .diffuser_cfgs[0][1]["args"]["context_dim"]
                                   ).astype(np.float32)}

    state = t.run(batches(), num_iters=2)
    save_checkpoint(str(tmp_path), "last", state)

    leaf = lambda p: np.asarray(
        p["image"]["data_blocks.0.0"]["kernel"], dtype=np.float64)

    tag = system.load_vdtpu_checkpoint(str(tmp_path))
    assert tag == "last"
    np.testing.assert_allclose(leaf(system.params["diffuser"]),
                               leaf(state.ema.shadow), rtol=1e-6)

    system.load_vdtpu_checkpoint(str(tmp_path), use_ema=False)
    np.testing.assert_allclose(leaf(system.params["diffuser"]),
                               leaf(state.params), rtol=1e-6)
    # ema decay 0.5 after 2 steps: shadow and params genuinely differ
    assert np.abs(leaf(state.params) - leaf(state.ema.shadow)).max() > 0
