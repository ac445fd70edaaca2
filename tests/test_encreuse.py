"""Encoder-reuse approximate serving mode (Faster Diffusion, 2312.09608).

Gate for the opt-in `encoder_reuse` sampler flag (VERDICT r2 task 6):
  - the encoder/decoder walk split composes to the exact full walk,
  - interval=1 (every step a key step) reproduces the exact DDIM sample,
  - interval=2 actually skips encoder work yet stays on-trajectory.
The exact path stays the default; full-size speed/quality numbers live in
PERF.md (chip measurements).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vdtpu.config.bank import model_cfg_bank
from vdtpu.models.vd import VDModel
from vdtpu.sampling.ddim import DDIMSampler, encoder_reuse_schedule


@pytest.fixture(scope="module")
def tiny():
    cfg = model_cfg_bank()("vd_test_tiny")
    model = VDModel.from_config(cfg, dtype=jnp.float32, use_checkpoint=False)
    params = model.init_params(jax.random.PRNGKey(0))
    # fill the zero-init output convs: a fresh-init UNet outputs identically
    # zero (zero-init _Out2D), which would make every comparison here vacuous
    leaves, treedef = jax.tree_util.tree_flatten(params)
    key = jax.random.PRNGKey(7)
    leaves = [
        jax.random.normal(jax.random.fold_in(key, i), l.shape, l.dtype) * 0.02
        if float(jnp.abs(l).max()) == 0.0 else l
        for i, l in enumerate(leaves)]
    return model, treedef.unflatten(leaves)


def test_walk_split_composes(tiny):
    model, params = tiny
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([3, 500], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 96))
    full = model.apply_model(params, x, t, ctx, "image", "text")
    h, hs = model.apply_model_encoder(params, x, t, ctx, "image", "text")
    out, cache = model.apply_model_encreuse(
        params, x, t, ctx, "image", "text", (h, hs), jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                               rtol=1e-6, atol=1e-6)
    # compute branch produces the same cache
    out2, cache2 = model.apply_model_encreuse(
        params, x, t, ctx, "image", "text",
        jax.tree_util.tree_map(jnp.zeros_like, (h, hs)), jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(full),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(cache2),
                    jax.tree_util.tree_leaves((h, hs))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_schedule_shape():
    m = encoder_reuse_schedule(50, interval=2, warmup=5)
    assert m[:5].all() and m.dtype == bool and m.shape == (50,)
    assert m[5::2].all() and not m[6::2].any()
    assert encoder_reuse_schedule(10, interval=1, warmup=0).all()


def _sample(model, params, key, enc):
    sampler = DDIMSampler(model)
    cond = jax.random.normal(jax.random.PRNGKey(9), (2, 5, 96)) * 0.3
    uncond = jnp.zeros_like(cond)
    return sampler.sample(
        params, key, steps=6, shape=(2, 8, 8, 4), x_info={"type": "image"},
        c_info={"type": "text", "conditioning": cond,
                "unconditional_conditioning": uncond,
                "unconditional_guidance_scale": 4.0},
        encoder_reuse=enc)


def test_interval_one_equals_exact(tiny):
    model, params = tiny
    key = jax.random.PRNGKey(7)
    exact = _sample(model, params, key, None)
    every = _sample(model, params, key, {"interval": 1, "warmup": 0})
    np.testing.assert_allclose(np.asarray(every), np.asarray(exact),
                               rtol=2e-5, atol=2e-5)


def test_vdinference_encoder_reuse_flag():
    """API-level smoke: the opt-in flag threads through VDInference._sample
    and the whole t2i flow stays finite."""
    import numpy as np
    from _tiny import make_tiny_vdi
    vdi = make_tiny_vdi()
    vdi.encoder_reuse = 2
    img = np.asarray(vdi.inference_t2i("a village in the snow", 23))
    assert img.shape[1:] == (64, 64, 3) and np.isfinite(img).all()


def test_interval_two_runs_and_stays_close(tiny):
    model, params = tiny
    key = jax.random.PRNGKey(7)
    exact = np.asarray(_sample(model, params, key, None))
    approx = np.asarray(_sample(model, params, key, {"interval": 2, "warmup": 2}))
    assert np.isfinite(approx).all()
    # must differ (encoder steps were actually skipped) ...
    assert np.abs(approx - exact).max() > 1e-6
    # ... but stay on-trajectory (latents correlate strongly)
    cos = (approx * exact).sum() / (
        np.linalg.norm(approx) * np.linalg.norm(exact) + 1e-9)
    assert cos > 0.9, cos
