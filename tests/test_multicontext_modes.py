"""Approximate serving modes on the multicontext (blend) sampler path.

The opt-in levers — encoder reuse (Faster Diffusion, arXiv 2312.09608),
limited-interval CFG (arXiv 2404.07724) and the DPM-Solver++(2M) few-step
solver — compose with `sample_multicontext` exactly as with `sample`
(vdtpu/sampling/ddim.py), covering the dcg/tcg/mcg blend flows
(ref app.py:379-579). Gates mirror the single-context ones:
  - the multicontext encoder/decoder walk split composes to the full walk,
  - interval=1 / cfg_interval=(0,1) reproduce the exact path,
  - real intervals/bands diverge but stay on-trajectory.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vdtpu.config.bank import model_cfg_bank
from vdtpu.models.vd import VDModel
from vdtpu.sampling.ddim import DDIMSampler


@pytest.fixture(scope="module")
def tiny():
    model = VDModel.from_config(model_cfg_bank()("vd_test_tiny"),
                                dtype=jnp.float32, use_checkpoint=False)
    params = model.init_params(jax.random.PRNGKey(0))
    # random-fill the zero-init output convs (a fresh-init UNet outputs
    # identically zero — comparisons would be vacuous, see test_encreuse.py)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    key = jax.random.PRNGKey(7)
    leaves = [
        jax.random.normal(jax.random.fold_in(key, i), l.shape, l.dtype) * 0.02
        if float(jnp.abs(l).max()) == 0.0 else l
        for i, l in enumerate(leaves)]
    return model, treedef.unflatten(leaves)


def _ctxs():
    rs = np.random.RandomState(0)
    ca = jnp.asarray(rs.randn(2, 5, 96).astype(np.float32)) * 0.3
    cb = jnp.asarray(rs.randn(2, 7, 96).astype(np.float32)) * 0.3
    return ca, cb


def _c_infos(scale=4.0):
    ca, cb = _ctxs()
    return [
        {"type": "text", "conditioning": ca,
         "unconditional_conditioning": jnp.zeros_like(ca),
         "unconditional_guidance_scale": scale, "ratio": 0.6},
        {"type": "image", "conditioning": cb,
         "unconditional_conditioning": jnp.zeros_like(cb),
         "unconditional_guidance_scale": scale, "ratio": 0.4},
    ]


def _sample_mc(model, params, **kw):
    sampler = DDIMSampler(model)
    return np.asarray(sampler.sample_multicontext(
        params, jax.random.PRNGKey(7), 8, (2, 8, 8, 4),
        {"type": "image"}, _c_infos(), **kw))


def test_mc_walk_split_composes(tiny):
    """encoder + decoder halves == the full multicontext walk; the compute
    branch regenerates the same cache it was handed."""
    model, params = tiny
    ca, cb = _ctxs()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([3, 500], jnp.int32)
    args = ([ca, cb], [0.6, 0.4], "image", ["text", "image"])
    full = model.apply_model_multicontext(params, x, t, *args)
    cache = model.apply_model_multicontext_encoder(params, x, t, *args)
    out, cache_out = model.apply_model_multicontext_encreuse(
        params, x, t, args[0], args[1], args[2], args[3],
        cache, jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                               rtol=1e-5, atol=1e-5)
    out2, cache2 = model.apply_model_multicontext_encreuse(
        params, x, t, args[0], args[1], args[2], args[3],
        jax.tree_util.tree_map(jnp.zeros_like, cache), jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(full),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(cache2),
                    jax.tree_util.tree_leaves(cache)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_mc_encreuse_interval_one_equals_exact(tiny):
    model, params = tiny
    exact = _sample_mc(model, params)
    every = _sample_mc(model, params,
                       encoder_reuse={"interval": 1, "warmup": 0})
    np.testing.assert_allclose(every, exact, rtol=2e-5, atol=2e-5)


def test_mc_encreuse_interval_two_stays_close(tiny):
    model, params = tiny
    exact = _sample_mc(model, params)
    approx = _sample_mc(model, params,
                        encoder_reuse={"interval": 2, "warmup": 2})
    assert np.isfinite(approx).all()
    assert np.abs(approx - exact).max() > 1e-6
    cos = (approx * exact).sum() / (
        np.linalg.norm(approx) * np.linalg.norm(exact) + 1e-9)
    assert cos > 0.9, cos


def test_mc_cfg_interval(tiny):
    model, params = tiny
    exact = _sample_mc(model, params)
    full_band = _sample_mc(model, params, cfg_interval=(0.0, 1.0))
    np.testing.assert_array_equal(full_band, exact)
    banded = _sample_mc(model, params, cfg_interval=(0.25, 0.75))
    assert np.isfinite(banded).all()
    assert np.abs(banded - exact).max() > 1e-6


def test_mc_dpmpp_compositions(tiny):
    model, params = tiny
    exact = _sample_mc(model, params, method="dpmpp2m")
    assert np.isfinite(exact).all()
    full_band = _sample_mc(model, params, method="dpmpp2m",
                           cfg_interval=(0.0, 1.0))
    np.testing.assert_array_equal(full_band, exact)
    every = _sample_mc(model, params, method="dpmpp2m",
                       encoder_reuse={"interval": 1, "warmup": 0})
    np.testing.assert_allclose(every, exact, rtol=2e-5, atol=2e-5)
    approx = _sample_mc(model, params, method="dpmpp2m",
                        encoder_reuse={"interval": 2, "warmup": 2})
    assert np.isfinite(approx).all()
    assert np.abs(approx - exact).max() > 1e-6


def test_mc_validation(tiny):
    model, params = tiny
    with pytest.raises(ValueError, match="composes with"):
        _sample_mc(model, params, cfg_interval=(0.2, 0.8), encoder_reuse=2)
    with pytest.raises(ValueError, match="lo <= hi"):
        _sample_mc(model, params, cfg_interval=(0.8, 0.2))


def test_vdinference_dcg_with_modes():
    """API-level smoke: the blend flow (dcg) runs under each opt-in mode."""
    from _tiny import make_tiny_vdi
    vdi = make_tiny_vdi()
    im = np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32)
    for setup in ({"encoder_reuse": 2}, {"cfg_interval": (0.1, 0.8)},
                  {"sampler": "dpmpp2m", "encoder_reuse": 2}):
        vdi.encoder_reuse = setup.get("encoder_reuse")
        vdi.cfg_interval = setup.get("cfg_interval")
        vdi.sampler = setup.get("sampler", "ddim")
        out = np.asarray(vdi.inference_dcg(
            im, fcs_lvl=0.5, text="blend text", textstrength=0.4, seed=7))
        assert out.shape == (2, 64, 64, 3) and np.isfinite(out).all(), setup
