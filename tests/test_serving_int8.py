"""Calibrated-int8 serving through the production API (VDSystem.enable_int8).

The bench.py headline path (calibrated int8 diffuser, PERF.md) was
previously only reachable by hand-assembling calibration probes; this
locks the API route: one call calibrates every serving flow's call sites,
re-packs params["diffuser"] as {"params", "quant"}, and every subsequent
VDInference flow — including the approximate modes — runs the s8 path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vdtpu.ops import quant


@pytest.fixture(scope="module")
def pair():
    """(bf16-path VDInference, its baseline t2i) then the SAME system
    switched to int8 — order matters: the baseline must trace before the
    process-wide policy flips. The diffuser's zero-init output convs are
    random-filled first (a fresh-init UNet outputs identically zero, which
    would make the int8-vs-bf16 comparison vacuous — see test_encreuse)."""
    from _tiny import make_tiny_vdi
    vdi = make_tiny_vdi()
    p = vdi.sys.params["diffuser"]
    leaves, treedef = jax.tree_util.tree_flatten(p)
    key = jax.random.PRNGKey(7)
    vdi.sys.params["diffuser"] = treedef.unflatten([
        jax.random.normal(jax.random.fold_in(key, i), l.shape, l.dtype) * 0.02
        if float(jnp.abs(l).max()) == 0.0 else l
        for i, l in enumerate(leaves)])
    base = np.asarray(vdi.inference_t2i("a red cat", seed=3), np.float32)
    yield vdi, base
    quant.set_policy(None)


def test_enable_int8_serving_flow(pair):
    vdi, base = pair
    sys_ = vdi.sys
    sys_.enable_int8(image_size=64, latent_downsample=2)
    try:
        packed = sys_.params["diffuser"]
        assert set(packed) == {"params", "quant"}
        assert jax.tree_util.tree_leaves(packed["quant"])
        # every serving flow's diffuser sites carry scales: both the 2-D
        # and the 0-D trunk must have been calibrated
        assert quant.get_policy() == "int8"
        # int8 jits are distinct cache entries (the policy is part of the
        # sampler cache key via get_policy())
        out = np.asarray(vdi.inference_t2i("a red cat", seed=3), np.float32)
        assert np.isfinite(out).all()
        # quantization changes the result but stays on-trajectory
        assert np.abs(out - base).max() > 1e-6
        cos = (out * base).sum() / (
            np.linalg.norm(out) * np.linalg.norm(base) + 1e-9)
        assert cos > 0.95, cos
        # idempotent: a second call is a no-op (no double-packing)
        sys_.enable_int8(image_size=64, latent_downsample=2)
        assert set(sys_.params["diffuser"]) == {"params", "quant"}
        assert sys_.params["diffuser"]["params"] is packed["params"]
        # the 0-D flow (i2t) runs under int8 too
        im = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
        txts = vdi.inference_i2t(im, seed=5)
        assert isinstance(txts, list) and len(txts) == 2
        # composes with the opt-in modes
        vdi.encoder_reuse = 2
        out2 = np.asarray(vdi.inference_t2i("a red cat", seed=3), np.float32)
        assert np.isfinite(out2).all()
    finally:
        vdi.encoder_reuse = None
        quant.set_policy(None)


def test_enable_int8_requires_params():
    from vdtpu.serving.api import VDSystem
    sys_ = VDSystem("vd_test_tiny")
    try:
        with pytest.raises(RuntimeError, match="init params"):
            sys_.enable_int8(image_size=64, latent_downsample=2)
    finally:
        quant.set_policy(None)
