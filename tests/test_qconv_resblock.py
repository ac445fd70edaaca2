"""ResBlock2D padded-flat fused path (VDTPU_QCONV=fused) vs the standard
int8 QConv path: same param tree, same quant collection, matching outputs.

Runs the Pallas kernel in interpret mode on CPU (VDTPU_QCONV_FORCE=1).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdtpu.models.blocks import ResBlock2D
from vdtpu.ops import quant


@pytest.fixture(autouse=True)
def _policy():
    quant.set_policy("int8")
    os.environ["VDTPU_QCONV_FORCE"] = "1"
    yield
    quant.set_policy(None)
    os.environ.pop("VDTPU_QCONV_FORCE", None)
    os.environ.pop("VDTPU_QCONV", None)


def _setup(cin, cout, h=32, w=32):
    blk = ResBlock2D(channels=cin, out_channels=cout, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, cin))
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    os.environ.pop("VDTPU_QCONV", None)
    params = blk.init(jax.random.PRNGKey(2), x, emb)["params"]
    return blk, params, x, emb


def _calibrate(blk, params, x, emb, fused: bool):
    old = os.environ.pop("VDTPU_QCONV", None)
    if fused:
        os.environ["VDTPU_QCONV"] = "fused"
    quant.set_policy("int8_calib")
    try:
        _, col = blk.apply({"params": params}, x, emb,
                           mutable=["quant_calib"])
    finally:
        quant.set_policy("int8")
        if old is not None:
            os.environ["VDTPU_QCONV"] = old
        elif fused:
            os.environ.pop("VDTPU_QCONV", None)
    return quant._to_scales(dict(col["quant_calib"]))


@pytest.mark.parametrize("mode", ["fused", "fused2"])
@pytest.mark.parametrize("cin,cout", [(64, 64), (64, 128)])
def test_fused_resblock_matches_standard(cin, cout, mode):
    blk, params, x, emb = _setup(cin, cout)
    scales = _calibrate(blk, params, x, emb, fused=False)
    sf = _calibrate(blk, params, x, emb, fused=True)
    # calibration itself must agree across paths (same sites, same absmax)
    for site in ("in_layers.2", "out_layers.3"):
        np.testing.assert_allclose(
            np.asarray(scales[site]["act_scale"]),
            np.asarray(sf[site]["act_scale"]), rtol=1e-5)
    quant._attach_weight_tables(scales, params)

    os.environ.pop("VDTPU_QCONV", None)
    ref = blk.apply({"params": params, "quant": scales}, x, emb)
    os.environ["VDTPU_QCONV"] = mode
    got = blk.apply({"params": params, "quant": scales}, x, emb)
    assert got.shape == ref.shape
    # identical quantize codes feed exact i32 accumulation; only the f32
    # GN-stat reduction order differs (can flip borderline codes)
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    scale_ref = np.abs(np.asarray(ref)).max()
    assert err <= 0.02 * scale_ref, (err, scale_ref)


def test_fused_resblock_identity_skip_grads_not_needed():
    """Serving-only path: ensure it traces under jit (scan-body shape)."""
    blk, params, x, emb = _setup(64, 64)
    scales = _calibrate(blk, params, x, emb, fused=False)
    os.environ["VDTPU_QCONV"] = "fused"
    f = jax.jit(lambda p, q, x, e: blk.apply({"params": p, "quant": q}, x, e))
    out = f(params, scales, x, emb)
    assert out.shape == x.shape
