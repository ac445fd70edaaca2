"""Per-site int8 policy (vdtpu.ops.quant.set_site_filter).

The serving-level behavior (a filtered t2i stays on-trajectory; dropping
EVERY class reproduces the bf16 path exactly) is exercised on the tiny
system in the verify drive and by the ladder harness
(scripts/int8_sites.py, PERF.md round-4 table). These tests pin the spec
semantics and the QConv/QDense fallback numerics in isolation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdtpu.ops import quant


def test_spec_matching():
    fn = quant._compile_site_spec("in_layers.2@320, attn1/qkv, -ff/net.0@640")
    # channel-qualified: only cin 320 drops
    assert not fn("image/data_blocks.3.0/in_layers.2", 320)
    assert fn("image/data_blocks.3.0/in_layers.2", 640)
    # unqualified pattern: any channel drops
    assert not fn("image/context_blocks.0.0/transformer_blocks.0/attn1/qkv", 320)
    assert not fn("image/context_blocks.9.0/transformer_blocks.0/attn1/qkv", 1280)
    # leading '-' is cosmetic; '@640' restricts
    assert not fn("image/context_blocks.0.0/transformer_blocks.0/ff/net.0/proj", 640)
    assert fn("image/context_blocks.0.0/transformer_blocks.0/ff/net.0/proj", 320)
    # non-matching paths stay int8
    assert fn("image/data_blocks.3.0/out_layers.3", 320)


def test_set_site_filter_forms():
    quant.set_site_filter("qkv@320")
    assert quant.site_filter_key() == "qkv@320"
    quant.set_site_filter(None)
    assert quant.site_filter_key() == ""
    cb = lambda path, cin: False
    quant.set_site_filter(cb)
    assert quant.site_filter_key() == repr(cb)
    quant.set_site_filter("")
    assert quant.site_filter_key() == ""


def test_qdense_fallback_matches_plain_dense():
    """A dropped QDense site must compute exactly x @ W + b in the compute
    dtype — same params, same epilogue contract (add fused)."""
    quant.set_policy("int8")
    try:
        m = quant.QDense(8, dtype=jnp.float32, name="to_q")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 4), jnp.float32)
        add = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8), jnp.float32)
        params = m.init(jax.random.PRNGKey(2), x)["params"]

        quant.set_site_filter(lambda p, c: False)   # drop everything
        y_drop = m.apply({"params": params}, x, add=add)
        quant.set_site_filter(None)
        y_int8 = m.apply({"params": params}, x, add=add)

        ref = x @ params["kernel"] + params["bias"] + add
        np.testing.assert_allclose(np.asarray(y_drop), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
        # and the int8 path is genuinely different arithmetic
        assert np.abs(np.asarray(y_int8) - np.asarray(ref)).max() > 1e-6
    finally:
        quant.set_site_filter(None)
        quant.set_policy(None)


def test_calibration_ignores_filter():
    """int8_calib must sow scales for every site even under a drop-all
    filter (one calibration serves any serving subset)."""
    quant.set_policy("int8_calib")
    try:
        quant.set_site_filter(lambda p, c: False)
        m = quant.QDense(8, dtype=jnp.float32, name="d")
        x = jnp.ones((2, 4), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        _, col = m.apply({"params": params}, x, mutable=["quant_calib"])
        assert "act_absmax" in col["quant_calib"]
    finally:
        quant.set_site_filter(None)
        quant.set_policy(None)


def test_filter_in_sampler_cache_key():
    """Flipping the filter must re-trace, not reuse the stale executable:
    site_filter_key() is part of the sampler jit cache identity."""
    from vdtpu.sampling.ddim import DDIMSampler
    s = DDIMSampler.__new__(DDIMSampler)
    built = []

    def build():
        built.append(1)
        return lambda x: x + 1

    quant.set_site_filter(None)
    f1 = s._jitted(("sig",), build)
    quant.set_site_filter("qkv@320")
    f2 = s._jitted(("sig",), build)
    quant.set_site_filter(None)
    f3 = s._jitted(("sig",), build)
    assert len(built) == 2      # distinct entries per filter
    assert f1 is f3 and f1 is not f2
