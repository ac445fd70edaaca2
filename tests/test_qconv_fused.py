"""Parity tests for the fully-fused int8 conv kernels (ops/pallas/qconv.py).

Interpret mode on CPU: the kernels' math must match the jnp references
(which mirror vdtpu.ops.quant.QConv's int8 path: f32 GN stats, f32
apply+SiLU, static activation scale, per-channel weight scales, exact i32
tap accumulation). The flat layout's column-mask wrap handling is the main
thing under test: compare against a REAL zero-padded lax conv.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdtpu.ops.pallas.qconv import (qconv3_flat, ref_qconv3_flat,
                                    ref_resblock_flat, resblock_flat)


def _mk(h, w, c, n, groups, key=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(key), 10)
    x = jax.random.normal(ks[0], (2, h, w, c), dtype)
    gs = jax.random.normal(ks[1], (c,), dtype) * 0.2 + 1.0
    gb = jax.random.normal(ks[2], (c,), dtype) * 0.1
    wq = jax.random.randint(ks[3], (3, 3, c, n), -127, 128, jnp.int32).astype(jnp.int8)
    s_w = (jax.random.uniform(ks[4], (n,)) * 0.01 + 0.001).astype(jnp.float32)
    bias = jax.random.normal(ks[5], (n,), dtype) * 0.1
    s_act = jnp.float32(0.05)
    add_vec = jax.random.normal(ks[6], (2, n), dtype)
    add_full = jax.random.normal(ks[7], (2, h * w, n), dtype)
    return x, gs, gb, wq, s_w, bias, s_act, add_vec, add_full


@pytest.mark.parametrize("h,w,c,n,groups", [(8, 8, 64, 128, 8),
                                            (16, 8, 32, 128, 4)])
@pytest.mark.parametrize("variant", ["film", "film+skip", "nosilu"])
def test_qconv_fused_parity(h, w, c, n, groups, variant):
    x, gs, gb, wq, s_w, bias, s_act, av, af = _mk(h, w, c, n, groups)
    with_silu = variant != "nosilu"
    add_full = af if variant == "film+skip" else None
    xf = x.reshape(2, h * w, c)
    out = qconv3_flat(xf, gs, gb, s_act, wq, s_w, bias, h, w, groups=groups,
                      with_silu=with_silu, add_vec=av, add_full=add_full,
                      interpret=True)
    ref = ref_qconv3_flat(xf, gs, gb, s_act, wq, s_w, bias, h, w,
                          groups=groups, with_silu=with_silu, add_vec=av,
                          add_full=add_full)
    assert out.shape == ref.shape == (2, h * w, n)
    # identical int8 codes feed exact i32 accumulation: only f32 epilogue
    # rounding differs (the reference runs a REAL zero-padded lax conv, so
    # agreement proves the shifted-slice + column-mask tap arithmetic)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("skip", [False, True])
def test_resblock_fused_parity(skip):
    h, w, c, groups = 8, 8, 64, 8
    n = 128 if skip else c
    x, gs, gb, wq, s_w, bias, s_act, av, _ = _mk(h, w, c, n, groups)
    ks = jax.random.split(jax.random.PRNGKey(42), 6)
    gs2 = jax.random.normal(ks[0], (n,)) * 0.1 + 1.0
    gb2 = jax.random.normal(ks[1], (n,)) * 0.1
    w2q = jax.random.randint(ks[2], (3, 3, n, n), -127, 128,
                             jnp.int32).astype(jnp.int8)
    s2w = (jax.random.uniform(ks[3], (n,)) * 0.005 + 0.001).astype(jnp.float32)
    b2 = jax.random.normal(ks[4], (n,)) * 0.05
    sx2 = jnp.float32(0.04)
    skip_f = jax.random.normal(ks[5], (2, h * w, n)) if skip else None
    xf = x.reshape(2, h * w, c)
    out = resblock_flat(xf, (gs, gb), wq, s_w, bias, s_act, av,
                        (gs2, gb2), w2q, s2w, b2, sx2, h, w, skip=skip_f,
                        groups=groups, interpret=True)
    ref = ref_resblock_flat(xf, (gs, gb), wq, s_w, bias, s_act, av,
                            (gs2, gb2), w2q, s2w, b2, sx2, h, w,
                            skip=skip_f, groups=groups)
    assert out.shape == ref.shape == (2, h * w, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_composes_across_two_convs():
    """conv2(conv1(x)) on the flat layout equals the reference chained —
    the invariant that lets ResBlocks chain without layout passes."""
    h, w, c, n, groups = (8, 8, 64, 64, 8)
    x, gs, gb, wq, s_w, bias, s_act, av, _ = _mk(h, w, c, n, groups)
    gs2 = jnp.ones((n,), jnp.float32)
    gb2 = jnp.zeros((n,), jnp.float32)
    wq2 = jax.random.randint(jax.random.PRNGKey(9), (3, 3, n, n),
                             -127, 128, jnp.int32).astype(jnp.int8)
    s_w2 = jnp.full((n,), 0.002, jnp.float32)
    b2 = jnp.zeros((n,), jnp.float32)
    xf = x.reshape(2, h * w, c)
    h1 = qconv3_flat(xf, gs, gb, s_act, wq, s_w, bias, h, w, groups=groups,
                     add_vec=av, interpret=True)
    h2 = qconv3_flat(h1, gs2, gb2, s_act, wq2, s_w2, b2, h, w,
                     groups=groups, interpret=True)
    r1 = ref_qconv3_flat(xf, gs, gb, s_act, wq, s_w, bias, h, w,
                         groups=groups, add_vec=av)
    r2 = ref_qconv3_flat(r1, gs2, gb2, s_act, wq2, s_w2, b2, h, w,
                         groups=groups)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(r2),
                               rtol=3e-5, atol=3e-5)
