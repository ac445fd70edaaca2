"""Flash-attention kernel vs the XLA reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vdtpu.ops.attention import _xla_attention
from vdtpu.ops.pallas.flash import flash_attention


@pytest.mark.parametrize("n,m,d,h", [
    (256, 256, 40, 2),     # unaligned head dim (320ch / 8 heads)
    (128, 77, 64, 1),      # cross-attention-like ragged kv
    (160, 256, 80, 2),     # ragged q
])
def test_flash_matches_xla(n, m, d, h):
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(2, n, h, d).astype(np.float32))
    k = jnp.asarray(rs.randn(2, m, h, d).astype(np.float32))
    v = jnp.asarray(rs.randn(2, m, h, d).astype(np.float32))
    ref = _xla_attention(q, k, v, None, d ** -0.5)
    out = flash_attention(q, k, v, block_q=64, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_gradient_small_blocks():
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(1, 64, 2, 32).astype(np.float32))
    k = jnp.asarray(rs.randn(1, 64, 2, 32).astype(np.float32))
    v = jnp.asarray(rs.randn(1, 64, 2, 32).astype(np.float32))

    f_flash = lambda q, k, v: flash_attention(
        q, k, v, block_q=32, block_k=64, interpret=True).sum()
    f_ref = lambda q, k, v: _xla_attention(q, k, v, None, 32 ** -0.5).sum()
    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_flash_gradient_bf16_inputs():
    """Bounds the bf16 fwd/bwd asymmetry (ADVICE r2): the forward folds the
    softmax scale into q in the input dtype while the backward kernels
    recompute probabilities from f32 (q.k)*scale; on bf16 inputs the
    forward-saved lse and backward-recomputed p diverge slightly. Parity vs
    the XLA vjp on the same bf16 inputs within bf16-scale tolerance."""
    rs = np.random.RandomState(5)
    mk = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32)).astype(jnp.bfloat16)
    q, k, v = mk(1, 128, 2, 40), mk(1, 128, 2, 40), mk(1, 128, 2, 40)
    g = jnp.asarray(rs.randn(1, 128, 2, 40).astype(np.float32))

    f_flash = lambda q, k, v: (flash_attention(
        q, k, v, block_q=64, block_k=64, interpret=True
    ).astype(jnp.float32) * g).sum()
    f_ref = lambda q, k, v: (_xla_attention(
        q, k, v, None, 40 ** -0.5).astype(jnp.float32) * g).sum()
    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=0.03, rtol=0.05)


@pytest.mark.parametrize("n,m,d,h", [(256, 256, 40, 2), (128, 77, 64, 1)])
def test_flash_backward_kernels_match_xla(n, m, d, h):
    """The Pallas backward kernels (dq, dk/dv) vs the XLA attention vjp."""
    rs = np.random.RandomState(3)
    q = jnp.asarray(rs.randn(2, n, h, d).astype(np.float32))
    k = jnp.asarray(rs.randn(2, m, h, d).astype(np.float32))
    v = jnp.asarray(rs.randn(2, m, h, d).astype(np.float32))
    g = jnp.asarray(rs.randn(2, n, h, d).astype(np.float32))

    f_flash = lambda q, k, v: (flash_attention(
        q, k, v, block_q=64, block_k=128, interpret=True) * g).sum()
    f_ref = lambda q, k, v: (_xla_attention(q, k, v, None, d ** -0.5) * g).sum()
    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("n,m,d,h", [(256, 256, 40, 2), (256, 77, 40, 2),
                                     (128, 130, 64, 1)])
def test_nomax_kernel_matches_xla(n, m, d, h):
    """The calibrated no-max serving kernel == softmax attention whenever the
    shift upper-bounds the logits (incl. ragged kv padding)."""
    from vdtpu.ops.pallas.flash import flash_attention_nomax
    rs = np.random.RandomState(7)
    q = jnp.asarray(rs.randn(2, n, h, d).astype(np.float32))
    k = jnp.asarray(rs.randn(2, m, h, d).astype(np.float32))
    v = jnp.asarray(rs.randn(2, m, h, d).astype(np.float32))
    ref = _xla_attention(q, k, v, None, d ** -0.5)
    # per-head shifts: the true per-head max logits (what calibration records)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d ** -0.5)
    shift = jnp.max(s, axis=(0, 2, 3))
    out = flash_attention_nomax(q, k, v, shift, block_q=64, block_k=128,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    # a loose bound (shift above the true max) must not change the output
    out2 = flash_attention_nomax(q, k, v, shift + 25.0, block_q=64,
                                 block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("n,m,d,h", [(256, 256, 40, 8), (128, 250, 80, 4)])
def test_nomax_packed_matches_xla(n, m, d, h):
    """Opt-in head-packed no-max kernel (native [B,N,H*D] operands, heads
    statically unrolled in-kernel) == softmax attention, incl. ragged kv."""
    from vdtpu.ops.pallas import flash
    rs = np.random.RandomState(11)
    q = jnp.asarray(rs.randn(2, n, h, d).astype(np.float32)) * 0.3
    k = jnp.asarray(rs.randn(2, m, h, d).astype(np.float32)) * 0.3
    v = jnp.asarray(rs.randn(2, m, h, d).astype(np.float32))
    ref = _xla_attention(q, k, v, None, d ** -0.5)
    import os
    os.environ["VDTPU_NOMAX_PACKED"] = "1"
    try:
        out = flash.flash_attention_nomax(q, k, v, 6.0, interpret=True)
    finally:
        del os.environ["VDTPU_NOMAX_PACKED"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)
