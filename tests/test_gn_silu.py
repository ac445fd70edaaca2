"""Fused GroupNorm+SiLU kernel: parity vs nn.GroupNorm, vjp correctness."""
import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from vdtpu.ops.pallas.gn_silu import _ref_gn_silu, gn_silu


def _oracle(x, scale, bias, groups, eps, with_silu):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps)
    y = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    return y * jax.nn.sigmoid(y) if with_silu else y


@pytest.mark.parametrize("shape,groups", [((2, 16, 8, 64), 32),
                                          ((2, 64, 128), 32),
                                          ((3, 8, 256), 8)])
@pytest.mark.parametrize("with_silu", [True, False])
def test_kernel_matches_groupnorm(shape, groups, with_silu):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape).astype(np.float32)) * 2 + 0.3
    c = shape[-1]
    scale = jnp.asarray(rs.rand(c).astype(np.float32) + 0.5)
    bias = jnp.asarray(rs.randn(c).astype(np.float32) * 0.1)
    # interpret=True runs the actual Pallas kernel on CPU
    out = gn_silu(x, scale, bias, groups, 1e-5, with_silu, interpret=True)
    ref = _oracle(x.reshape(shape[0], -1, c), scale, bias, groups, 1e-5,
                  with_silu).reshape(shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_jnp_fallback_matches_groupnorm():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 7, 64).astype(np.float32))
    scale = jnp.ones(64)
    bias = jnp.zeros(64)
    out = _ref_gn_silu(x, scale, bias, 32, 1e-5, True)
    ref = _oracle(x, scale, bias, 32, 1e-5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_vjp_matches_reference():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 16, 64).astype(np.float32))
    scale = jnp.asarray(rs.rand(64).astype(np.float32) + 0.5)
    bias = jnp.asarray(rs.randn(64).astype(np.float32) * 0.1)

    f_kernel = lambda x, s, b: gn_silu(x, s, b, 32, 1e-5, True,
                                       interpret=True).sum()
    f_ref = lambda x, s, b: _oracle(x, s, b, 32, 1e-5, True).sum()
    gk = jax.grad(f_kernel, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_resblock_param_names_unchanged():
    """FusedGNSiLU must keep the nn.GroupNorm param names so the torch
    converter and existing checkpoints keep working."""
    from vdtpu.models.blocks import ResBlock2D
    m = ResBlock2D(64, 64)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 64)),
               jnp.zeros((1, 16)))["params"]
    assert set(p["in_layers.0"]) == {"scale", "bias"}
    assert set(p["out_layers.0"]) == {"scale", "bias"}


def test_blocked_quantized_path_matches_reference():
    """The blocked stats+apply kernels (large-slab serving path) must match
    the jnp reference GN+SiLU followed by static-scale quantization."""
    from vdtpu.ops.pallas.gn_silu import _gn_silu_q_blocked, _ref_gn_silu
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 1024, 64).astype(np.float32))
    scale = jnp.asarray(rs.randn(64).astype(np.float32))
    bias = jnp.asarray(rs.randn(64).astype(np.float32))
    s_act = jnp.asarray(0.037)
    out = _gn_silu_q_blocked(x, scale, bias, s_act, 32, 1e-5, True,
                             interpret=True)
    ref = _ref_gn_silu(x, scale, bias, 32, 1e-5, True)
    refq = np.clip(np.round(np.asarray(ref) / 0.037), -127, 127).astype(np.int8)
    # round-to-nearest ties may differ by 1 ulp at most
    diff = np.abs(np.asarray(out).astype(np.int32) - refq.astype(np.int32))
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-3


def test_quantized_odd_n_slab_falls_back_exact():
    """A slab too big for VMEM whose N is not a multiple of the block size
    must take the exact jnp fallback (the blocked kernels would silently
    drop the tail rows from the statistics)."""
    from vdtpu.ops.pallas.gn_silu import _ref_gn_silu, gn_silu_q
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(1, 4480, 256).astype(np.float32))
    scale = jnp.asarray(rs.randn(256).astype(np.float32))
    bias = jnp.asarray(rs.randn(256).astype(np.float32))
    out = gn_silu_q(x, scale, bias, jnp.asarray(0.05), 32, 1e-5, True,
                    interpret=False)
    ref = _ref_gn_silu(x, scale, bias, 32, 1e-5, True)
    refq = np.clip(np.round(np.asarray(ref) / 0.05), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(out), refq)


def test_gn_stats_only_matches_reference():
    """The stats-ONLY Pallas split (r3): gn_stats must reproduce the
    channel-broadcast (mean, rstd) of the jnp GroupNorm."""
    from vdtpu.ops.pallas.gn_silu import gn_stats
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(2, 512, 256).astype(np.float32)) * 1.7 + 0.3
    stats = gn_stats(x, 32, 1e-5, interpret=True)
    assert stats.shape == (2, 2, 256)
    xg = np.asarray(x).reshape(2, 512, 32, 8)         # [B, N, G, cpg]
    mean_g = xg.transpose(0, 2, 1, 3).reshape(2, 32, -1).mean(-1)
    var_g = xg.transpose(0, 2, 1, 3).reshape(2, 32, -1).var(-1)
    rstd_g = 1.0 / np.sqrt(var_g + 1e-5)
    mean_c = np.repeat(mean_g, 8, axis=-1)
    rstd_c = np.repeat(rstd_g, 8, axis=-1)
    np.testing.assert_allclose(np.asarray(stats[:, 0]), mean_c, rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(stats[:, 1]), rstd_c, rtol=2e-4,
                               atol=2e-4)
    # non-coverable N returns None (caller falls back)
    assert gn_stats(jnp.zeros((1, 4481, 256)), 32, interpret=True) is None


def test_qconv_gn_stats_mode_matches_default(monkeypatch):
    """VDTPU_QCONV_GN=stats routes the ResBlock prologue through the
    stats-only kernel with outputs matching the default jnp path."""
    import jax
    from vdtpu.models.blocks import ResBlock2D
    from vdtpu.ops import quant

    def run():
        quant.set_policy("int8")
        try:
            blk = ResBlock2D(64, 64, dtype=jnp.float32)
            rs = np.random.RandomState(11)
            x = jnp.asarray(rs.randn(1, 16, 16, 64).astype(np.float32))
            emb = jnp.asarray(rs.randn(1, 32).astype(np.float32))
            p = blk.init(jax.random.PRNGKey(0), x, emb)
            return np.asarray(blk.apply(p, x, emb))
        finally:
            quant.set_policy(None)

    monkeypatch.delenv("VDTPU_QCONV_GN", raising=False)
    ref = run()
    monkeypatch.setenv("VDTPU_QCONV_GN", "stats")
    out = run()
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)
