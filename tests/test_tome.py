"""Token merging (vdtpu/ops/tome.py) — opt-in approximate serving mode.

ToMe-SD (arXiv 2303.17604) with static shapes: data-dependent merge
*values*, fixed merge *counts*. Verifies the merge/unmerge mechanics, the
exactness invariants (off == bit-identical baseline; identical tokens merge
losslessly), the trace-time policy plumbing (sampler jit cache keys on the
spec), and the end-to-end tiny-model path including composition with the
dpmpp2m sampler.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vdtpu.ops.tome import (
    ToMeSpec, build_merge, get_tome, merge_count, set_tome)


@pytest.fixture(autouse=True)
def _reset_tome():
    """The spec is process-wide trace-time state: never leak it."""
    yield
    set_tome(None)


def test_merge_count_alignment():
    assert merge_count(4096, 0.5) == 2048
    assert (4096 - merge_count(4096, 0.3)) % 256 == 0
    # capped at the 3/4 src partition, still 256-aligned
    r = merge_count(4096, 0.95)
    assert r <= 3072 and (4096 - r) % 256 == 0
    # short sites skip the flash alignment (XLA backend takes any length)
    assert merge_count(16, 0.25) == 4
    assert merge_count(4096, 0.0) == 0


def test_spec_validation_and_coercion():
    with pytest.raises(ValueError, match="ratio"):
        ToMeSpec(ratio=1.0)
    set_tome(0.5)  # float shorthand
    assert get_tome() == ToMeSpec(ratio=0.5)
    set_tome(ToMeSpec(ratio=0.0))  # ratio 0 coerces to off
    assert get_tome() is None
    with pytest.raises(TypeError):
        set_tome("half")


def test_duplicated_tokens_merge_losslessly():
    """Src tokens that exactly copy a dst token merge first (cosine 1) and
    round-trip bit-comparably: the merged dst mean of identical values is
    the value, and unmerge reads it back at every absorbed position."""
    rs = np.random.RandomState(0)
    n, c = 16, 8
    x = rs.randn(2, n, c).astype(np.float32)
    from vdtpu.ops.tome import _partition
    dst_idx, src_idx = _partition(n)
    # copy 4 dst rows onto 4 src rows (two of them share one dst)
    for b in range(2):
        x[b, src_idx[0]] = x[b, dst_idx[0]]
        x[b, src_idx[1]] = x[b, dst_idx[0]]
        x[b, src_idx[5]] = x[b, dst_idx[2]]
        x[b, src_idx[9]] = x[b, dst_idx[3]]
    spec = ToMeSpec(ratio=0.25, min_tokens=1)  # r = 4
    merge, unmerge, n_red = build_merge(jnp.asarray(x), spec)
    assert n_red == n - 4
    h = jnp.asarray(x)
    out = np.asarray(unmerge(merge(h)))
    np.testing.assert_allclose(out, x, rtol=1e-6, atol=1e-6)


def test_merge_shapes_and_unmerge_mapping():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(3, 64, 5).astype(np.float32))
    spec = ToMeSpec(ratio=0.5, min_tokens=1)
    merge, unmerge, n_red = build_merge(x, spec)
    r = 64 - n_red
    assert r == merge_count(64, 0.5) > 0
    h = jnp.asarray(rs.randn(3, 64, 7).astype(np.float32))  # other width
    m = merge(h)
    assert m.shape == (3, n_red, 7)
    u = np.asarray(unmerge(m))
    assert u.shape == (3, 64, 7)
    # every original token reads SOME reduced row: constant fields survive
    const = jnp.ones((3, 64, 2))
    np.testing.assert_allclose(np.asarray(unmerge(merge(const))), 1.0,
                               rtol=1e-6)
    # kept tokens pass through exactly: rows of u that equal their h row
    # must number at least the kept srcs (n_red - n_dst) — merged rows
    # generally differ
    eq = (np.abs(u - np.asarray(h)) < 1e-6).all(axis=-1)
    # kept srcs (n_red minus the 16 dst at n=64) pass through untouched
    assert eq.sum(axis=1).min() >= n_red - 16


def test_block_bit_identical_when_off_or_below_min_tokens():
    from vdtpu.models.transformer import BasicTransformerBlock
    blk = BasicTransformerBlock(dim=16, heads=2, dim_head=8)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 64, 16), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)
    base = np.asarray(blk.apply(params, x))
    set_tome(ToMeSpec(ratio=0.5, min_tokens=65))  # site too short: untouched
    np.testing.assert_array_equal(np.asarray(blk.apply(params, x)), base)
    set_tome(ToMeSpec(ratio=0.5, min_tokens=16))  # active: output changes
    merged = np.asarray(blk.apply(params, x))
    assert np.isfinite(merged).all()
    assert np.abs(merged - base).max() > 1e-6
    set_tome(None)
    np.testing.assert_array_equal(np.asarray(blk.apply(params, x)), base)


def test_block_params_identical_under_tome():
    """The merged path must consume the exact same parameter tree (serving
    flips the mode on checkpoints traced without it)."""
    from vdtpu.models.transformer import BasicTransformerBlock
    blk = BasicTransformerBlock(dim=16, heads=2, dim_head=8)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 64, 16), jnp.float32)
    p_off = jax.tree_util.tree_map(np.shape, blk.init(jax.random.PRNGKey(0), x))
    set_tome(ToMeSpec(ratio=0.5, min_tokens=16))
    p_on = jax.tree_util.tree_map(np.shape, blk.init(jax.random.PRNGKey(0), x))
    assert p_off == p_on


def test_sampler_cache_keys_on_tome():
    """Flipping the policy after warming a flow must re-trace (stale-trace
    bug class fixed for enable_int8, PERF.md r3)."""
    from vdtpu.ops.schedules import DiffusionSchedule
    from vdtpu.sampling.ddim import DDIMSampler

    class _Toy:
        schedule = DiffusionSchedule.create(1000, "linear", 0.00085, 0.012)

        def apply_model(self, params, x, t, c, x_type, c_type):
            return 0.1 * x

    s = DDIMSampler(_Toy())
    ci = {"type": "text",
          "conditioning": np.zeros((1, 3, 8), np.float32)}
    run = lambda: s.sample(None, jax.random.PRNGKey(0), 4, (1, 4, 4, 3),
                           {"type": "image"}, ci)
    run()
    assert len(s._jit_cache) == 1
    set_tome(0.5)
    run()
    assert len(s._jit_cache) == 2  # new executable, not silent reuse


def test_tiny_e2e_tome_and_dpmpp_composition():
    from _tiny import make_tiny_vdi
    vdi = make_tiny_vdi()
    # fresh-init UNets zero-gate every transformer (zero-init proj_out), so
    # merging inside the blocks would be invisible: perturb all params
    leaves, treedef = jax.tree_util.tree_flatten(vdi.sys.params["diffuser"])
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    vdi.sys.params["diffuser"] = jax.tree_util.tree_unflatten(
        treedef, [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])
    base = np.asarray(vdi.inference_t2i("a red cat", seed=1), np.float32)
    # tiny tower latents are 32x32 = 1024 tokens; lower the floor to engage
    vdi.sys.enable_tome(ratio=0.5, min_tokens=256)
    out = np.asarray(vdi.inference_t2i("a red cat", seed=1), np.float32)
    assert np.isfinite(out).all()
    assert out.shape == base.shape
    assert np.abs(out - base).max() > 1e-6  # the approximation is real
    # composes with the dpmpp2m sampler
    vdi.sampler = "dpmpp2m"
    out2 = np.asarray(vdi.inference_t2i("a red cat", seed=1), np.float32)
    assert np.isfinite(out2).all()
    # ratio 0 restores the exact path bit-identically
    vdi.sampler = "ddim"
    vdi.sys.enable_tome(ratio=0.0)
    again = np.asarray(vdi.inference_t2i("a red cat", seed=1), np.float32)
    np.testing.assert_array_equal(again, base)
