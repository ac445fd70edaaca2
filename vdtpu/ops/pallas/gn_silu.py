"""Fused GroupNorm(+SiLU) Pallas TPU kernel.

The reference's `normalization` (GroupNorm32, diffusion_utils.py:205-221)
runs before nearly every conv; under XLA this costs separate
convert/reduce/multiply passes over the activation (~10% of the UNet step,
PERF.md). This kernel does the whole thing in ONE read + ONE write per
activation: f32 statistics in VMEM via two tiny indicator matmuls (channel
sums -> group sums on the MXU), normalize + affine + optional SiLU, write
back in the compute dtype.

Group statistics use E[x^2] - E[x]^2 in f32 over the (N, C/G) slab; parity
vs nn.GroupNorm is tested to 1e-3 in bf16 and 1e-5 in f32.

Backward: custom_vjp recomputes through the jnp reference implementation
(the kernel is a pure speedup, not a numerics change), so the fused path is
safe under jax.grad (training) too.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one f32 + in/out copies of the [N, C] slab must fit VMEM (~16 MB/core)
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _ref_gn_silu(x, scale, bias, groups: int, eps: float, with_silu: bool):
    """jnp reference (identical math to nn.GroupNorm + silu): x [B, N, C]."""
    b, n, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, n, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, n, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _kernel(x_ref, sc_ref, b_ref, ind_ref, indt_ref, o_ref, *,
            eps: float, with_silu: bool, cpg: int):
    xf = x_ref[0].astype(jnp.float32)                       # [N, C]
    n = xf.shape[0]
    colsum = jnp.sum(xf, axis=0, keepdims=True)             # [1, C]
    sqsum = jnp.sum(xf * xf, axis=0, keepdims=True)         # [1, C]
    ind = ind_ref[...]                                      # [C, G]
    gsum = jax.lax.dot(colsum, ind)                         # [1, G]
    gsq = jax.lax.dot(sqsum, ind)
    cnt = float(n * cpg)
    mean_g = gsum / cnt
    var_g = gsq / cnt - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    indt = indt_ref[...]                                    # [G, C]
    mean_c = jax.lax.dot(mean_g, indt)                      # [1, C]
    rstd_c = jax.lax.dot(rstd_g, indt)
    y = (xf - mean_c) * rstd_c * sc_ref[...].astype(jnp.float32) \
        + b_ref[...].astype(jnp.float32)
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.lru_cache(maxsize=64)
def _indicators_np(c: int, groups: int):
    ind = np.zeros((c, groups), np.float32)
    ind[np.arange(c), np.arange(c) // (c // groups)] = 1.0
    return ind, ind.T.copy()


def _indicators(c: int, groups: int):
    # numpy cached; jnp constants created fresh per trace (device arrays
    # cached across jits become leaked tracers)
    ind, indt = _indicators_np(c, groups)
    return jnp.asarray(ind), jnp.asarray(indt)


def _fused_impl(x, scale, bias, groups: int, eps: float, with_silu: bool,
                interpret: bool):
    b, n, c = x.shape
    ind, indt = _indicators(c, groups)
    kern = functools.partial(_kernel, eps=eps, with_silu=with_silu,
                             cpg=c // groups)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale.reshape(1, c), bias.reshape(1, c), ind, indt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_silu(x, scale, bias, groups, eps, with_silu, interpret):
    return _fused_impl(x, scale, bias, groups, eps, with_silu, interpret)


def _gn_silu_fwd(x, scale, bias, groups, eps, with_silu, interpret):
    return _gn_silu(x, scale, bias, groups, eps, with_silu, interpret), \
        (x, scale, bias)


def _gn_silu_bwd(groups, eps, with_silu, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _ref_gn_silu(x_, s_, b_, groups, eps, with_silu),
        x, scale, bias)
    return vjp(g)


_gn_silu.defvjp(_gn_silu_fwd, _gn_silu_bwd)


def _fits_whole_slab(n: int, c: int, dtype, out_itemsize: int) -> bool:
    itemsize = jnp.dtype(dtype).itemsize
    # int8 output: the compiler's scoped-vmem accounting charges ~3 extra
    # f32 temporaries plus the (32,128)-tiled s8 relayout (observed 17.9M
    # for a [4096, 320] bf16->s8 slab); bf16 output compiles at the lighter
    # footprint (measured working in r2)
    factor = (12 + itemsize + out_itemsize) if out_itemsize == 1 \
        else (4 + itemsize + out_itemsize)
    return n * c * factor <= _VMEM_BUDGET_BYTES


def eligible(shape, dtype, out_itemsize: int | None = None) -> bool:
    """Whole-slab kernel: one [N, C] slab per batch item in VMEM. int8
    output additionally accepts the blocked stats+apply path for any
    N % 512 == 0 slab (no size limit)."""
    n = int(np.prod(shape[1:-1]))
    c = shape[-1]
    if not (jax.default_backend() == "tpu" and n % 8 == 0 and c % 8 == 0):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    oi = itemsize if out_itemsize is None else out_itemsize
    if _fits_whole_slab(n, c, dtype, oi):
        return True
    return oi == 1 and n % _BLOCK_N == 0


def _kernel_q(x_ref, sc_ref, b_ref, ind_ref, indt_ref, sact_ref, o_ref, *,
              eps: float, with_silu: bool, cpg: int):
    """GN(+SiLU) fused with static-scale int8 quantization: the UNet's
    conv prologue in ONE pass (feeds vdtpu.ops.quant.QConv/QDense — the
    separate quantize pass costs ~4 ms/step, PERF.md round 2)."""
    xf = x_ref[0].astype(jnp.float32)
    n = xf.shape[0]
    colsum = jnp.sum(xf, axis=0, keepdims=True)
    sqsum = jnp.sum(xf * xf, axis=0, keepdims=True)
    ind = ind_ref[...]
    gsum = jax.lax.dot(colsum, ind)
    gsq = jax.lax.dot(sqsum, ind)
    cnt = float(n * cpg)
    mean_g = gsum / cnt
    var_g = gsq / cnt - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    indt = indt_ref[...]
    mean_c = jax.lax.dot(mean_g, indt)
    rstd_c = jax.lax.dot(rstd_g, indt)
    y = (xf - mean_c) * rstd_c * sc_ref[...].astype(jnp.float32) \
        + b_ref[...].astype(jnp.float32)
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    inv = 1.0 / sact_ref[0]
    o_ref[0] = jnp.clip(jnp.round(y * inv), -127, 127).astype(jnp.int8)


def _stats_kernel(x_ref, ind_ref, indt_ref, o_ref, acc, *, eps: float,
                  count: float):
    """Blocked GN statistics: accumulate column sums over N-blocks in VMEM
    scratch; at the last block reduce to per-group stats (two tiny indicator
    matmuls on the MXU) and emit broadcast-to-channels [mean_c; rstd_c]."""
    nb = pl.program_id(1)

    @pl.when(nb == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    xf = x_ref[0].astype(jnp.float32)                   # [BN, C]
    acc[0:1, :] += jnp.sum(xf, axis=0, keepdims=True)
    acc[1:2, :] += jnp.sum(xf * xf, axis=0, keepdims=True)

    @pl.when(nb == pl.num_programs(1) - 1)
    def _finish():
        ind = ind_ref[...]                              # [C, G]
        gsum = jax.lax.dot(acc[0:1, :], ind)
        gsq = jax.lax.dot(acc[1:2, :], ind)
        mean_g = gsum / count
        var_g = gsq / count - mean_g * mean_g
        rstd_g = jax.lax.rsqrt(var_g + eps)
        indt = indt_ref[...]                            # [G, C]
        o_ref[0, 0:1, :] = jax.lax.dot(mean_g, indt)
        o_ref[0, 1:2, :] = jax.lax.dot(rstd_g, indt)


def _apply_q_kernel(x_ref, st_ref, sc_ref, b_ref, sact_ref, o_ref, *,
                    with_silu: bool):
    xf = x_ref[0].astype(jnp.float32)                   # [BN, C]
    y = (xf - st_ref[0, 0:1, :]) * st_ref[0, 1:2, :] \
        * sc_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    inv = 1.0 / sact_ref[0]
    o_ref[0] = jnp.clip(jnp.round(y * inv), -127, 127).astype(jnp.int8)


_BLOCK_N = 512


def _gn_silu_q_blocked(xr, scale, bias, s_act, groups: int, eps: float,
                       with_silu: bool, interpret: bool):
    """Two-kernel blocked path for slabs too big for VMEM: stats (scratch
    accumulation over N-blocks) then apply+quantize. Same HBM traffic as
    XLA's own lowering (2 reads + 1 int8 write) without its layout-change
    passes."""
    b, n, c = xr.shape
    bn = _BLOCK_N
    ind, indt = _indicators(c, groups)
    sc = scale.reshape(1, c)
    bi = bias.reshape(1, c)
    stats = pl.pallas_call(
        functools.partial(_stats_kernel, eps=eps, count=float(n * (c // groups))),
        grid=(b, n // bn),
        in_specs=[
            pl.BlockSpec((1, bn, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=interpret,
    )(xr, ind, indt)
    out = pl.pallas_call(
        functools.partial(_apply_q_kernel, with_silu=with_silu),
        grid=(b, n // bn),
        in_specs=[
            pl.BlockSpec((1, bn, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, bn, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xr.shape, jnp.int8),
        interpret=interpret,
    )(xr, stats, sc, bi, s_act.reshape(1).astype(jnp.float32))
    return out


def gn_stats(x, groups: int = 32, eps: float = 1e-5,
             interpret: bool = False):
    """Pallas GN statistics ONLY: [B, ..., C] -> [B, 2, C] f32 holding
    channel-broadcast (mean, rstd).

    The stats-ONLY split (r3): the Pallas kernel replaces XLA's
    convert+reduce stat pass (bf16 read, f32 accumulate in VMEM scratch,
    one tiny indicator matmul) while the normalize+affine+SiLU+quantize
    stays an XLA fusion — unlike the full Pallas prologue (rejected twice,
    PERF.md), no custom-call output feeds the conv, so XLA's epilogue
    fusions are untouched. Returns None when the shape is not coverable
    (caller falls back to the jnp path)."""
    shape = x.shape
    c = shape[-1]
    xr = x.reshape(shape[0], -1, c)
    b, n, _ = xr.shape
    bn = next((cand for cand in (_BLOCK_N, 256, 128) if n % cand == 0), None)
    if bn is None or c % 128 or groups > c:
        return None
    ind, indt = _indicators(c, groups)
    return pl.pallas_call(
        functools.partial(_stats_kernel, eps=eps,
                          count=float(n * (c // groups))),
        grid=(b, n // bn),
        in_specs=[
            pl.BlockSpec((1, bn, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=interpret,
    )(xr, ind, indt)


def gn_silu_q(x, scale, bias, s_act, groups: int = 32, eps: float = 1e-5,
              with_silu: bool = True, interpret: bool = False):
    """Fused GN(+SiLU)+int8-quantize; returns int8 of x's shape.

    s_act: static (calibrated) per-tensor activation scale, scalar array.
    Serving-only (no vjp). Whole-slab one-pass kernel when the slab fits
    VMEM; blocked stats+apply kernels otherwise. Caller must check
    `eligible(x.shape, x.dtype, out_itemsize=1)` or pass interpret=True.
    """
    shape = x.shape
    c = shape[-1]
    xr = x.reshape(shape[0], -1, c)
    b, n, _ = xr.shape
    if not (interpret or _fits_whole_slab(n, c, x.dtype, 1)):
        if n % _BLOCK_N != 0:
            # not coverable by either kernel: exact jnp fallback instead of
            # silently dropping the tail rows from the blocked stats
            y = _ref_gn_silu(xr, scale, bias, groups, eps, with_silu)
            inv = 1.0 / s_act.astype(jnp.float32)
            q = jnp.clip(jnp.round(y.astype(jnp.float32) * inv), -127, 127)
            return q.astype(jnp.int8).reshape(shape)
        return _gn_silu_q_blocked(xr, scale, bias, s_act, groups, eps,
                                  with_silu, interpret).reshape(shape)
    ind, indt = _indicators(c, groups)
    kern = functools.partial(_kernel_q, eps=eps, with_silu=with_silu,
                             cpg=c // groups)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xr.shape, jnp.int8),
        interpret=interpret,
    )(xr, scale.reshape(1, c), bias.reshape(1, c), ind, indt,
      s_act.reshape(1).astype(jnp.float32))
    return out.reshape(shape)


def gn_silu(x, scale, bias, groups: int = 32, eps: float = 1e-5,
            with_silu: bool = True, interpret: bool = False):
    """GroupNorm(+SiLU) over the channel-last axis of [B, ..., C].

    Uses the fused Pallas kernel on TPU for slab sizes that fit VMEM, the
    jnp reference otherwise (CPU tests, VAE-sized activations).
    """
    shape = x.shape
    c = shape[-1]
    xr = x.reshape(shape[0], -1, c)
    if interpret or eligible(shape, x.dtype):
        y = _gn_silu(xr, scale, bias, groups, eps, with_silu, interpret)
    else:
        y = _ref_gn_silu(xr, scale, bias, groups, eps, with_silu)
    return y.reshape(shape)
