"""Fully-fused int8 ResBlock conv: GN-stats + GN-apply + SiLU + quantize +
3x3 int8 conv + dequant + bias/FiLM/residual adds in ONE Pallas TPU kernel.

Why: under the int8 serving policy the UNet step spends ~34% of its time in
XLA's separate quantize (clamp+convert) and GN-stat (convert+reduce) passes
(PERF.md round-3 trace: 18.8 + 15.7 of 99.5 ms at batch 16), ~2x their HBM
floor. Three attempts to replace PARTS of that chain with Pallas kernels
lost end-to-end (PERF.md: full prologue -10%, packed attention -3.5%,
stats-only GN -11%) because every custom-call boundary inside the sampling
scan breaks an XLA conv fusion. This kernel removes the boundary entirely:
the conv itself lives in the kernel, so nothing is handed back to XLA
between the norm and the matmul — the activation is read from HBM exactly
once.

Layout: the ResBlock runs in a "padded-flat" layout [B, H*(W+2), C] — each
image row carries one zero column on each side, rows are concatenated.
A 3x3 tap (dy, dx) is then a SINGLE flattened offset o = (dy-1)*(W+2) +
(dx-1): out[p] = sum_taps (s8[p+o] @ W[tap]). Row padding needs no storage:
taps reading past either end are simply not accumulated (zero-padding
semantics), implemented as shifted static slices. Column-pad positions are
zeroed after quantization (and after the epilogue), so the layout composes:
conv1's padded-flat output IS conv2's padded-flat input, and GN statistics
are unaffected because the pads are exact zeros (they contribute nothing to
sums; the count uses H*W). One `pad_flat` on ResBlock entry and one
`unpad_flat` on exit are the only layout passes.

Numerics match vdtpu.ops.quant.QConv's int8 path: f32 GN statistics
(indicator-matmul group reduce, identical to ops.pallas.gn_silu), f32
apply+SiLU, static calibrated per-tensor activation scale, per-output-
channel weight scales, exact i32 tap accumulation, f32 dequant+bias+adds.

Reference counterpart: ResBlock in_layers/out_layers
(/root/reference/lib/model_zoo/openaimodel.py:162-274) — GroupNorm32 +
SiLU + conv2d, time-FiLM add, residual skip. No reference analogue for the
quantization (TPU-native headroom).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vdtpu.ops.pallas.gn_silu import _indicators, _indicators_np

# per-kernel scoped-VMEM override: the fused working set (bf16 in, s8 slab,
# i32 acc, f32 epilogue) tops ~50 MB at the widest decoder shapes — far
# over the 16 MB default but comfortably inside the chip's 128 MB VMEM.
_VMEM_LIMIT = 100 * 2**20


def _stat_chunk(c: int) -> int:
    """Rows per f32 stats/apply chunk: bound the [chunk, C] f32 temporaries
    to ~2.5 MB so wide decoder channels (C up to 1920) stay inside VMEM."""
    return max(128, (5 * 2**20) // (8 * c) // 8 * 8)


def pad_flat(x):
    """[B, H, W, C] -> padded-flat [B, H*(W+2), C] (zero col borders)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return xp.reshape(b, h * (w + 2), c)


def unpad_flat(y, h: int, w: int):
    """padded-flat [B, H*(W+2), N] -> [B, H, W, N]."""
    b = y.shape[0]
    return y.reshape(b, h, w + 2, -1)[:, :, 1:w + 1, :]


def eligible(h: int, w: int, cin: int, cout: int) -> bool:
    """Kernel coverage: big-enough spatial slabs (the small levels' prologue
    passes are cheap and the weight slab dominates VMEM), 8-aligned dims.
    VDTPU_QCONV_FORCE=1 skips the backend check (CPU interpret tests)."""
    import os
    if not (h * w >= 1024 and h % 8 == 0 and w % 8 == 0
            and cin % 8 == 0 and cout % 8 == 0):
        return False
    return (jax.default_backend() == "tpu"
            or os.environ.get("VDTPU_QCONV_FORCE") == "1")


@functools.lru_cache(maxsize=32)
def _colmask_np(h: int, w: int):
    """[H*(W+2), 1] f32: 0 at the zero-column positions, else 1."""
    m = np.zeros((h, w + 2, 1), np.float32)
    m[:, 1:w + 1] = 1.0
    return m.reshape(h * (w + 2), 1)


def _kernel(x_ref, w_ref, sw_ref, b_ref, gs_ref, gb_ref, ind_ref, indt_ref,
            mask_ref, sx_ref, addv_ref, *rest, H, W, C, N, groups, eps,
            with_silu, has_addf, count):
    if has_addf:
        addf_ref, o_ref, s8, acc = rest
    else:
        o_ref, s8, acc = rest
    m3 = H * (W + 2)
    chunk = _stat_chunk(C)
    nch = -(-m3 // chunk)

    # ---- GN statistics (f32, zeros at col pads contribute nothing) ----
    colsum = jnp.zeros((1, C), jnp.float32)
    sqsum = jnp.zeros((1, C), jnp.float32)
    for i in range(nch):
        lo, hi = i * chunk, min((i + 1) * chunk, m3)
        xf = x_ref[0, lo:hi, :].astype(jnp.float32)
        colsum += jnp.sum(xf, axis=0, keepdims=True)
        sqsum += jnp.sum(xf * xf, axis=0, keepdims=True)
    gsum = jax.lax.dot(colsum, ind_ref[...])
    gsq = jax.lax.dot(sqsum, ind_ref[...])
    mean_g = gsum / count
    var_g = gsq / count - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jax.lax.dot(mean_g, indt_ref[...])            # [1, C]
    rstd_c = jax.lax.dot(rstd_g, indt_ref[...])

    # ---- apply + SiLU + quantize into the s8 slab (col pads zeroed) ----
    gsc = gs_ref[...].astype(jnp.float32)
    gbi = gb_ref[...].astype(jnp.float32)
    sx = sx_ref[0]
    for i in range(nch):
        lo, hi = i * chunk, min((i + 1) * chunk, m3)
        xf = x_ref[0, lo:hi, :].astype(jnp.float32)
        y = (xf - mean_c) * rstd_c * gsc + gbi
        if with_silu:
            y = y * jax.nn.sigmoid(y)
        # divide (not multiply-by-reciprocal): bit-matches _quantize_act
        q = jnp.clip(jnp.round(y / sx), -127, 127)
        s8[lo:hi, :] = (q * mask_ref[lo:hi, :]).astype(jnp.int8)

    # ---- 9-tap int8 conv: shifted static slices, exact i32 accumulate ----
    acc[...] = jnp.zeros_like(acc)
    for dy in range(3):
        for dx in range(3):
            o = (dy - 1) * (W + 2) + (dx - 1)
            lo, hi = max(0, -o), m3 - max(0, o)
            y = jax.lax.dot_general(
                s8[lo + o:hi + o, :], w_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc[lo:hi, :] += y

    # ---- dequant + bias + FiLM + residual, re-zero col pads ----
    out = acc[...].astype(jnp.float32) * (sx_ref[0] * sw_ref[...]) + b_ref[...]
    out = out + addv_ref[0].astype(jnp.float32)
    if has_addf:
        out = out + addf_ref[0].astype(jnp.float32)
    out = out * mask_ref[...]
    o_ref[0] = out.astype(o_ref.dtype)


def qconv3_flat(x, gn_scale, gn_bias, s_act, wq, s_w, bias, h: int, w: int,
                groups: int = 32, eps: float = 1e-5, with_silu: bool = True,
                add_vec=None, add_full=None, out_dtype=None,
                interpret: bool = False):
    """Fused GN+SiLU+quantize+conv3x3+dequant on padded-flat input.

    x: [B, H*(W+2), C] (from pad_flat / a previous qconv3_flat).
    wq: int8 [3, 3, C, N] calibrated weights; s_w f32 [..., N] per-channel
    scales; s_act scalar f32 activation scale; bias [N].
    add_vec: [B, N] per-batch broadcast add (time-FiLM), optional.
    add_full: [B, H*(W+2), N] padded-flat add (residual skip), optional.
    Returns padded-flat [B, H*(W+2), N] with zeroed column pads.
    """
    b, m3, c = x.shape
    assert m3 == h * (w + 2), (m3, h, w)
    n = wq.shape[-1]
    dtype = out_dtype or x.dtype
    ind, indt = _indicators(c, groups)
    mask = jnp.asarray(_colmask_np(h, w))
    w9 = wq.reshape(9, c, n)
    swf = s_w.reshape(1, n).astype(jnp.float32)
    bf = bias.reshape(1, n).astype(jnp.float32)
    if add_vec is None:
        add_vec = jnp.zeros((b, n), dtype)
    av = add_vec.reshape(b, 1, n)
    args = [x, w9, swf, bf, gn_scale.reshape(1, c), gn_bias.reshape(1, c),
            ind, indt, mask, s_act.reshape(1).astype(jnp.float32), av]
    in_specs = [
        pl.BlockSpec((1, m3, c), lambda i: (i, 0, 0)),          # x
        pl.BlockSpec((9, c, n), lambda i: (0, 0, 0)),           # weights
        pl.BlockSpec((1, n), lambda i: (0, 0)),                 # w scales
        pl.BlockSpec((1, n), lambda i: (0, 0)),                 # bias
        pl.BlockSpec((1, c), lambda i: (0, 0)),                 # gn scale
        pl.BlockSpec((1, c), lambda i: (0, 0)),                 # gn bias
        pl.BlockSpec((c, groups), lambda i: (0, 0)),            # indicator
        pl.BlockSpec((groups, c), lambda i: (0, 0)),            # indicator^T
        pl.BlockSpec((m3, 1), lambda i: (0, 0)),                # col mask
        pl.BlockSpec(memory_space=pltpu.SMEM),                  # act scale
        pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),           # FiLM add
    ]
    has_addf = add_full is not None
    if has_addf:
        args.append(add_full)
        in_specs.append(pl.BlockSpec((1, m3, n), lambda i: (i, 0, 0)))
    kern = functools.partial(
        _kernel, H=h, W=w, C=c, N=n, groups=groups, eps=float(eps),
        with_silu=with_silu, has_addf=has_addf,
        count=float(h * w * (c // groups)))
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, m3, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m3, n), dtype),
        scratch_shapes=[pltpu.VMEM((m3, c), jnp.int8),
                        pltpu.VMEM((m3, n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)


def ref_qconv3_flat(x, gn_scale, gn_bias, s_act, wq, s_w, bias, h, w,
                    groups=32, eps=1e-5, with_silu=True, add_vec=None,
                    add_full=None):
    """jnp reference of the fused kernel (identical math, XLA ops)."""
    from jax import lax
    b, m3, c = x.shape
    n = wq.shape[-1]
    x4 = x.reshape(b, h, w + 2, c)[:, :, 1:w + 1, :]        # valid region
    xf = x4.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * gn_scale.astype(jnp.float32) \
        + gn_bias.astype(jnp.float32)
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    sx = s_act.astype(jnp.float32)
    q = jnp.clip(jnp.round(y / sx), -127, 127).astype(jnp.int8)
    dims = lax.conv_dimension_numbers(q.shape, wq.shape,
                                      ("NHWC", "HWIO", "NHWC"))
    acc = lax.conv_general_dilated(q, wq, (1, 1), ((1, 1), (1, 1)),
                                   dimension_numbers=dims,
                                   preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (sx * s_w.reshape(1, 1, 1, n)) \
        + bias.astype(jnp.float32)
    if add_vec is not None:
        out = out + add_vec.astype(jnp.float32).reshape(b, 1, 1, n)
    if add_full is not None:
        af = add_full.reshape(b, h, w + 2, n)[:, :, 1:w + 1, :]
        out = out + af.astype(jnp.float32)
    out = out.astype(x.dtype)
    return pad_flat(out)
