"""Fully-fused int8 ResBlock conv Pallas kernels: GN-stats + GN-apply +
SiLU + quantize + 3x3 int8 conv + dequant + bias/FiLM/residual adds in ONE
kernel — and a whole-ResBlock variant that keeps the mid activation in VMEM.

Why: under the int8 serving policy the UNet step spends ~34% of its time in
XLA's separate quantize (clamp+convert) and GN-stat (convert+reduce) passes
(PERF.md round-3 trace: 18.8 + 15.7 of 99.5 ms at batch 16), ~2x their HBM
floor. Partial Pallas fusions lost end-to-end three times (PERF.md) because
every custom-call boundary inside the sampling scan breaks an XLA conv
fusion; here the conv itself lives in the kernel. A first padded-flat
attempt won standalone (-34%/-66% per site) but LOST e2e (1.441 vs 1.576
img/s): its pad/unpad layout passes around every ResBlock cost more than
the fusion saved. This version eliminates layout passes entirely.

Layout: plain flattened [B, H*W, C] — `x.reshape(B, H*W, C)` is a FREE
reshape (W and C tilings unchanged), so entering/leaving the kernel costs
nothing. A 3x3 tap (dy, dx) is the flattened offset o = (dy-1)*W + (dx-1):

    out[p] = sum_taps (s8[p + o] @ W[tap])

Row-edge zero padding falls out of clamping each tap's shifted slice to
[0, M). Column wrap-around (a dx=-1 tap at column 0 reading the previous
row's last column) is exactly the set of source entries whose column is
W-1 (for dx=0 taps) or 0 (for dx=2 taps): the kernel keeps two column-
masked copies of the int8 slab and routes each dx group to the right one,
which restores zero-padding semantics with no padded storage at all.

The whole-ResBlock kernel (`resblock_flat`) runs BOTH convs: x -> GN1 +
SiLU + quantize -> conv1 (+bias+FiLM) -> bf16 mid (VMEM only, never hits
HBM) -> GN2 + SiLU + quantize -> conv2 (+bias+skip). HBM traffic per
ResBlock: read x, read skip, write out, weights — everything else stays
on-chip.

Numerics match vdtpu.ops.quant.QConv's int8 path: f32 GN statistics
(indicator-matmul group reduce, as ops.pallas.gn_silu), f32 apply+SiLU,
static calibrated per-tensor activation scale (divide, bit-matching
_quantize_act), per-output-channel weight scales, exact i32 tap
accumulation, f32 dequant+bias+adds, bf16 mid rounding exactly where the
standard path rounds.

Reference counterpart: ResBlock in_layers/out_layers
(/root/reference/lib/model_zoo/openaimodel.py:162-274) — GroupNorm32 +
SiLU + conv2d, time-FiLM add, residual skip. No reference analogue for the
quantization (TPU-native headroom).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vdtpu.ops.pallas.gn_silu import _indicators, _indicators_np

# per-kernel scoped-VMEM override: the fused working set (bf16 in, s8 slab
# + two masked copies, i32 acc, f32 temporaries) tops ~50 MB at the widest
# decoder shapes — far over the 16 MB default but inside the 128 MB VMEM.
_VMEM_LIMIT = 100 * 2**20


def _stat_chunk(c: int) -> int:
    """Rows per f32 stats/apply chunk: bound the [chunk, C] f32 temporaries
    to ~2.5 MB so wide decoder channels (C up to 1920) stay inside VMEM."""
    return max(128, (5 * 2**20) // (8 * c) // 8 * 8)


def eligible(h: int, w: int, cin: int, cout: int) -> bool:
    """Kernel coverage: big-enough spatial slabs (the small levels' prologue
    passes are cheap and the weight slab dominates VMEM), 8-aligned dims.
    VDTPU_QCONV_FORCE=1 skips the backend check (CPU interpret tests)."""
    min_px = int(os.environ.get("VDTPU_QCONV_MIN_PIXELS", "1024"))
    if not (h * w >= min_px and h % 8 == 0 and w % 8 == 0
            and cin % 8 == 0 and cout % 8 == 0):
        return False
    return (jax.default_backend() == "tpu"
            or os.environ.get("VDTPU_QCONV_FORCE") == "1")


@functools.lru_cache(maxsize=32)
def _colmasks_np(h: int, w: int):
    """(maskL, maskR) [H*W, 1] f32: maskL zeroes column W-1 (sources that
    dx=0 taps must not read — they'd wrap into the next row's column 0);
    maskR zeroes column 0 (dx=2 taps' wrap). f32 because Mosaic has no
    int8 elementwise multiply — masking happens before the s8 cast."""
    left = np.ones((h, w, 1), np.float32)
    left[:, w - 1] = 0
    right = np.ones((h, w, 1), np.float32)
    right[:, 0] = 0
    return left.reshape(h * w, 1), right.reshape(h * w, 1)


def _gn_quant_slab(gs_ref, gb_ref, ind, indt, sx, s8, s8l, s8r,
                   ml_ref, mr_ref, *, m, c, groups, eps, with_silu, count,
                   read):
    """Shared stage: GN stats over [m, c] (f32, chunked), apply+SiLU,
    static-scale quantize into s8[:, :c], plus the two column-masked
    copies (the slabs may be wider than c — the whole-ResBlock kernel
    shares them across both channel widths)."""
    chunk = _stat_chunk(c)
    nch = -(-m // chunk)
    colsum = jnp.zeros((1, c), jnp.float32)
    sqsum = jnp.zeros((1, c), jnp.float32)
    for i in range(nch):
        lo, hi = i * chunk, min((i + 1) * chunk, m)
        xf = read(lo, hi).astype(jnp.float32)
        colsum += jnp.sum(xf, axis=0, keepdims=True)
        sqsum += jnp.sum(xf * xf, axis=0, keepdims=True)
    gsum = jax.lax.dot(colsum, ind)
    gsq = jax.lax.dot(sqsum, ind)
    mean_g = gsum / count
    var_g = gsq / count - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jax.lax.dot(mean_g, indt)                     # [1, c]
    rstd_c = jax.lax.dot(rstd_g, indt)
    gsc = gs_ref[...].astype(jnp.float32)
    gbi = gb_ref[...].astype(jnp.float32)
    for i in range(nch):
        lo, hi = i * chunk, min((i + 1) * chunk, m)
        xf = read(lo, hi).astype(jnp.float32)
        y = (xf - mean_c) * rstd_c * gsc + gbi
        if with_silu:
            y = y * jax.nn.sigmoid(y)
        # divide (not multiply-by-reciprocal): bit-matches _quantize_act
        q = jnp.clip(jnp.round(y / sx), -127, 127)
        s8[lo:hi, 0:c] = q.astype(jnp.int8)
        s8l[lo:hi, 0:c] = (q * ml_ref[lo:hi, :]).astype(jnp.int8)
        s8r[lo:hi, 0:c] = (q * mr_ref[lo:hi, :]).astype(jnp.int8)


def _conv_taps(w_ref, acc, s8, s8l, s8r, *, m, w, c):
    """9-tap shifted-slice int8 conv into the i32 acc scratch."""
    acc[...] = jnp.zeros_like(acc)
    for dy in range(3):
        for dx in range(3):
            o = (dy - 1) * w + (dx - 1)
            src = (s8l, s8, s8r)[dx]
            lo, hi = max(0, -o), m - max(0, o)
            y = jax.lax.dot_general(
                src[lo + o:hi + o, 0:c], w_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc[lo:hi, :] += y


def _kernel(x_ref, w_ref, sw_ref, b_ref, gs_ref, gb_ref, ind_ref, indt_ref,
            ml_ref, mr_ref, sx_ref, addv_ref, *rest, H, W, C, N, groups,
            eps, with_silu, has_addf, count):
    if has_addf:
        addf_ref, o_ref, s8, s8l, s8r, acc = rest
    else:
        o_ref, s8, s8l, s8r, acc = rest
    m = H * W
    _gn_quant_slab(gs_ref, gb_ref, ind_ref[...], indt_ref[...],
                   sx_ref[0], s8, s8l, s8r, ml_ref, mr_ref, m=m, c=C,
                   groups=groups, eps=eps, with_silu=with_silu, count=count,
                   read=lambda lo, hi: x_ref[0, lo:hi, :])
    _conv_taps(w_ref, acc, s8, s8l, s8r, m=m, w=W, c=C)
    out = acc[...].astype(jnp.float32) * (sx_ref[0] * sw_ref[...]) + b_ref[...]
    out = out + addv_ref[0].astype(jnp.float32)
    if has_addf:
        out = out + addf_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def qconv3_flat(x, gn_scale, gn_bias, s_act, wq, s_w, bias, h: int, w: int,
                groups: int = 32, eps: float = 1e-5, with_silu: bool = True,
                add_vec=None, add_full=None, out_dtype=None,
                interpret: bool = False):
    """Fused GN+SiLU+quantize+conv3x3+dequant on flat [B, H*W, C] input.

    wq: int8 [3, 3, C, N] calibrated weights; s_w f32 [..., N] per-channel
    scales; s_act scalar f32 activation scale; bias [N].
    add_vec: [B, N] per-batch broadcast add (time-FiLM), optional.
    add_full: [B, H*W, N] flat add (residual skip), optional.
    Returns flat [B, H*W, N].
    """
    b, m, c = x.shape
    assert m == h * w, (m, h, w)
    n = wq.shape[-1]
    dtype = out_dtype or x.dtype
    ind, indt = _indicators(c, groups)
    ml, mr = _colmasks_np(h, w)
    w9 = wq.reshape(9, c, n)
    swf = s_w.reshape(1, n).astype(jnp.float32)
    bf = bias.reshape(1, n).astype(jnp.float32)
    if add_vec is None:
        add_vec = jnp.zeros((b, n), dtype)
    av = add_vec.reshape(b, 1, n)
    args = [x, w9, swf, bf, gn_scale.reshape(1, c), gn_bias.reshape(1, c),
            ind, indt, jnp.asarray(ml), jnp.asarray(mr),
            s_act.reshape(1).astype(jnp.float32), av]
    in_specs = [
        pl.BlockSpec((1, m, c), lambda i: (i, 0, 0)),           # x
        pl.BlockSpec((9, c, n), lambda i: (0, 0, 0)),           # weights
        pl.BlockSpec((1, n), lambda i: (0, 0)),                 # w scales
        pl.BlockSpec((1, n), lambda i: (0, 0)),                 # bias
        pl.BlockSpec((1, c), lambda i: (0, 0)),                 # gn scale
        pl.BlockSpec((1, c), lambda i: (0, 0)),                 # gn bias
        pl.BlockSpec((c, groups), lambda i: (0, 0)),            # indicator
        pl.BlockSpec((groups, c), lambda i: (0, 0)),            # indicator^T
        pl.BlockSpec((m, 1), lambda i: (0, 0)),                 # col mask L
        pl.BlockSpec((m, 1), lambda i: (0, 0)),                 # col mask R
        pl.BlockSpec(memory_space=pltpu.SMEM),                  # act scale
        pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),           # FiLM add
    ]
    has_addf = add_full is not None
    if has_addf:
        args.append(add_full)
        in_specs.append(pl.BlockSpec((1, m, n), lambda i: (i, 0, 0)))
    kern = functools.partial(
        _kernel, H=h, W=w, C=c, N=n, groups=groups, eps=float(eps),
        with_silu=with_silu, has_addf=has_addf,
        count=float(h * w * (c // groups)))
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, m, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m, n), dtype),
        scratch_shapes=[pltpu.VMEM((m, c), jnp.int8),
                        pltpu.VMEM((m, c), jnp.int8),
                        pltpu.VMEM((m, c), jnp.int8),
                        pltpu.VMEM((m, n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)


def _resblock_kernel(x_ref, w1_ref, sw1_ref, b1_ref, gs1_ref, gb1_ref,
                     ind1_ref, indt1_ref, w2_ref, sw2_ref, b2_ref, gs2_ref,
                     gb2_ref, ind2_ref, indt2_ref, ml_ref, mr_ref, sx_ref,
                     film_ref, *rest, H, W, C, N, groups, eps, has_skip,
                     count1, count2):
    """Both ResBlock convs in one kernel; the bf16 mid never leaves VMEM.

    sx_ref (SMEM) holds [sx1, sx2]. film_ref: [1, 1, N] per-batch FiLM.
    has_skip: skip tensor input present (channel-changing blocks); identity
    skip re-reads x_ref instead (same bytes, no extra HBM input)."""
    if has_skip:
        skip_ref, o_ref, mid, s8, s8l, s8r, acc = rest
    else:
        o_ref, mid, s8, s8l, s8r, acc = rest
    m = H * W

    # conv1: GN1+SiLU+quantize(x) -> taps -> dequant+bias+FiLM -> mid
    _gn_quant_slab(gs1_ref, gb1_ref, ind1_ref[...], indt1_ref[...],
                   sx_ref[0], s8, s8l, s8r, ml_ref, mr_ref, m=m, c=C,
                   groups=groups, eps=eps, with_silu=True, count=count1,
                   read=lambda lo, hi: x_ref[0, lo:hi, :])
    _conv_taps(w1_ref, acc, s8, s8l, s8r, m=m, w=W, c=C)
    chunk = _stat_chunk(N)
    for i in range(-(-m // chunk)):
        lo, hi = i * chunk, min((i + 1) * chunk, m)
        y = acc[lo:hi, :].astype(jnp.float32) * (sx_ref[0] * sw1_ref[...]) \
            + b1_ref[...] + film_ref[0].astype(jnp.float32)
        mid[lo:hi, :] = y.astype(mid.dtype)

    # conv2: GN2+SiLU+quantize(mid) -> taps -> dequant+bias+skip
    _gn_quant_slab(gs2_ref, gb2_ref, ind2_ref[...], indt2_ref[...],
                   sx_ref[1], s8, s8l, s8r, ml_ref, mr_ref, m=m, c=N,
                   groups=groups, eps=eps, with_silu=True, count=count2,
                   read=lambda lo, hi: mid[lo:hi, :])
    _conv_taps(w2_ref, acc, s8, s8l, s8r, m=m, w=W, c=N)
    out = acc[...].astype(jnp.float32) * (sx_ref[1] * sw2_ref[...]) \
        + b2_ref[...]
    out = out + (skip_ref[0] if has_skip else x_ref[0]).astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def resblock_flat(x, gn1, w1q, s1w, b1, sx1, film, gn2, w2q, s2w, b2, sx2,
                  h: int, w: int, skip=None, groups: int = 32,
                  eps: float = 1e-5, out_dtype=None, interpret: bool = False):
    """Whole-ResBlock fused kernel on flat [B, H*W, C] input.

    gn1/gn2: (scale, bias) GroupNorm affine params. w{1,2}q int8
    [3, 3, C|N, N]; s{1,2}w per-channel scales; b{1,2} biases; sx{1,2}
    scalar activation scales; film [B, N] time-FiLM. skip: flat [B, H*W, N]
    (None = identity skip, requires C == N). Returns flat [B, H*W, N].
    """
    b, m, c = x.shape
    assert m == h * w
    n = w1q.shape[-1]
    if skip is None:
        assert c == n, "identity skip needs matching channels"
    dtype = out_dtype or x.dtype
    ind1, indt1 = _indicators(c, groups)
    ind2, indt2 = _indicators(n, groups)
    ml, mr = _colmasks_np(h, w)
    cm = max(c, n)  # shared s8 slab width
    sx = jnp.stack([sx1.reshape(()), sx2.reshape(())]).astype(jnp.float32)
    args = [x, w1q.reshape(9, c, n), s1w.reshape(1, n).astype(jnp.float32),
            b1.reshape(1, n).astype(jnp.float32),
            gn1[0].reshape(1, c), gn1[1].reshape(1, c), ind1, indt1,
            w2q.reshape(9, n, n), s2w.reshape(1, n).astype(jnp.float32),
            b2.reshape(1, n).astype(jnp.float32),
            gn2[0].reshape(1, n), gn2[1].reshape(1, n), ind2, indt2,
            jnp.asarray(ml), jnp.asarray(mr), sx, film.reshape(b, 1, n)]
    in_specs = [
        pl.BlockSpec((1, m, c), lambda i: (i, 0, 0)),           # x
        pl.BlockSpec((9, c, n), lambda i: (0, 0, 0)),           # w1
        pl.BlockSpec((1, n), lambda i: (0, 0)),
        pl.BlockSpec((1, n), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((c, groups), lambda i: (0, 0)),
        pl.BlockSpec((groups, c), lambda i: (0, 0)),
        pl.BlockSpec((9, n, n), lambda i: (0, 0, 0)),           # w2
        pl.BlockSpec((1, n), lambda i: (0, 0)),
        pl.BlockSpec((1, n), lambda i: (0, 0)),
        pl.BlockSpec((1, n), lambda i: (0, 0)),
        pl.BlockSpec((1, n), lambda i: (0, 0)),
        pl.BlockSpec((n, groups), lambda i: (0, 0)),
        pl.BlockSpec((groups, n), lambda i: (0, 0)),
        pl.BlockSpec((m, 1), lambda i: (0, 0)),                 # col mask L
        pl.BlockSpec((m, 1), lambda i: (0, 0)),                 # col mask R
        pl.BlockSpec(memory_space=pltpu.SMEM),                  # [sx1, sx2]
        pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),           # FiLM
    ]
    has_skip = skip is not None
    if has_skip:
        args.append(skip)
        in_specs.append(pl.BlockSpec((1, m, n), lambda i: (i, 0, 0)))
    kern = functools.partial(
        _resblock_kernel, H=h, W=w, C=c, N=n, groups=groups, eps=float(eps),
        has_skip=has_skip, count1=float(h * w * (c // groups)),
        count2=float(h * w * (n // groups)))
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, m, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m, n), dtype),
        scratch_shapes=[pltpu.VMEM((m, n), jnp.dtype(dtype)),    # mid
                        pltpu.VMEM((m, cm), jnp.int8),
                        pltpu.VMEM((m, cm), jnp.int8),
                        pltpu.VMEM((m, cm), jnp.int8),
                        pltpu.VMEM((m, n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# jnp references (identical math, XLA ops) for parity tests and the
# calibration path.


def _ref_gn_silu_q(x4, gn_scale, gn_bias, s_act, groups, eps,
                   with_silu=True):
    b, h, w, c = x4.shape
    xf = x4.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * gn_scale.astype(jnp.float32) \
        + gn_bias.astype(jnp.float32)
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    return jnp.clip(jnp.round(y / s_act.astype(jnp.float32)),
                    -127, 127).astype(jnp.int8)


def _ref_conv_dequant(q, wq, s_act, s_w, bias):
    from jax import lax
    n = wq.shape[-1]
    dims = lax.conv_dimension_numbers(q.shape, wq.shape,
                                      ("NHWC", "HWIO", "NHWC"))
    acc = lax.conv_general_dilated(q, wq, (1, 1), ((1, 1), (1, 1)),
                                   dimension_numbers=dims,
                                   preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) \
        * (s_act.astype(jnp.float32) * s_w.reshape(1, 1, 1, n)) \
        + bias.astype(jnp.float32)


def ref_qconv3_flat(x, gn_scale, gn_bias, s_act, wq, s_w, bias, h, w,
                    groups=32, eps=1e-5, with_silu=True, add_vec=None,
                    add_full=None):
    """jnp reference of qconv3_flat (flat [B, H*W, C] in/out)."""
    b, m, c = x.shape
    n = wq.shape[-1]
    x4 = x.reshape(b, h, w, c)
    q = _ref_gn_silu_q(x4, gn_scale, gn_bias, s_act, groups, eps, with_silu)
    out = _ref_conv_dequant(q, wq, s_act, s_w, bias)
    if add_vec is not None:
        out = out + add_vec.astype(jnp.float32).reshape(b, 1, 1, n)
    if add_full is not None:
        out = out + add_full.astype(jnp.float32).reshape(b, h, w, n)
    return out.astype(x.dtype).reshape(b, m, n)


def ref_resblock_flat(x, gn1, w1q, s1w, b1, sx1, film, gn2, w2q, s2w, b2,
                      sx2, h, w, skip=None, groups=32, eps=1e-5):
    """jnp reference of resblock_flat (includes the bf16 mid rounding)."""
    b, m, c = x.shape
    n = w1q.shape[-1]
    x4 = x.reshape(b, h, w, c)
    q1 = _ref_gn_silu_q(x4, gn1[0], gn1[1], sx1, groups, eps)
    mid = _ref_conv_dequant(q1, w1q, sx1, s1w, b1) \
        + film.astype(jnp.float32).reshape(b, 1, 1, n)
    mid = mid.astype(x.dtype)  # the kernel's mid scratch uses out dtype
    q2 = _ref_gn_silu_q(mid, gn2[0], gn2[1], sx2, groups, eps)
    out = _ref_conv_dequant(q2, w2q, sx2, s2w, b2)
    sk = x if skip is None else skip
    out = out + sk.astype(jnp.float32).reshape(b, h, w, n)
    return out.astype(x.dtype).reshape(b, m, n)
