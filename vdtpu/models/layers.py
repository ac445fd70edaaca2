"""Small shared layers for the model zoo (NHWC, f32 params, dtype-policy compute).

Numerics mirror the reference building blocks
(`/root/reference/lib/model_zoo/diffusion_utils.py:175-221`,
`openaimodel.py:89-159`): GroupNorm(32, eps=1e-5) a.k.a. ``normalization``,
SiLU nonlinearity, 3x3 convs, nearest-neighbour up/stride-2 down sampling.
Norm statistics are always computed in f32 regardless of the compute dtype.
"""
from __future__ import annotations

import os
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# VDTPU_FAST_NORMS=1: run norm math in the compute dtype (bf16) instead of
# f32. The step is HBM-bound; skipping the f32 round trips around every
# GroupNorm trades a tiny amount of precision for bandwidth.
_NORM_DTYPE = jnp.bfloat16 if os.environ.get("VDTPU_FAST_NORMS") else jnp.float32


def group_norm(name: str, groups: int = 32, eps: float = 1e-5) -> nn.GroupNorm:
    # default: reduction + affine in f32; callers cast back.
    return nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=_NORM_DTYPE, name=name)


def conv3(features: int, name: str, dtype: Dtype, zero_init: bool = False,
          stride: int = 1, quant: bool = True) -> nn.Module:
    """3x3 conv; under the int8 serving policy (vdtpu.ops.quant.set_policy)
    it becomes a param-compatible int8 QConv unless quant=False."""
    init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    from vdtpu.ops.quant import QConv, get_policy
    if quant and get_policy() in ("int8", "int8_calib"):
        return QConv(features, (3, 3), strides=(stride, stride),
                     padding=((1, 1), (1, 1)), kernel_init=init,
                     dtype=dtype, name=name)
    return nn.Conv(
        features, (3, 3), strides=(stride, stride), padding=((1, 1), (1, 1)),
        kernel_init=init, bias_init=nn.initializers.zeros,
        dtype=dtype, name=name)


def dense(features: int, name: str, dtype: Dtype, zero_init: bool = False,
          use_bias: bool = True, quant: bool = True) -> nn.Module:
    init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    from vdtpu.ops.quant import QDense, get_policy
    if quant and get_policy() in ("int8", "int8_calib"):
        return QDense(features, use_bias=use_bias, kernel_init=init,
                      dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, kernel_init=init, dtype=dtype, name=name)


def silu(x):
    return nn.silu(x)


def apply_add(module: nn.Module, x, add):
    """module(x) + add, fused into the quantized epilogue when module is a
    QConv/QDense (one HBM pass instead of write+read+write; the elementwise
    passes are bandwidth-bound, PERF.md r2). Numerically: the plain-module
    path is exactly module(x) + add; the Q path adds in the f32 epilogue."""
    from vdtpu.ops.quant import QConv, QDense
    if isinstance(module, (QConv, QDense)):
        return module(x, add=add)
    return module(x) + add


class GNParams(nn.Module):
    """Parameter-only GroupNorm holder: owns {scale, bias} at its mount
    point while the computation happens fused inside a downstream
    QConv/QDense prologue (vdtpu.ops.quant._act_with_prologue)."""
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class FusedGNSiLU(nn.Module):
    """Single-pass Pallas GroupNorm(+SiLU) with nn.GroupNorm-compatible
    param names (vdtpu/ops/pallas/gn_silu.py).

    MEASURED NEGATIVE on v5e for the UNet step (44.6 vs 43.2 ms: XLA's
    producer/consumer fusion around the norm beats a hard kernel boundary,
    PERF.md round 2) — kept as an opt-in (VDTPU_FUSED_GN=1) for other
    backends/shapes; model code defaults to group_norm + silu."""
    with_silu: bool = True
    groups: int = 32
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        from vdtpu.ops.pallas.gn_silu import gn_silu
        return gn_silu(x, scale, bias, self.groups, self.eps,
                       self.with_silu).astype(self.dtype)


class TimeEmbedMLP(nn.Module):
    """Timestep-embedding MLP: Dense -> SiLU -> Dense.

    Torch layout ``time_embed.{0,2}`` (ref openaimodel.py:2629-2633).
    """
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        # quant=False: runs once per step and feeds every FiLM scale —
        # negligible compute, quality-critical
        h = dense(self.dim, "0", self.dtype, quant=False)(t_emb.astype(self.dtype))
        return dense(self.dim, "2", self.dtype, quant=False)(silu(h))


class Upsample2D(nn.Module):
    """Nearest 2x upsample + 3x3 conv (ref openaimodel.py:89-117), NHWC."""
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return conv3(self.channels, "conv", self.dtype)(x)


class Downsample2D(nn.Module):
    """Stride-2 3x3 conv downsample (ref openaimodel.py:133-159), NHWC."""
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return conv3(self.channels, "op", self.dtype, stride=2)(x)
