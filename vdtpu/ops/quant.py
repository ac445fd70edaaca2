"""int8 weight+activation quantized matmul/conv serving path.

The v5e MXU has 2x int8 throughput vs bf16; the UNet step is conv-dominated
(PERF.md: ~43% of step time in conv fusions at ~68% MXU). This module
provides drop-in quantized Conv/Dense with the SAME param tree as
nn.Conv/nn.Dense (f32/bf16 "kernel"/"bias" leaves): weights are quantized
per-output-channel symmetric int8 at trace time (XLA hoists the
loop-invariant quantization out of the sampling scan, so it happens once),
activations per-tensor dynamic symmetric int8, accumulation in int32, and
the (s_x * s_w) rescale + bias applied in the compute dtype.

Policy: `set_policy("int8")` BEFORE building/jitting a model switches every
`conv3`/`dense` call site that doesn't opt out (tiny accuracy-critical
layers like time-embed MLPs pass quant=False). Serving-only: gradients are
not defined through the rounding.

No counterpart in the reference (fp16 `net.half()` is its only reduced-
precision path, app.py:255-263); this is TPU-native headroom.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

_POLICY: str | None = None


def set_policy(policy: str | None):
    """'int8' or None. Must be set before model build/trace; jitted
    functions traced under one policy do not retrace on change."""
    global _POLICY
    if policy not in (None, "int8"):
        raise ValueError(policy)
    _POLICY = policy


def get_policy() -> str | None:
    return _POLICY


def _quantize_weight(w, reduce_axes):
    """Symmetric per-output-channel int8: returns (int8 w, f32 scale)."""
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes, keepdims=True)
    s = jnp.maximum(s / 127.0, 1e-10)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return wq, s


def _quantize_act(x):
    """Symmetric per-tensor dynamic int8."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)))
    s = jnp.maximum(s / 127.0, 1e-10)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return xq, s


class QConv(nn.Module):
    """int8 2-D conv, param-compatible with nn.Conv (NHWC, HWIO kernel)."""
    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: tuple[tuple[int, int], tuple[int, int]] | str = ((1, 1), (1, 1))
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features))
        wq, s_w = _quantize_weight(kernel, (0, 1, 2))  # s_w [1,1,1,cout]
        xq, s_x = _quantize_act(x)
        pad = self.padding
        if isinstance(pad, str):
            dims = lax.conv_dimension_numbers(x.shape, wq.shape,
                                              ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_general_dilated(
                xq, wq, self.strides, pad, dimension_numbers=dims,
                preferred_element_type=jnp.int32)
        else:
            dims = lax.conv_dimension_numbers(x.shape, wq.shape,
                                              ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_general_dilated(
                xq, wq, self.strides, list(pad), dimension_numbers=dims,
                preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (s_x * s_w.reshape(1, 1, 1, -1))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)


class QDense(nn.Module):
    """int8 matmul over the last axis, param-compatible with nn.Dense."""
    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        wq, s_w = _quantize_weight(kernel, (0,))  # s_w [1, f]
        xq, s_x = _quantize_act(x)
        y = lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (s_x * s_w.reshape((1,) * (x.ndim - 1) + (-1,)))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)
