"""Cross-attention transformer ("context layer") primitives.

Capability parity with `/root/reference/lib/model_zoo/attention.py` (GEGLU,
FeedForward, CrossAttention, BasicTransformerBlock, SpatialTransformer),
re-designed token-first: ``SpatialTransformer`` here consumes tokens
[B, N, C] — the UNet reshapes NHWC maps (2-D flow) or [C,S,1] latent views
(0-D flow) into tokens before calling it, so the same module serves both
streams and the attention inner loop dispatches to the Pallas flash kernel
for long sequences (`vdtpu.ops.attention`).

Submodule names are the torch state-dict paths so checkpoint conversion is
mechanical (see vdtpu/interop/torch_convert.py).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vdtpu.models.layers import Dtype, dense, group_norm
from vdtpu.ops.attention import scaled_dot_product_attention


class GEGLU(nn.Module):
    """x * gelu(gate) with a fused 2x projection (ref attention.py:37-44)."""
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        xg = dense(self.dim_out * 2, "proj", self.dtype)(x)
        x, gate = jnp.split(xg, 2, axis=-1)
        return x * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """GEGLU MLP, names net.0/net.2 (ref attention.py:47-64; glu=True path)."""
    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None):
        inner = int(self.dim * self.mult)
        h = GEGLU(inner, self.dtype, name="net.0")(x)
        if residual is None:
            return dense(self.dim, "net.2", self.dtype)(h)
        from vdtpu.models.layers import apply_add
        return apply_add(dense(self.dim, "net.2", self.dtype), h, residual)


class _Kernel(nn.Module):
    """Parameter holder with nn.Dense's param layout ({name: {kernel}}) for
    projections whose matmul runs fused in the parent scope (fused_proj).
    Same init path/shape as the dense() helper -> identical init draws."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None.

    Ref attention.py:152-193. Scale d_head**-0.5; q/k/v projections have no
    bias, output projection does. The q/k/v matmuls share one activation
    quantize under the int8 policy (vdtpu.ops.quant.fused_proj — numerics
    identical to separate QDense calls, PERF.md r3).
    """
    heads: int
    dim_head: int
    query_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None, residual=None):
        from vdtpu.ops.quant import fused_proj
        inner = self.heads * self.dim_head
        self_attn = context is None
        context = x if context is None else context
        b, n, _ = x.shape
        m = context.shape[1]
        wq = _Kernel((x.shape[-1], inner), name="to_q")()
        wk = _Kernel((context.shape[-1], inner), name="to_k")()
        wv = _Kernel((context.shape[-1], inner), name="to_v")()
        if self_attn:
            q, k, v = fused_proj(self, x, [wq, wk, wv], self.dtype)
        else:
            (q,) = fused_proj(self, x, [wq], self.dtype)
            k, v = fused_proj(self, context, [wk, wv], self.dtype, suffix="_kv")
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, m, self.heads, self.dim_head)
        v = v.reshape(b, m, self.heads, self.dim_head)
        out = scaled_dot_product_attention(
            q, k, v, mask=mask, softmax_shift=self._logit_shift(q, k, mask))
        out = out.reshape(b, n, inner)
        if residual is None:
            return dense(self.query_dim, "to_out.0", self.dtype)(out)
        # residual rides the output projection's epilogue (one HBM pass)
        from vdtpu.models.layers import apply_add
        return apply_add(dense(self.query_dim, "to_out.0", self.dtype),
                         out, residual)

    def _logit_shift(self, q, k, mask):
        """Calibrated max-logit bound for the serving no-max softmax kernel.

        Under the int8 calibration pass the actual max scaled logit of this
        call site is sow'd (the extra QK einsum runs only during the handful
        of calibration batches); at serving the recorded bound is read from
        the 'quant' collection and routes attention to
        flash_attention_nomax. None outside the int8 serving policy."""
        from vdtpu.ops.quant import get_policy
        if get_policy() == "int8_calib" and mask is None:
            # per-head bound: head logit ranges differ wildly in trained
            # attention; a shared site max would underflow cold heads' rows.
            # The max is accumulated over query chunks — the full [B,H,N,N]
            # f32 logit tensor of a 4096-token site is ~0.5-1 GB and OOMs
            # full-resolution calibration (ADVICE r2).
            scale = q.shape[-1] ** -0.5
            qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
            bq, nq = qf.shape[0], qf.shape[1]
            chunk = 256
            if nq % chunk or nq <= chunk:
                s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
                mx = jnp.max(s, axis=(0, 2, 3))
            else:
                qc = jnp.moveaxis(
                    qf.reshape(bq, nq // chunk, chunk, *qf.shape[2:]), 1, 0)

                def body(carry, qblk):
                    s = jnp.einsum("bqhd,bkhd->bhqk", qblk, kf) * scale
                    return jnp.maximum(carry, jnp.max(s, axis=(0, 2, 3))), None

                mx, _ = jax.lax.scan(
                    body, jnp.full((self.heads,), -jnp.inf, jnp.float32), qc)
            self.sow("quant_calib", "attn_logit_max", mx,
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.full((self.heads,), -1e30, jnp.float32))
            return None
        if get_policy() == "int8" and self.has_variable("quant", "attn_shift"):
            return self.get_variable("quant", "attn_shift")
        return None


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn(context) -> GEGLU FF, pre-LN residuals.

    Ref attention.py:196-218. disable_self_attn=False in every VD config;
    True makes attn1 a cross-attention too (legacy-zoo option).
    """
    dim: int
    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32
    disable_self_attn: bool = False

    @nn.compact
    def __call__(self, x, context=None):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)
        attn = lambda name: CrossAttention(
            self.heads, self.dim_head, self.dim, self.dtype, name=name)
        from vdtpu.ops.tome import get_tome
        tome = get_tome()  # opt-in approximate mode, read at trace time
        if (tome is not None and not self.disable_self_attn
                and x.shape[1] >= tome.min_tokens):
            # cached_merge: the assignment is computed once per walk per
            # token count and reused across that level's sites (ops/tome.py)
            from vdtpu.ops.tome import cached_merge
            merge, unmerge, _ = cached_merge(x, tome)
            h = merge(ln("norm1")(x).astype(self.dtype))
            x = x + unmerge(attn("attn1")(h))
        else:
            # residuals ride the output projections' epilogues (apply_add)
            x = attn("attn1")(ln("norm1")(x).astype(self.dtype),
                              context=context if self.disable_self_attn else None,
                              residual=x)
        x = attn("attn2")(ln("norm2")(x).astype(self.dtype), context=context,
                          residual=x)
        x = FeedForward(self.dim, dtype=self.dtype, name="ff")(
            ln("norm3")(x).astype(self.dtype), residual=x)
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm -> proj_in -> N transformer blocks -> zero proj_out, residual.

    Token-first version of ref attention.py:221-266; proj_in/proj_out are the
    reference's 1x1 convs expressed as Dense over the channel axis (identical
    math, converter squeezes the torch [O,I,1,1] kernels).
    """
    channels: int
    heads: int
    dim_head: int
    depth: int = 1
    dtype: Dtype = jnp.float32
    disable_self_attn: bool = False

    @nn.compact
    def __call__(self, tokens, context=None):
        inner = self.heads * self.dim_head
        x_in = tokens
        x = group_norm("norm", eps=1e-6)(tokens).astype(self.dtype)
        x = dense(inner, "proj_in", self.dtype)(x)
        for d in range(self.depth):
            x = BasicTransformerBlock(
                inner, self.heads, self.dim_head, self.dtype,
                disable_self_attn=self.disable_self_attn,
                name=f"transformer_blocks.{d}")(x, context=context)
        from vdtpu.models.layers import apply_add
        return apply_add(
            dense(self.channels, "proj_out", self.dtype, zero_init=True),
            x, x_in)
