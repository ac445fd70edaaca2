"""Attention ops: one entry point, two backends.

``scaled_dot_product_attention`` is the only attention primitive the model
zoo uses (standing in for the reference's einsum attention at
`/root/reference/lib/model_zoo/attention.py:170-193`). Backends:

- ``xla``: plain einsum with f32 softmax accumulation — optimal for the tiny
  cross-attention shapes (77/257 keys) where a custom kernel can't beat the
  fused XLA graph.
- ``flash``: Pallas TPU flash-attention kernel (``vdtpu.ops.pallas.flash``)
  for the long self-attention sequences (up to 4096 latent tokens).

Selection is automatic by shape/platform and can be forced via
``set_attention_backend``.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_FORCED_BACKEND: str | None = os.environ.get("VDTPU_ATTN") or None


def set_attention_backend(name: str | None):
    """Force 'xla' or 'flash' globally (None = auto)."""
    global _FORCED_BACKEND
    assert name in (None, "xla", "flash")
    global _FORCED_BACKEND
    _FORCED_BACKEND = name


@functools.cache
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


_FLASH_MIN_KV = int(os.environ.get("VDTPU_FLASH_MIN_KV", "1024"))


def _pick_backend(q_len: int, kv_len: int, head_dim: int) -> str:
    if _FORCED_BACKEND is not None:
        return _FORCED_BACKEND
    # Measured on v5e (bf16): flash wins 5-8x on the long self-attentions
    # (>=1024 tokens). The tiny cross-attentions (77/257 keys) measured
    # *slower* end-to-end through the flash path (padding overhead dominates)
    # and bloat compile time, so they stay on the fused XLA softmax; so do
    # wide-head single-head shapes (VAE mid, D=512, VMEM-bound).
    if _on_tpu() and q_len >= 256 and kv_len >= _FLASH_MIN_KV and head_dim <= 256:
        return "flash"
    return "xla"


def _xla_attention(q, k, v, mask, scale):
    dtype = q.dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def scaled_dot_product_attention(q, k, v, mask=None, scale: float | None = None,
                                 softmax_shift=None):
    """Multi-head attention.

    Args:
      q: [B, Q, H, D]
      k, v: [B, K, H, D]
      mask: optional broadcastable-to [B, H, Q, K] boolean (True = keep).
      scale: logit scale; defaults to D**-0.5 (ref attention.py:158).
      softmax_shift: optional calibrated upper bound on the scaled logits
        (serving): routes eligible shapes to the no-max flash kernel, which
        halves the VPU softmax cost (vdtpu/ops/pallas/flash.py).
    Returns: [B, Q, H, D]
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    backend = _pick_backend(q.shape[1], k.shape[1], q.shape[-1])
    if backend == "flash":
        from vdtpu.ops.pallas.flash import flash_attention, flash_attention_nomax
        if softmax_shift is not None and mask is None:
            return flash_attention_nomax(q, k, v, softmax_shift, scale=scale)
        return flash_attention(q, k, v, mask=mask, scale=scale)
    return _xla_attention(q, k, v, mask, scale)
