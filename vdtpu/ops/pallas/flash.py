"""Pallas TPU flash-attention (forward) for the long self-attention path.

The reference computes attention as two einsums + softmax materializing the
full [B*H, N, N] score matrix (`/root/reference/lib/model_zoo/attention.py:
180-192`) — at 4096 latent tokens that is 64 MB/head-batch of HBM traffic
per layer. This kernel streams K/V blocks through VMEM with the online
softmax recurrence, never materializing scores, following the patterns in
the Pallas TPU guide (block specs aligned to (8,128)/MXU tiles, f32
accumulators, grid over (batch*heads, query blocks)).

Backward currently falls back to the XLA einsum gradient via custom_vjp
(recompute; used only if someone differentiates through the flash path —
training defaults to the XLA attention which XLA fuses + remats well).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int,
                  block_k: int):
    q = q_ref[0].astype(jnp.float32)          # [BQ, Dp]
    bq = q.shape[0]
    m_tot = k_ref.shape[1]
    num_kb = m_tot // block_k

    def body(i, carry):
        m_run, l_run, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [BQ, BK]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(col < kv_len, s, -jnp.inf)
        m_new = jnp.maximum(m_run, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_run - m_new)
        l_new = l_run * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, q.shape[1]), jnp.float32)
    m_f, l_f, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l_f[:, None]).astype(o_ref.dtype)


def _flash_fwd_impl(q, k, v, scale: float, block_q: int, block_k: int,
                    interpret: bool):
    """q: [BH, N, D], k/v: [BH, M, D] -> [BH, N, D]."""
    bh, n, d = q.shape
    m = k.shape[1]
    dp = _round_up(d, LANE)
    np_ = _round_up(n, block_q)
    mp = _round_up(m, block_k)
    qp = jnp.pad(q, ((0, 0), (0, np_ - n), (0, dp - d)))
    kp = jnp.pad(k, ((0, 0), (0, mp - m), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, mp - m), (0, dp - d)))

    kernel = functools.partial(
        _flash_kernel, scale=scale, kv_len=m, block_k=block_k)
    out = pl.pallas_call(
        kernel,
        grid=(bh, np_ // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, np_, dp), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :n, :d]


def _xla_ref(q, k, v, scale):
    logits = jnp.einsum("bqd,bkd->bqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, scale, block_q, block_k, interpret):
    return _flash_fwd_impl(q, k, v, scale, block_q, block_k, interpret)


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    return _flash_fwd_impl(q, k, v, scale, block_q, block_k, interpret), (q, k, v)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_ref(a, b, c, scale), q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, mask=None, scale: float | None = None,
                    block_q: int = 512, block_k: int = 512,
                    interpret: bool | None = None):
    """Drop-in for `scaled_dot_product_attention` on [B, N, H, D] tensors.

    mask is not supported on the flash path (the VD self-attentions are
    dense); callers with masks get routed to the XLA backend upstream.
    """
    if mask is not None:
        raise NotImplementedError("flash path is for dense self-attention")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, n, h, d = q.shape
    m = k.shape[1]
    bq = min(block_q, _round_up(n, 8))
    bk = min(block_k, _round_up(m, 128))
    fold = lambda t: t.transpose(0, 2, 1, 3).reshape(b * h, t.shape[1], d)
    out = _flash(fold(q), fold(k), fold(v), scale, bq, bk, interpret)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
