"""Exponential moving average of parameters.

Capability parity with `LitEma` (`/root/reference/lib/model_zoo/ema.py:4-75`):
warmup-aware decay ``min(decay, (1+n)/(10+n))``, plus store/copy/restore for
eval swaps. Functional: state is a pytree (shadow params + step count), the
update is one fused jit-able tree_map (no name-mangled buffers).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EmaState:
    shadow: Any
    num_updates: jnp.ndarray  # int32 scalar


def ema_init(params, use_num_updates: bool = True) -> EmaState:
    n = jnp.asarray(0 if use_num_updates else -1, jnp.int32)
    return EmaState(jax.tree_util.tree_map(jnp.asarray, params), n)


def ema_update(state: EmaState, params, decay: float = 0.9999) -> EmaState:
    n = state.num_updates
    new_n = jnp.where(n >= 0, n + 1, n)
    d = jnp.where(new_n >= 0,
                  jnp.minimum(decay, (1.0 + new_n) / (10.0 + new_n)),
                  decay)
    one_minus = 1.0 - d
    shadow = jax.tree_util.tree_map(
        lambda s, p: s - one_minus * (s - p), state.shadow, params)
    return EmaState(shadow, new_n)


def ema_params(state: EmaState):
    """The averaged params (use for eval; ref ema_scope vd.py:187-200)."""
    return state.shadow
