"""Activation/unit registry + parameter utilities.

Capability parity with `/root/reference/lib/model_zoo/common/utils.py`
(`get_unit` :41-88, freeze/param counters :95-290): string-named activation
lookup used by configurable layers (``relu``, ``lrelu0.2``, ``silu``,
``gelu``, ``sine``, identity/none), and pytree parameter accounting. The
spatial/Fourier encodings of the legacy zoo are not carried (nothing in the
v2 model family references them).
"""
from __future__ import annotations

import re
from typing import Callable

import jax
import jax.numpy as jnp


def get_unit(name: str | None) -> Callable:
    """String -> activation fn; parameterized forms like 'lrelu0.2'."""
    if name is None or name in ("none", "identity"):
        return lambda x: x
    if name == "relu":
        return jax.nn.relu
    if name == "silu" or name == "swish":
        return jax.nn.silu
    if name == "gelu":
        return jax.nn.gelu
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "tanh":
        return jnp.tanh
    if name == "sine":
        return jnp.sin
    m = re.fullmatch(r"lrelu([\d.]+)", name)
    if m:
        slope = float(m.group(1))
        return lambda x: jax.nn.leaky_relu(x, slope)
    m = re.fullmatch(r"elu([\d.]*)", name)
    if m:
        alpha = float(m.group(1)) if m.group(1) else 1.0
        return lambda x: jax.nn.elu(x, alpha)
    raise KeyError(f"unknown unit {name!r}")


def get_total_param(params) -> int:
    """Total parameter count of a pytree (ref get_total_param)."""
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))


def get_total_param_sum(params) -> float:
    """Sum of all parameter values — the reference's cheap weight fingerprint
    used to verify checkpoint loads (ref get_total_param_sum)."""
    return float(sum(jnp.sum(p.astype(jnp.float32))
                     for p in jax.tree_util.tree_leaves(params)))
