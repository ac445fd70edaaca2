"""Numerical guards.

The reference's only guard is an assert on the lvlb weights at construction
(`vd.py:185`); per SURVEY.md section 5 the TPU-native plan is jax.checkify /
jax.debug based NaN detection that works inside jit.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def assert_all_finite(tree, name: str = "tree"):
    """Host-side check (outside jit): raise on NaN/Inf anywhere in a pytree."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append("/".join(str(getattr(k, "key", k)) for k in path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}")


def checked(fn: Callable, *check_args) -> Callable:
    """Wrap a jittable fn with checkify float/NaN error tracking.

    Returns a function with the same signature that raises on NaN/Inf
    produced anywhere inside (including under scan), after the fact.
    """
    cfn = checkify.checkify(fn, errors=checkify.float_checks)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def debug_nan_hook(x, name: str = "tensor"):
    """In-graph print when a tensor goes non-finite (works under jit)."""
    bad = jnp.logical_not(jnp.isfinite(x)).sum()
    jax.lax.cond(
        bad > 0,
        lambda: jax.debug.print("NaN/Inf in {n}: {c} elements", n=name, c=bad),
        lambda: None)
    return x
