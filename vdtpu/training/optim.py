"""Optimizer factory with parameter groups.

Capability parity with `/root/reference/lib/model_zoo/common/get_optimizer.py`
(sgd/adam/adamw registry honoring the model's ``parameter_group`` dict) —
built on optax: groups are realized with `optax.multi_transform` keyed by the
top-level diffuser/part prefix, and the LR is injected per step through
`optax.inject_hyperparams` (the reference constructs with lr=0 and pushes LR
from the stage loop; same contract here).
"""
from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import optax
from flax import traverse_util


def _tx(name: str, lr_scale: float, **kw) -> optax.GradientTransformation:
    def make(lr):
        if name == "sgd":
            return optax.sgd(lr, momentum=kw.get("momentum", 0.0),
                             nesterov=kw.get("nesterov", False))
        if name == "adam":
            return optax.adam(lr, b1=kw.get("b1", 0.9), b2=kw.get("b2", 0.999))
        if name == "adamw":
            return optax.adamw(lr, b1=kw.get("b1", 0.9), b2=kw.get("b2", 0.999),
                               weight_decay=kw.get("weight_decay", 1e-2))
        raise KeyError(f"unknown optimizer {name!r}")
    return optax.inject_hyperparams(
        lambda learning_rate: make(learning_rate * lr_scale))(learning_rate=0.0)


def parameter_group_of(path: tuple[str, ...]) -> str:
    """VD parameter groups: diffuser_<name>_<part> (ref vd.py:108-112).

    Our diffuser params are {<name>: {time_embed|data_blocks.*|context_blocks.*: ...}}.
    With trainable context encoders the tree is {"diffuser": ..., "ctx": ...}
    (harness.make_loss_fn ctx_encode_fn path) — ctx params group as ctx_<name>.
    """
    if path[0] == "ctx":
        return f"ctx_{path[1] if len(path) > 1 else 'all'}"
    if path[0] == "diffuser" and len(path) > 1:
        path = path[1:]
    name = path[0]
    head = path[1] if len(path) > 1 else ""
    if head.startswith("time_embed"):
        part = "global"
    elif head.startswith("data_blocks"):
        part = "data"
    elif head.startswith("context_blocks"):
        part = "context"
    else:
        part = "other"
    return f"diffuser_{name}_{part}"


def get_optimizer(
    type: str = "adamw",
    params: Any = None,
    pg_lrscale: Mapping[str, float] | None = None,
    **kw,
) -> tuple[optax.GradientTransformation, Callable[[Any, float], Any]]:
    """Build the (possibly grouped) optimizer.

    Returns (tx, set_lr) where set_lr(opt_state, lr) pushes the scheduler's
    LR into every group's injected hyperparams.
    """
    pg_lrscale = dict(pg_lrscale or {})
    if not pg_lrscale:
        tx = _tx(type, 1.0, **kw)

        def set_lr(opt_state, lr):
            opt_state.hyperparams["learning_rate"] = lr
            return opt_state
        return tx, set_lr

    labels = traverse_util.path_aware_map(
        lambda p, _: parameter_group_of(p) if parameter_group_of(p) in pg_lrscale
        else "default", params)
    txs = {g: _tx(type, s, **kw) for g, s in pg_lrscale.items()}
    txs["default"] = _tx(type, 1.0, **kw)
    tx = optax.multi_transform(txs, labels)

    def set_lr(opt_state, lr):
        for st in opt_state.inner_states.values():
            st.inner_state.hyperparams["learning_rate"] = lr
        return opt_state
    return tx, set_lr
