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
    # mu_dtype: moment dtype ("bfloat16" halves Adam's mu on big models —
    # the single-chip full-size memory budget, PERF.md train_bench)
    mu = kw.get("mu_dtype")
    mu = getattr(jax.numpy, mu) if isinstance(mu, str) else mu

    def make(lr):
        if name == "sgd":
            return optax.sgd(lr, momentum=kw.get("momentum", 0.0),
                             nesterov=kw.get("nesterov", False))
        if name == "adam":
            return optax.adam(lr, b1=kw.get("b1", 0.9), b2=kw.get("b2", 0.999),
                              mu_dtype=mu)
        if name == "adamw":
            return optax.adamw(lr, b1=kw.get("b1", 0.9), b2=kw.get("b2", 0.999),
                               weight_decay=kw.get("weight_decay", 1e-2),
                               mu_dtype=mu)
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
    freeze: tuple[str, ...] | list[str] | None = None,
    **kw,
) -> tuple[optax.GradientTransformation, Callable[[Any, float], Any]]:
    """Build the (possibly grouped) optimizer.

    Returns (tx, set_lr) where set_lr(opt_state, lr) pushes the scheduler's
    LR into every group's injected hyperparams.

    ``freeze`` names parameter groups (parameter_group_of labels, e.g.
    "diffuser_text_data") whose params never update: they ride
    optax.set_to_zero — which holds NO optimizer state for them, so Adam's
    mu/nu exist only for the trained subtree. This is the single-chip
    memory lever for full-size flow-scoped training (the four-flow model's
    full f32 Adam state alone exceeds one 16 GB chip; the reference trains
    on 8x40 GB A100s). Pair with Trainer(freeze_groups=...) so the
    backward pass also skips the frozen subtree's gradients.
    """
    pg_lrscale = dict(pg_lrscale or {})
    freeze = tuple(freeze or ())
    if not pg_lrscale and not freeze:
        tx = _tx(type, 1.0, **kw)

        def set_lr(opt_state, lr):
            opt_state.hyperparams["learning_rate"] = lr
            return opt_state
        return tx, set_lr

    def label_of(p, _):
        g = parameter_group_of(p)
        if g in freeze:
            return "frozen"
        return g if g in pg_lrscale else "default"

    labels = traverse_util.path_aware_map(label_of, params)
    txs = {g: _tx(type, s, **kw) for g, s in pg_lrscale.items()}
    txs["default"] = _tx(type, 1.0, **kw)
    if freeze:
        txs["frozen"] = optax.set_to_zero()
    tx = optax.multi_transform(txs, labels)

    def set_lr(opt_state, lr):
        for name, st in opt_state.inner_states.items():
            if name == "frozen":
                continue  # set_to_zero has no hyperparams
            st.inner_state.hyperparams["learning_rate"] = lr
        return opt_state
    return tx, set_lr
