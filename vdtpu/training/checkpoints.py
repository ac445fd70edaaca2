"""Checkpoint save/restore via orbax.

Capability parity with the reference checkpoint cadence
(`/root/reference/lib/utils.py:315-359`: `_init/_best/_last` + `iter_N`
tags) while fixing its documented gap — the reference persists only net
weights; here params + optimizer state + EMA + step all round-trip
(SURVEY.md section 5, checkpoint row). Async-capable through orbax.
"""
from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def _ckptr():
    return ocp.PyTreeCheckpointer()


_ASYNC: ocp.AsyncCheckpointer | None = None


def _async_ckptr() -> ocp.AsyncCheckpointer:
    # one long-lived instance: orbax serializes overlapping saves on it
    # (a new save first joins the previous commit thread), so cadence saves
    # can never interleave half-written directories
    global _ASYNC
    if _ASYNC is None:
        _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC


def wait_for_saves() -> None:
    """Block until every in-flight async save has committed to disk."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def save_checkpoint(ckpt_dir: str, tag: str, state, *, block: bool = True) -> str:
    """state: vdtpu.training.harness.TrainState (or any pytree-like).

    block=False hands the disk write to orbax's async commit thread: the
    device->host snapshot happens before save() returns (so the training
    step may immediately overwrite the arrays), and only the serialization
    + write overlap with subsequent steps. Call :func:`wait_for_saves`
    (the Trainer does, on exit) before trusting the file exists.
    """
    if block:
        # serialize with any in-flight async save: a sync writer (fresh
        # PyTreeCheckpointer) does not join the async commit thread, so
        # mixing modes on one dir could race two writers on the same tag
        wait_for_saves()
    path = os.path.join(os.path.abspath(ckpt_dir), tag)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "ema": None if state.ema is None else
            {"shadow": state.ema.shadow, "num_updates": state.ema.num_updates},
        "step": state.step,
    }
    (_ckptr() if block else _async_ckptr()).save(path, payload, force=True)
    return path


def restore_checkpoint(ckpt_dir: str, tag: str, template=None) -> dict[str, Any]:
    wait_for_saves()  # an in-flight async save of this tag must land first
    path = os.path.join(os.path.abspath(ckpt_dir), tag)
    return _ckptr().restore(path, item=template)


def latest_tag(ckpt_dir: str) -> str:
    """Most recent checkpoint tag in a run dir: prefer ``last``, else the
    highest ``iter_N``, else ``best`` (ref filename scheme utils.py:315-359)."""
    wait_for_saves()  # tag discovery must see all committed async saves
    tags = [d for d in os.listdir(ckpt_dir)
            if os.path.isdir(os.path.join(ckpt_dir, d))]
    if "last" in tags:
        return "last"
    iters = sorted((int(t.split("_", 1)[1]), t) for t in tags
                   if t.startswith("iter_") and t.split("_", 1)[1].isdigit())
    if iters:
        return iters[-1][1]
    if "best" in tags:
        return "best"
    raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
