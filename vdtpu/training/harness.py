"""Training harness: jitted SPMD train step + step-typed outer loop.

Capability parity with the reference execution layer
(`/root/reference/lib/utils.py:38-359,409-601`): step-typed loops
(iter/epoch/sample), gradient accumulation, per-step LR pushed from an
indexable scheduler, nested eval with best-checkpoint keep, periodic
checkpointing, and rank-0-style logging — re-designed single-controller:

- one process drives the whole mesh; "per-GPU process + DDP wrap" becomes a
  jit-compiled step with batch sharded over the ``dp`` axis (gradients
  all-reduce inside XLA over ICI),
- the abstract ``self.main`` the reference never shipped is concrete here:
  the VD eps-loss step (vd.py:241-280 contract),
- checkpoints persist params + optimizer state + EMA + step via orbax
  (fixing the reference's optimizer-state gap, SURVEY.md section 5),
- no shared-memory barriers: host sync is multihost_utils when multi-process.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vdtpu.models.vd import VDModel
from vdtpu.parallel.mesh import (
    batch_sharding, make_mesh, param_shardings, replicated)
from vdtpu.training.ema import EmaState, ema_init, ema_update
from vdtpu.utils.logging import MetricAccumulator, print_log


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema: EmaState | None
    step: int = 0


def make_loss_fn(model: VDModel, x_type: str, c_type: str,
                 ctx_encode_fn: Callable | None = None,
                 freeze_groups: tuple[str, ...] = ()):
    """Without ctx_encode_fn, batches carry pre-encoded context (frozen
    encoders, the reference's default). With it, the param tree is
    {"diffuser": ..., "ctx": ...}, the batch's ctx is RAW encoder input
    (token ids / pixels), and gradients flow into the context encoder — the
    ctx_encode_trainable path (ref vd.py:307-311, which drops the
    @torch.no_grad of ctx_encode so encoders fine-tune with the diffuser).

    ``freeze_groups`` (optim.parameter_group_of labels) stop-gradients the
    named subtrees, so the backward pass neither computes nor materializes
    their cotangents — pair with get_optimizer(freeze=...) which holds no
    mu/nu for them. The single-chip memory lever for flow-scoped full-size
    training (PERF.md train_bench; the off-flow tower rides frozen)."""
    if freeze_groups:
        from flax import traverse_util
        from vdtpu.training.optim import parameter_group_of
        fz = tuple(freeze_groups)

        def apply_freeze(params):
            return traverse_util.path_aware_map(
                lambda p, v: jax.lax.stop_gradient(v)
                if parameter_group_of(p) in fz else v, params)
    else:
        apply_freeze = None

    def loss_fn(params, x, ctx, t, noise):
        if apply_freeze is not None:
            params = apply_freeze(params)
        if ctx_encode_fn is not None:
            ctx = ctx_encode_fn(params["ctx"], ctx)
            params = params["diffuser"]
        loss, aux = model.p_losses(params, x, t, ctx, x_type, c_type, noise)
        return loss, aux
    return loss_fn


def make_train_step(
    model: VDModel,
    tx: optax.GradientTransformation,
    x_type: str = "image",
    c_type: str = "text",
    ema_decay: float | None = None,
    grad_accum: int = 1,
    ctx_encode_fn: Callable | None = None,
    freeze_groups: tuple[str, ...] = (),
):
    """One jitted update: draw t + noise, eps-loss, grad, optax update, EMA.

    With grad_accum > 1 the batch is split into microbatches scanned
    sequentially (ref gradacc_every, utils.py:120-126) — gradients average
    before the single optimizer update.
    """
    loss_fn = make_loss_fn(model, x_type, c_type, ctx_encode_fn,
                           freeze_groups)
    nT = model.schedule.num_timesteps

    def microbatch_grads(params, x, ctx, rng):
        kt, kn = jax.random.split(rng)
        t = jax.random.randint(kt, (x.shape[0],), 0, nT)
        noise = jax.random.normal(kn, x.shape, x.dtype)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, ctx, t, noise)
        return grads, loss, aux

    def step(state_params, opt_state, ema, x, ctx, rng, lr):
        # `lr` itself is consumed via the injected hyperparams in opt_state
        # (set_lr); it rides along so the jitted signature is stable
        del lr
        if grad_accum == 1:
            grads, loss, aux = microbatch_grads(state_params, x, ctx, rng)
        else:
            xs = x.reshape(grad_accum, -1, *x.shape[1:])
            cs = ctx.reshape(grad_accum, -1, *ctx.shape[1:])
            rngs = jax.random.split(rng, grad_accum)

            def body(carry, inp):
                xi, ci, ri = inp
                g, l, a = microbatch_grads(state_params, xi, ci, ri)
                acc_g, acc_l = carry
                acc_g = jax.tree_util.tree_map(jnp.add, acc_g, g)
                return (acc_g, acc_l + l), a

            zero = jax.tree_util.tree_map(jnp.zeros_like, state_params)
            (gsum, lsum), auxs = jax.lax.scan(body, (zero, 0.0), (xs, cs, rngs))
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gsum)
            loss = lsum / grad_accum
            aux = jax.tree_util.tree_map(lambda a: a.mean(), auxs)
        updates, opt_state = tx.update(grads, opt_state, state_params)
        params = optax.apply_updates(state_params, updates)
        if ema_decay is not None:
            ema = ema_update(ema, params, ema_decay)
        return params, opt_state, ema, loss, aux

    return step


class Trainer:
    """The step-typed outer loop (ref train_stage, utils.py:61-307)."""

    def __init__(
        self,
        model: VDModel,
        params,
        tx: optax.GradientTransformation,
        set_lr: Callable,
        scheduler=None,
        x_type: str = "image",
        c_type: str = "text",
        ema_decay: float | None = None,
        grad_accum: int = 1,
        mesh=None,
        log_every: int = 100,
        ckpt_every: int | None = None,
        ckpt_dir: str | None = None,
        eval_fn: Callable | None = None,
        eval_every: int | None = None,
        ctx_encode_fn: Callable | None = None,
        async_ckpt: bool = False,
        freeze_groups: tuple[str, ...] = (),
        donate: bool = False,
    ):
        self.model = model
        self.tx = tx
        self.set_lr = set_lr
        self.scheduler = scheduler
        self.grad_accum = grad_accum
        self.mesh = mesh
        self.log_every = log_every
        self.ckpt_every = ckpt_every
        self.ckpt_dir = ckpt_dir
        self.eval_fn = eval_fn
        self.eval_every = eval_every
        self.async_ckpt = async_ckpt
        self.best_metric = None
        self._loss_dev = None  # device scalar; float'd lazily (last_loss)

        raw_step = make_train_step(model, tx, x_type, c_type, ema_decay,
                                   grad_accum, ctx_encode_fn,
                                   tuple(freeze_groups))
        # donate=True donates params/opt_state/ema into the step: without
        # donation the update holds the OLD and NEW copies of the full
        # training state simultaneously (~2x for the moment tree), which
        # OOMs full-size single-chip runs (PERF.md train_bench). Opt-in
        # (train.donate in the launch yaml) because it invalidates the
        # CALLER's references to the initial params/EMA after step 1 (run()
        # itself rebinds self.state from the step outputs, and the async
        # checkpointer snapshots device->host before the next step runs).
        donate_kw = {"donate_argnums": (0, 1, 2)} if donate else {}
        if mesh is not None:
            # tp-aware layout: params live under param_shardings (output-feature
            # sharding over the tp axis, mesh.py:_param_spec); opt_state and
            # EMA are *created under jit from the sharded params* so their
            # param-shaped leaves (adam mu/nu, shadow) inherit the same layout
            # instead of being forced back to replicated (round-1 bug: the
            # step was jitted with params in_shardings=replicated, silently
            # un-sharding tp>1 training).
            psh = param_shardings(mesh, params)
            params = jax.device_put(params, psh)
            opt_state = jax.jit(tx.init)(params)
            ema = jax.jit(ema_init)(params) if ema_decay is not None else None
            bs = batch_sharding(mesh)
            rep = replicated(mesh)
            self._step = jax.jit(
                raw_step,
                in_shardings=(psh, None, None, bs, bs, rep, rep),
                out_shardings=(psh, None, None, rep, rep),
                **donate_kw)
            self._psh = psh
        else:
            opt_state = tx.init(params)
            # under donation the shadow needs its OWN buffers: eager
            # ema_init aliases params (tree_map(asarray) is a no-op on
            # device arrays) and double-donating one buffer is undefined
            mk_ema = jax.jit(ema_init) if donate else ema_init
            ema = mk_ema(params) if ema_decay is not None else None
            self._step = jax.jit(raw_step, **donate_kw)
            self._psh = None
        self.state = TrainState(params, opt_state, ema, 0)

    def run(self, batches: Iterable[Mapping[str, Any]], num_iters: int = None,
            rng=None, unit: str = "iter", num_units: int | None = None,
            batches_per_epoch: int | None = None, batch_size: int | None = None):
        """batches yield {'x': latents, 'ctx': context}.

        Step typing mirrors the reference stages (utils.py:68-77):
        unit='iter'   -> run num_iters (or num_units) optimizer steps,
        unit='epoch'  -> num_units * batches_per_epoch steps,
        unit='sample' -> ceil(num_units / batch_size) steps.
        """
        if unit == "iter":
            num_iters = num_iters if num_iters is not None else num_units
        elif unit == "epoch":
            if batches_per_epoch is None:
                raise ValueError("epoch unit needs batches_per_epoch")
            num_iters = num_units * batches_per_epoch
        elif unit == "sample":
            if batch_size is None:
                raise ValueError("sample unit needs batch_size")
            num_iters = -(-num_units // batch_size)
        else:
            raise ValueError(f"unknown step unit {unit!r}")
        rng = jax.random.PRNGKey(0) if rng is None else rng
        logm = MetricAccumulator()
        pending: list = []  # (device aux, weight) awaiting the log window

        def drain_metrics():
            for a, w in pending:
                logm.accumulate({k: float(v) for k, v in a.items()}, weight=w)
            pending.clear()
        t0 = time.time()
        it = iter(batches)
        while self.state.step < num_iters:
            batch = next(it)
            lr = self.scheduler[self.state.step // self.grad_accum] \
                if self.scheduler is not None else 1e-4
            self.state.opt_state = self.set_lr(self.state.opt_state, lr)
            # step-indexed (not sequentially split) so a restored run draws
            # the same t/noise at step k as the uninterrupted run would
            sub = jax.random.fold_in(rng, self.state.step)
            params, opt, ema, loss, aux = self._step(
                self.state.params, self.state.opt_state, self.state.ema,
                jnp.asarray(batch["x"]), jnp.asarray(batch["ctx"]), sub,
                jnp.asarray(lr, jnp.float32))
            self.state = TrainState(params, opt, ema, self.state.step + 1)
            # keep loss/aux as device scalars: a float() here would block on
            # the step EVERY iteration, serializing dispatch (one tunnel RTT
            # per step); metrics materialize once per log window instead
            self._loss_dev = loss
            pending.append((aux, batch["x"].shape[0]))
            if len(pending) >= 256:
                drain_metrics()  # bound held device refs; entries this old
                # are long computed, so the float()s return immediately
            if self.state.step % self.log_every == 0:
                drain_metrics()
                msg = logm.summary()
                print_log(f"Iter {self.state.step} | LR {lr:.3e} | {msg} "
                          f"| Time {time.time() - t0:.1f}s")
                logm.reset()
            if self.eval_fn is not None and self.eval_every and \
                    self.state.step % self.eval_every == 0:
                metric = self.eval_fn(self.state)
                if self.best_metric is None or metric < self.best_metric:
                    self.best_metric = metric
                    self._save("best")
            if self.ckpt_every and self.state.step % self.ckpt_every == 0:
                self._save(f"iter_{self.state.step}")
        self._save("last")
        if self.async_ckpt:
            from vdtpu.training.checkpoints import wait_for_saves
            wait_for_saves()  # commit 'last' (and any cadence saves) to disk
        return self.state

    @property
    def last_loss(self):
        """Most recent step's scalar loss (blocks on the device value)."""
        return None if self._loss_dev is None else float(self._loss_dev)

    def _save(self, tag: str):
        if not self.ckpt_dir:
            return
        from vdtpu.training.checkpoints import save_checkpoint
        # async: the device->host snapshot is taken synchronously, the disk
        # write overlaps the following train steps (orbax commit thread) —
        # cadence saves stop stalling the step loop
        save_checkpoint(self.ckpt_dir, tag, self.state,
                        block=not self.async_ckpt)

    def restore(self, ckpt_dir: str | None = None, tag: str | None = None):
        """Resume from a saved checkpoint: params + opt_state + EMA + step
        (ref --resume_step/--resume_weight re-entry, lib/utils.py:79-85 —
        fixed here to actually restore optimizer state and the counter).
        """
        from vdtpu.training.checkpoints import latest_tag, restore_checkpoint
        ckpt_dir = ckpt_dir or self.ckpt_dir
        if tag is None:
            tag = latest_tag(ckpt_dir)
        template = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "ema": None if self.state.ema is None else
                {"shadow": self.state.ema.shadow,
                 "num_updates": self.state.ema.num_updates},
            "step": self.state.step,
        }
        payload = restore_checkpoint(ckpt_dir, tag, template)
        params = payload["params"]
        opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(self.state.opt_state),
            jax.tree_util.tree_leaves(payload["opt_state"]))
        ema = None
        if payload.get("ema") is not None and self.state.ema is not None:
            ema = EmaState(payload["ema"]["shadow"],
                           jnp.asarray(payload["ema"]["num_updates"], jnp.int32))
        if self._psh is not None:
            params = jax.device_put(params, self._psh)
        self.state = TrainState(params, opt_state, ema, int(payload["step"]))
        return self.state
