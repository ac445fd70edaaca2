"""Full-size training step on the chip (VERDICT r2 task 5).

One REAL 512^2 t2i training step at full model size: the 320-ch image
diffuser's data blocks + the text diffuser's context blocks (the
vd.py:330-381 flow contract), latents 64x64x4, remat on
(use_checkpoint=True), AdamW, loss/grads/update under one jit exactly as
the Trainer's make_train_step computes them.

Memory layout: the TRAINED subtree is the t2i flow's own blocks (image
data+global + text context blocks, 1.13B of 2.57B); the off-flow remainder
(text data blocks, unused by this flow's forward walk) rides as a frozen
jit argument. The full four-flow Adam state cannot fit one 16 GB v5e chip
(f32 mu+nu alone is 20.6 GB) — matching the reference's own practice of
training on 8x40 GB A100s; mu/nu ride in bf16 (common LDM fine-tune
practice). Scale-out is the dp mesh axis (dryrun_multichip).

Sweeps batch size until OOM; reports step time, train images/s, and device
memory stats for PERF.md's memory-headroom table.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_bench.py
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-remat", action="store_true",
                    help="skip per-block nn.remat (smaller compile; at 64x64 "
                         "latents batch<=2 fits without it)")
    ap.add_argument("--remat-max-ch", type=int, default=None,
                    help="selective remat: only blocks <= this channel width "
                         "(640 = the two high-res levels; keeps the remat HLO "
                         "small enough for the remote compile helper)")
    ap.add_argument("--batches", default="1,2,4,8,16")
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/vdtpu-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import optax
    from vdtpu.config.bank import model_cfg_bank
    from vdtpu.models.vd import VDModel

    dtype = jnp.bfloat16
    cfgm = model_cfg_bank()("vd_four_flow_v1-0")
    model = VDModel.from_config(cfgm, dtype=dtype,
                                use_checkpoint=not args.no_remat,
                                remat_max_channels=args.remat_max_ch)

    from _common import fill_params
    params = fill_params(model)
    key = jax.random.PRNGKey(0)
    size = lambda t: sum(int(np.prod(l.shape))
                         for l in jax.tree_util.tree_leaves(t))
    log(f"params {size(params)/1e9:.2f}B")

    # t2i flow split: image tower fully trained; text tower contributes only
    # its context blocks + their norms (walk(ctx_host=text), vd.py flow map)
    trainable = {"image": params["image"],
                 "text": {k: v for k, v in params["text"].items()
                          if k.startswith("context_blocks")}}
    frozen = {"text": {k: v for k, v in params["text"].items()
                       if not k.startswith("context_blocks")}}
    log(f"trainable {size(trainable)/1e9:.2f}B, frozen {size(frozen)/1e9:.2f}B")

    tx = optax.adamw(1e-5, mu_dtype=jnp.bfloat16)
    opt_state = jax.jit(tx.init)(trainable)
    jax.block_until_ready(opt_state)

    nT = model.schedule.num_timesteps

    # donate the trained tree + opt state: without donation the update holds
    # old+new copies of ~9 GB simultaneously and OOMs a 16 GB chip
    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def step(trainable, frozen, opt_state, x, ctx, rng):
        """make_train_step's math (harness.py:80-115) on the flow split."""
        def loss_fn(tr):
            p = {"image": tr["image"],
                 "text": {**frozen["text"], **tr["text"]}}
            kt, kn = jax.random.split(rng)
            t = jax.random.randint(kt, (x.shape[0],), 0, nT)
            noise = jax.random.normal(kn, x.shape, x.dtype)
            loss, aux = model.p_losses(p, x, t, ctx, "image", "text", noise)
            return loss, aux
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    def mem():
        try:
            s = jax.local_devices()[0].memory_stats()
            return {k: round(s[k] / 2**30, 2) for k in
                    ("bytes_in_use", "peak_bytes_in_use") if k in s}
        except Exception:
            return {}

    results = []
    tr, opt = trainable, opt_state
    for bsz in [int(b) for b in args.batches.split(",")]:
        x = jax.random.normal(jax.random.fold_in(key, 10 + bsz),
                              (bsz, 64, 64, 4), dtype)
        ctx = jax.random.normal(jax.random.fold_in(key, 20 + bsz),
                                (bsz, 77, 768), dtype) * 0.5
        rng = jax.random.PRNGKey(bsz)
        try:
            t0 = time.perf_counter()
            tr, opt, loss = step(tr, frozen, opt, x, ctx, rng)
            np.asarray(loss)
            compile_s = time.perf_counter() - t0
            times = []
            for i in range(3):
                t0 = time.perf_counter()
                tr, opt, loss = step(tr, frozen, opt, x, ctx,
                                     jax.random.fold_in(rng, i))
                jax.block_until_ready(loss)
                np.asarray(loss)
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2]
            row = {"batch": bsz, "step_s": round(med, 3),
                   "images_per_sec": round(bsz / med, 3),
                   "compile_s": round(compile_s, 1),
                   "loss": float(np.asarray(loss, np.float32)),
                   "mem_gb": mem()}
            log(str(row))
            results.append(row)
        except Exception as e:  # the OOM boundary is a result, not a failure
            log(f"batch {bsz}: {type(e).__name__}: {str(e)[:300]}")
            results.append({"batch": bsz, "error": type(e).__name__})
            break

    print(json.dumps({
        "trainable_b": round(size(trainable) / 1e9, 3),
        "frozen_b": round(size(frozen) / 1e9, 3),
        "remat": not args.no_remat, "remat_max_ch": args.remat_max_ch,
        "optimizer": "adamw(mu,nu=bf16)",
        "points": results}), flush=True)


if __name__ == "__main__":
    main()
