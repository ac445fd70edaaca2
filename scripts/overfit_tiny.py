"""Prove the training stack LEARNS, not just steps (VERDICT r3 task 5).

Every training test asserts mechanics (steps advance, loss finite, resume
continuity); this drives the REAL CLI path — ``vdtpu.training.launch.main``
with webdataset shards, CLIP tokenizer, Trainer, EMA, checkpoints — on a
tiny four-flow system over a FIXED set of synthetic (image, caption) pairs
and checks optimization end-to-end:

  1. the t2i diffusion loss drops >= 100x from its start,
  2. DDIM samples from the trained EMA params, conditioned on the training
     captions, reconstruct the training latents (latent cosine / decoded
     PSNR vs the pair's own VAE reconstruction).

Ref training contract: /root/reference/lib/utils.py:38-359 (train stage),
vd.py:241-280 (p_losses). Prints one JSON line; numbers go to PERF.md.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=/root/repo:/root/repo/tests python scripts/overfit_tiny.py \
      [--iters 3000] [--pairs 8] [--lr 2e-3] [--workdir /tmp/overfit_tiny]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--ddim-steps", type=int, default=50)
    ap.add_argument("--cfg-scales", default="1.0",
                    help="comma list of CFG scales to sweep (PERF.md "
                         "reports 1/2/4)")
    ap.add_argument("--steps-list", default="",
                    help="comma list of DDIM step counts to sweep "
                         "(default: just --ddim-steps; PERF.md reports "
                         "50,200)")
    ap.add_argument("--no-rolled-control", dest="rolled_control",
                    action="store_false", default=True,
                    help="skip the caption-permutation causation control")
    ap.add_argument("--workdir", default="/tmp/overfit_tiny")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import yaml

    from _tiny import make_shard, write_tiny_clip_vocab

    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(os.path.join(wd, "shards"))
    # ONE shard holding the fixed pairs: with batch_size == pairs every
    # training batch is exactly the full dataset (order-shuffled only)
    make_shard(os.path.join(wd, "shards", "shard-0000.tar"), args.pairs,
               offset=0)
    write_tiny_clip_vocab(os.path.join(wd, "vocab.json"),
                          os.path.join(wd, "merges.txt"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    dp = jax.device_count()
    assert args.pairs % dp == 0, (args.pairs, dp)
    ecfg = {
        "name": "overfit_tiny", "model": "vd_test_tiny", "bf16": False,
        "pretrained": None,
        "clip_vocab": os.path.join(wd, "vocab.json"),
        "clip_merges": os.path.join(wd, "merges.txt"),
        "clip_max_length": 16,
        "data": {"shards": os.path.join(wd, "shards"),
                 "batch_size": args.pairs, "image_size": 64,
                 "shuffle_buffer": args.pairs},
        "train": {"x_type": "image", "c_type": "text",
                  "num_iters": args.iters, "batch_size": args.pairs,
                  "gradacc_every": 1, "tp": 1, "optimizer": "adamw",
                  "optimizer_args": {"weight_decay": 0.0},
                  "scheduler": {"type": "constant", "lr": args.lr},
                  # log_every=1: the >=100x loss-drop claim is measured from
                  # the FIRST step's loss, not from a post-warmup snapshot
                  "ema_decay": 0.999, "log_every": 1,
                  "ckpt_every": args.iters},
    }
    cfg_path = os.path.join(wd, "exp.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(ecfg, f)

    os.chdir(wd)  # Experiment's log tree goes under cwd/log
    from vdtpu.training.launch import main as launch_main
    t0 = time.perf_counter()
    launch_main(["--config", cfg_path, "--seed", str(args.seed)])
    train_s = time.perf_counter() - t0
    run_dir = glob.glob("log/overfit_tiny/*")[0]

    log_text = open(os.path.join(run_dir, "train.log")).read()
    losses = [(int(m.group(1)), float(m.group(2))) for m in
              re.finditer(r"Iter (\d+) \|.*?loss[^0-9-]*([0-9.eE+-]+)",
                          log_text)]
    assert losses, "no loss lines parsed from train.log"
    first_loss = losses[0][1]
    # median of the last 10 logged losses (per-step noise is real: t and
    # eps are resampled every step even on a memorized dataset)
    tail = sorted(v for _, v in losses[-10:])
    final_loss = tail[len(tail) // 2]
    drop = first_loss / max(final_loss, 1e-12)
    print(f"loss {first_loss:.4f} -> {final_loss:.6f}  ({drop:.1f}x)",
          file=sys.stderr, flush=True)

    # ---- sample from the trained EMA weights and reconstruct the pairs ----
    from vdtpu.data.webdataset import ImageTextPipeline, ShardIndex
    from vdtpu.serving.api import VDSystem
    from vdtpu.training.launch import build_tokenizer

    system = VDSystem("vd_test_tiny")
    system.init_random(args.seed)
    tag = system.load_vdtpu_checkpoint(os.path.join(run_dir, "weight"),
                                       use_ema=True)
    print(f"loaded '{tag}' from {run_dir}", file=sys.stderr, flush=True)
    tokenizer = build_tokenizer(ecfg)

    index = ShardIndex.from_dir(os.path.join(wd, "shards"), seed=0)
    batch = next(iter(ImageTextPipeline(index, batch_size=args.pairs,
                                        image_size=64,
                                        shuffle_buffer=args.pairs)))
    x0 = system.vae_encode(batch["image"], "image")       # training latents
    ctx = system.ctx_encode(tokenizer(list(batch["caption"])), "text")

    b = np.asarray(x0, np.float32).reshape(args.pairs, -1)
    bn = b / (np.linalg.norm(b, axis=-1, keepdims=True) + 1e-9)

    def sample_matrix(ctx_in, scale, steps):
        """DDIM from pure noise -> full sample-by-training-latent cosine
        MATRIX [pairs, pairs]: row i = cosines of sample i against EVERY
        training latent. identification = argmax(row) (the 8/8 claim)."""
        x = system.sampler.sample(
            system.params["diffuser"], jax.random.PRNGKey(123), steps,
            x0.shape, {"type": "image"},
            {"type": "text", "conditioning": ctx_in,
             "unconditional_conditioning": jnp.zeros_like(ctx_in),
             "unconditional_guidance_scale": scale},
            dtype=system.dtype)
        a = np.asarray(x, np.float32).reshape(args.pairs, -1)
        an = a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-9)
        return x, an @ bn.T

    # base config (scale 1: the uncond direction was never trained, so
    # CFG > 1 steers off the memorized manifold — quantified by the sweep)
    x, M = sample_matrix(ctx, 1.0, args.ddim_steps)
    cos = np.diag(M)
    identified = int((M.argmax(axis=1) == np.arange(args.pairs)).sum())
    # margin: diagonal minus the best off-diagonal competitor, per row
    off = M - np.eye(args.pairs) * 1e9
    margin = float((cos - off.max(axis=1)).min())
    dec = np.asarray(system.vae_decode(jnp.asarray(x), "image"), np.float32)
    ref = np.asarray(system.vae_decode(jnp.asarray(x0), "image"), np.float32)
    mse = ((dec - ref) ** 2).mean()
    psnr = float(10 * np.log10(1.0 / max(mse, 1e-12)))

    # CFG-scale x step-count sweep (PERF.md "overfit proof": memorization
    # must be robust across sampler operating points)
    sweep = {}
    scales = [float(s) for s in args.cfg_scales.split(",") if s]
    steps_list = [int(s) for s in args.steps_list.split(",") if s] \
        or [args.ddim_steps]
    for sc in scales:
        for st in steps_list:
            if (sc, st) == (1.0, args.ddim_steps):
                sweep[f"cfg{sc}_steps{st}"] = {
                    "diag_cos_mean": round(float(cos.mean()), 4),
                    "identified": identified}
                continue
            _, Ms = sample_matrix(ctx, sc, st)
            sweep[f"cfg{sc}_steps{st}"] = {
                "diag_cos_mean": round(float(np.diag(Ms).mean()), 4),
                "identified": int((Ms.argmax(axis=1)
                                   == np.arange(args.pairs)).sum())}
            print(f"sweep cfg={sc} steps={st}: {sweep[f'cfg{sc}_steps{st}']}",
                  file=sys.stderr, flush=True)

    # caption-permutation causation control: roll the conditioning by one
    # row — every sample must now identify its ROLLED caption's latent,
    # proving the caption (not the noise key or position) drives recall
    rolled_follow = None
    if args.rolled_control:
        ctx_r = jnp.roll(ctx, 1, axis=0)
        _, Mr = sample_matrix(ctx_r, 1.0, args.ddim_steps)
        rolled_follow = int((Mr.argmax(axis=1)
                             == np.roll(np.arange(args.pairs), 1)).sum())
        print(f"rolled-caption control: {rolled_follow}/{args.pairs} follow "
              f"the caption", file=sys.stderr, flush=True)

    print(json.dumps({
        "iters": args.iters, "pairs": args.pairs, "lr": args.lr,
        "first_loss": round(first_loss, 4), "final_loss": round(final_loss, 6),
        "loss_drop_x": round(drop, 1),
        "latent_cos_mean": round(float(cos.mean()), 4),
        "latent_cos_min": round(float(cos.min()), 4),
        "identified_by_argmax": identified,
        "identification_margin_min": round(margin, 4),
        "cos_matrix": np.round(M, 3).tolist(),
        "cfg_steps_sweep": sweep,
        "rolled_caption_follow": rolled_follow,
        "decoded_psnr_db": round(psnr, 2),
        "train_s": round(train_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
