"""Sustained full-size training on the chip (VERDICT r4 task 5).

Drives the REAL CLI (`python -m vdtpu.training.launch`) on the full
2.57B-param `vd_four_flow_v1-0` at 512^2 / batch 16 with selective remat:

  1. a fresh run with an over-budget iteration count, log cadence 5 and an
     async orbax save every `--ckpt-every` steps,
  2. SIGKILL the process once train.log shows `--kill-at` completed steps
     (a mid-run hard failure, not a graceful exit),
  3. resume from the run dir (`--resume_dir`, restoring params+opt+step
     from the latest cadence save) and continue to `--final-iters`.

Memory levers that make the four-flow system trainable on ONE 16 GB chip
(the reference trains on 8x40 GB A100s, README_deprecated.md): the t2i
flow split rides `train.freeze` (off-flow text data/global groups hold no
Adam moments and their backward is stop-gradient'ed — optim.get_optimizer
/ harness.make_loss_fn), moments in bf16 (`optimizer_args.mu_dtype`),
donated step buffers (`train.donate`), no Optimus towers resident
(`with_text_vae: false`), selective remat (`remat_max_channels 640`).

Reports per-log-window step times, the loss trace, and the resume
continuity parsed from both train.log passes.

Run: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site \
       python scripts/train_sustained.py
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import signal
import subprocess
import sys
import time

import yaml


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def parse_train_log(path):
    """[(step, lr, loss, cum_time_s)] from Trainer's log lines."""
    rows = []
    pat = re.compile(r"Iter (\d+) \| LR ([0-9.e+-]+) \| .*?"
                     r"Loss:([0-9.e+-]+|nan).*\| Time ([0-9.]+)s")
    for line in open(path):
        m = pat.search(line)
        if m:
            rows.append((int(m.group(1)), float(m.group(2)),
                         float(m.group(3)), float(m.group(4))))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/train_sustained")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--gradacc", type=int, default=1)
    ap.add_argument("--kill-at", type=int, default=50,
                    help="SIGKILL the run after this many logged steps")
    ap.add_argument("--ckpt-every", type=int, default=30)
    ap.add_argument("--final-iters", type=int, default=60,
                    help="budget for the resumed run (>= kill-at + 10)")
    ap.add_argument("--log-every", type=int, default=5)
    ap.add_argument("--remat-max-ch", type=int, default=640)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--timeout", type=float, default=7200)
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    shard_dir = os.path.join(args.workdir, "shards")
    os.makedirs(shard_dir, exist_ok=True)
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from _tiny import make_shard, write_tiny_clip_vocab
    if not glob.glob(os.path.join(shard_dir, "*.tar")):
        for s in range(4):
            make_shard(os.path.join(shard_dir, f"shard-{s:04d}.tar"), 48,
                       offset=s * 100)
    vocab = os.path.join(args.workdir, "vocab.json")
    merges = os.path.join(args.workdir, "merges.txt")
    write_tiny_clip_vocab(vocab, merges)

    ecfg = {
        "name": "sustained512",
        "model": "vd_four_flow_v1-0",
        "bf16": True,
        "pretrained": None,
        "with_text_vae": False,
        "clip_vocab": vocab, "clip_merges": merges, "clip_max_length": 77,
        # encode_chunk 4: the ingest VAE-encode peak at batch 16 512^2
        # OOMs a 16 GB chip on top of the resident params+Adam state
        # (measured this round); chunked ingest bounds it (launch.py)
        "data": {"shards": shard_dir, "batch_size": args.batch,
                 "image_size": 512, "shuffle_buffer": 16,
                 "encode_chunk": 4,
                 # latent-cache ingest (launch.cached_latent_batches): all
                 # 192 samples (12 batches) encode BEFORE the optimizer
                 # state exists, then the VAE/CLIP towers are freed — the
                 # streaming path's encode-vs-resident-state collision
                 # OOMed this run even chunked (PERF.md round 5)
                 "cache_latents": 192 // args.batch},
        "train": {
            "x_type": "image", "c_type": "text",
            # bf16 master weights: f32 flax-init params (10.3 GB) + Adam
            # state cannot share one 16 GB chip (train_bench methodology)
            "params_dtype": "bfloat16",
            "num_iters": 100000,           # over-budget: the kill ends it
            "batch_size": args.batch, "gradacc_every": args.gradacc,
            "tp": 1,
            "optimizer": "adamw",
            "optimizer_args": {"weight_decay": 0.01,
                               "mu_dtype": "bfloat16"},
            "scheduler": {"type": "constant", "lr": args.lr},
            "ema_decay": None,             # memory: no full-tree shadow
            "log_every": args.log_every,
            "ckpt_every": args.ckpt_every,
            "async_ckpt": True,
            "use_checkpoint": True,
            "remat_max_channels": args.remat_max_ch,
            # t2i flow split (train_bench.py / PERF.md): the text tower
            # contributes only its context blocks to the t2i walk
            "freeze": ["diffuser_text_data", "diffuser_text_global",
                       "diffuser_text_other"],
            "donate": True,
        },
    }
    cfg_path = os.path.join(args.workdir, "exp.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(ecfg, f)

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vdtpu-jax-cache")

    # ---- phase 1: fresh run, killed mid-flight after kill_at steps ----
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        [sys.executable, "-m", "vdtpu.training.launch",
         "--config", cfg_path, "--seed", "0"],
        cwd=args.workdir, env=env,
        stdout=open(os.path.join(args.workdir, "phase1.out"), "w"),
        stderr=subprocess.STDOUT)
    run_dir = None
    killed_at = None
    deadline = time.monotonic() + args.timeout
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            raise SystemExit(f"phase-1 run exited early rc={proc.returncode} "
                             f"(see {args.workdir}/phase1.out)")
        runs = glob.glob(os.path.join(args.workdir, "log/sustained512/*"))
        tl = os.path.join(runs[0], "train.log") if runs else None
        if run_dir is None and runs:
            run_dir = runs[0]
            log(f"run dir {run_dir}")
        if tl and os.path.exists(tl):
            rows = parse_train_log(tl)
            if rows and rows[-1][0] >= args.kill_at:
                killed_at = rows[-1][0]
                # hard kill: SIGKILL, no cleanup — the crash-recovery case
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                break
        time.sleep(10)
    if killed_at is None:
        proc.kill()
        raise SystemExit("phase-1 never reached kill-at within --timeout")
    phase1_s = time.perf_counter() - t0
    rows1 = parse_train_log(os.path.join(run_dir, "train.log"))
    log(f"phase 1: {killed_at} steps, SIGKILLed, {phase1_s:.0f}s wall")

    # the cadence save the resume restores from (async orbax, committed)
    saves = sorted(os.path.basename(p) for p in
                   glob.glob(os.path.join(run_dir, "weight", "iter_*")))
    log(f"checkpoints on disk at kill time: {saves}")

    # ---- phase 2: restore-and-continue from the run dir ----
    run_cfg = os.path.join(run_dir, "config.yaml")
    with open(run_cfg) as f:
        cfg2 = yaml.safe_load(f)
    cfg2["train"]["num_iters"] = args.final_iters
    with open(run_cfg, "w") as f:
        yaml.safe_dump(cfg2, f)
    t0 = time.perf_counter()
    rc = subprocess.run(
        [sys.executable, "-m", "vdtpu.training.launch",
         "--config", cfg_path, "--resume_dir", run_dir],
        cwd=args.workdir, env=env,
        stdout=open(os.path.join(args.workdir, "phase2.out"), "w"),
        stderr=subprocess.STDOUT, timeout=args.timeout).returncode
    phase2_s = time.perf_counter() - t0
    if rc != 0:
        raise SystemExit(f"phase-2 resume failed rc={rc} "
                         f"(see {args.workdir}/phase2.out)")
    rows2 = parse_train_log(os.path.join(run_dir, "train.log"))
    new_rows = rows2[len(rows1):]

    # per-window step time: delta of the cumulative Time column
    def windows(rows):
        out = []
        for (s0, _, _, t0_), (s1, _, l, t1_) in zip(rows, rows[1:]):
            if s1 > s0 and t1_ > t0_:  # same pass (cum time resets on resume)
                out.append({"steps": f"{s0 + 1}-{s1}",
                            "step_s": round((t1_ - t0_) / (s1 - s0), 3),
                            "loss": round(l, 4)})
        return out

    resumed_from = max((int(s.split("_")[1]) for s in saves), default=0)
    result = {
        "batch": args.batch, "image_size": 512,
        "phase1_steps": killed_at, "phase1_wall_s": round(phase1_s, 1),
        "phase1_windows": windows(rows1),
        "loss_trace": [(s, l) for s, _, l, _ in rows1],
        "checkpoints_at_kill": saves,
        "resumed_from_step": resumed_from,
        "phase2_final_step": rows2[-1][0] if rows2 else None,
        "phase2_windows": windows(new_rows),
        "phase2_wall_s": round(phase2_s, 1),
        "resume_continued": bool(new_rows
                                 and rows2[-1][0] >= args.final_iters),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
