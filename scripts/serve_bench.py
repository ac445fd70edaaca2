"""Production-serving load test: BatchingQueue on the full-size system.

Drives the REAL serving stack end-to-end on the chip — VDSystem +
enable_int8 (the headline policy) + VDInference + BatchingQueue — under
Poisson request arrivals, and reports per-arrival-rate throughput and
p50/p95 request latency. This is the serving story the reference's
Gradio app (app.py:244-298, one request at a time) has no counterpart
for: concurrent requests coalesce into padded CFG-batched sampler calls
(buckets), with deadline_ms bounding the coalescing wait.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_bench.py \
        [--rates 0.5,1.0,1.5] [--seconds 60] [--buckets 2,8] [--steps 50]
Prints one JSON line per rate.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import sys
import threading
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_tokenizer(vocab: int, max_length: int):
    """Deterministic stand-in tokenizer (no vocab files in this
    environment): stable per-text pseudo-ids, eot-padded like CLIP.
    Geometry comes from the system's own text tower — out-of-range ids
    NaN-fill tiny towers through jnp.take (scripts/_common lesson)."""
    import numpy as np

    def tok(texts):
        out = np.full((len(texts), max_length), vocab - 1, np.int64)
        for i, t in enumerate(texts):
            seed = int.from_bytes(hashlib.sha1(t.encode()).digest()[:4], "big")
            rs = np.random.RandomState(seed)
            n = 1 + (seed % (max_length - 2))
            out[i, 0] = vocab - 2
            out[i, 1:1 + n] = rs.randint(0, max(vocab - 2, 1), size=n)
        return out
    return tok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", default="0.5,1.0,1.5",
                    help="Poisson arrival rates (requests/s) to sweep")
    ap.add_argument("--seconds", type=float, default=60.0,
                    help="load duration per rate")
    ap.add_argument("--buckets", default="2,8")
    ap.add_argument("--deadline-ms", type=float, default=1000.0)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--policy", default="int8", choices=["int8", "none"])
    ap.add_argument("--tome", type=float, default=0.0,
                    help="compose token merging at this ratio on top of the "
                         "policy (0.75 = the default serving policy)")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--config", default="vd_four_flow_v1-0")
    ap.add_argument("--latent-downsample", type=int, default=8)
    ap.add_argument("--image-latent-dim", type=int, default=4)
    ap.add_argument("--text-latent-dim", type=int, default=768)
    ap.add_argument("--flows", default="t2i", choices=["t2i", "mixed", "all"],
                    help="mixed: Poisson mix of t2i (60%%), i2i fid .5 "
                         "(20%%) and dcg (20%%) requests — every group "
                         "batches through its own bucket family "
                         "(serving/queue.py groups). all: every one of the "
                         "SEVEN flows rides the mix (t2i 40%%, then 10%% "
                         "each of i2i/dcg/t2t/i2t/tcg/mcg) — this is the "
                         "only config that exercises the Optimus GPT-2 "
                         "decode (t2t/i2t) under concurrent load "
                         "(VERDICT r4 task 4)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/vdtpu-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np
    from vdtpu.serving.api import VDInference, VDSystem
    from vdtpu.serving.queue import BatchingQueue

    dtype = jnp.bfloat16
    t0 = time.perf_counter()
    # text flows (t2t/i2t) need the Optimus text VAE; its GPT-2 decode
    # detokenizes to id-strings when no vocab files are configured (the
    # latency shape — the scan — is what the load test measures)
    sysm = VDSystem(args.config, dtype=dtype,
                    with_text_vae=(args.flows == "all"))

    # fast param fill (bench.py methodology: eval_shape + per-leaf fill —
    # full flax init compiles for minutes through the tunnel; serving
    # timing is weight-value independent)
    def fill(shapes, key):
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        return treedef.unflatten([
            jax.random.normal(jax.random.fold_in(key, i), l.shape, dtype) * 0.02
            for i, l in enumerate(leaves)])

    key = jax.random.PRNGKey(0)
    sysm.params["diffuser"] = fill(
        jax.eval_shape(lambda k: sysm.model.init_params(k, jit=False),
                       key), key)
    sysm.params["vae"]["image"] = fill(jax.eval_shape(
        lambda k: sysm.vae["image"].init(k, jnp.zeros((1, 64, 64, 3)))["params"],
        key), jax.random.fold_in(key, 1))
    sysm.params["ctx"]["text"] = fill(jax.eval_shape(
        lambda k: sysm.ctx["text"].init(
            k, jnp.zeros((1, sysm.ctx["text"].max_len), jnp.int32))["params"],
        key), jax.random.fold_in(key, 2))
    if args.flows in ("mixed", "all"):  # image-context flows (CLIP-vision)
        sz = sysm.ctx["image"].image_size
        sysm.params["ctx"]["image"] = fill(jax.eval_shape(
            lambda k: sysm.ctx["image"].init(
                k, jnp.zeros((1, sz, sz, 3)))["params"],
            key), jax.random.fold_in(key, 3))
    if args.flows == "all":  # Optimus towers (t2t/i2t latents + decode)
        sysm.params["vae"]["text"] = fill(jax.eval_shape(
            lambda k: sysm.vae["text"].init_params(k), key),
            jax.random.fold_in(key, 4))
    jax.block_until_ready(sysm.params["diffuser"])
    log(f"params {time.perf_counter() - t0:.1f}s")

    if args.policy == "int8":
        t0 = time.perf_counter()
        # all-flow runs calibrate every (x_type, c_type) combination the
        # mix will sample (enable_int8's default four); t2i/mixed only
        # exercise image-latent sites
        kw = {} if args.flows == "all" else {"flows": (("image", "text"),)}
        sysm.enable_int8(image_size=args.size,
                         latent_downsample=args.latent_downsample, **kw)
        log(f"int8 calibration {time.perf_counter() - t0:.1f}s")
    if args.tome:
        # the default serving policy composes ToMe on the int8 path
        # (README "Serving policy gate"); calibration above ran full-res,
        # whose scales stay valid upper bounds under merging
        sysm.enable_tome(ratio=args.tome)

    enc = sysm.ctx["text"]
    inf = VDInference(sysm,
                      text_tokenizer=make_tokenizer(enc.vocab_size,
                                                    enc.max_len),
                      output_dim=(args.size, args.size),
                      ddim_steps=args.steps, n_sample_image=1,
                      n_sample_text=1,
                      image_latent_dim=args.image_latent_dim,
                      text_latent_dim=args.text_latent_dim,
                      latent_downsample=args.latent_downsample)
    buckets = tuple(int(b) for b in args.buckets.split(","))

    h = w = args.size
    imgs = [np.random.RandomState(7 + i).rand(1, h, w, 3).astype(np.float32)
            for i in range(4)]

    def _tcg_ctxs(i):
        return [{"image": imgs[i % len(imgs)], "strength": 1.0,
                 "fcs_lvl": 0.5},
                {"image": imgs[(i + 1) % len(imgs)], "strength": 0.7,
                 "fcs_lvl": 0.5}]

    def _mcg_ctxs(i):
        return [{"image": imgs[(i + j) % len(imgs)], "strength": 1.0,
                 "fcs_lvl": 0.5} for j in range(3)]

    def submit_one(q, i: int):
        """Submit request i under the configured flow mix; returns
        (flow_label, future). The mixed split is deterministic in i so
        every rate sweeps the same workload."""
        p = prompts[i % len(prompts)]
        if args.flows == "all":
            r = i % 10
            if r < 4:                                   # 40%
                return "t2i", q.submit(p, i)
            if r == 4:
                return "i2i", q.submit_i2i(imgs[i % len(imgs)], 0.5, 0.5,
                                           None, seed=i)
            if r == 5:
                return "dcg", q.submit_dcg(imgs[i % len(imgs)], 0.5, p,
                                           0.5, seed=i)
            if r == 6:
                return "t2t", q.submit_t2t(p, i)
            if r == 7:
                return "i2t", q.submit_i2t(imgs[i % len(imgs)], seed=i)
            if r == 8:
                return "tcg", q.submit_tcg(_tcg_ctxs(i), p, 0.5, seed=i)
            return "mcg", q.submit_mcg(_mcg_ctxs(i), None, 0.0, seed=i)
        if args.flows == "t2i" or i % 5 < 3:          # 60%
            return "t2i", q.submit(p, i)
        if i % 5 == 3:                                 # 20%
            return "i2i", q.submit_i2i(imgs[i % len(imgs)], 0.5, 0.5,
                                       None, seed=i)
        return "dcg", q.submit_dcg(imgs[i % len(imgs)], 0.5,      # 20%
                                   p, 0.5, seed=i)

    prompts = [f"a photo of scene number {i}" for i in range(512)]

    # ---- warm-up: compile every (bucket, flow-family) executable once ----
    t0 = time.perf_counter()
    with BatchingQueue(inf, buckets=buckets, max_wait_ms=5.0) as q:
        for b in buckets:
            futs = [q.submit(f"warm {b} {i}", i) for i in range(b)]
            if args.flows in ("mixed", "all"):
                futs += [q.submit_i2i(imgs[0], 0.5, 0.5, None, seed=i)
                         for i in range(b)]
                futs += [q.submit_dcg(imgs[0], 0.5, "warm", 0.5, seed=i)
                         for i in range(b)]
            if args.flows == "all":
                futs += [q.submit_t2t(f"warm {b} {i}", i) for i in range(b)]
                futs += [q.submit_i2t(imgs[0], seed=i) for i in range(b)]
                futs += [q.submit_tcg(_tcg_ctxs(i), "warm", 0.5, seed=i)
                         for i in range(b)]
                futs += [q.submit_mcg(_mcg_ctxs(i), None, 0.0, seed=i)
                         for i in range(b)]
            for f in futs:
                f.result(timeout=3600)
            log(f"bucket {b} warm {time.perf_counter() - t0:.1f}s")

    for rate in (float(r) for r in args.rates.split(",")):
        lat, done_t = [], []
        flow_lat: dict[str, list] = {}
        rec_lock = threading.Lock()

        def record(t_sub, flow, fut):
            # done-callback stamps completion exactly (the submit loop only
            # wakes between Poisson sleeps — polling there would inflate
            # latency by up to one inter-arrival gap)
            now = time.monotonic()
            fut.result()  # surface worker exceptions
            with rec_lock:
                lat.append(now - t_sub)
                done_t.append(now)
                flow_lat.setdefault(flow, []).append(now - t_sub)

        stop_at = time.monotonic() + args.seconds
        rs = np.random.RandomState(42)
        with BatchingQueue(inf, buckets=buckets, max_wait_ms=25.0,
                           deadline_ms=args.deadline_ms) as q:
            pending = []
            i = 0
            while time.monotonic() < stop_at:
                t_sub = time.monotonic()
                flow, fut = submit_one(q, i)
                fut.add_done_callback(
                    lambda f, ts=t_sub, fl=flow: record(ts, fl, f))
                pending.append(fut)
                i += 1
                time.sleep(rs.exponential(1.0 / rate))
            for f in pending:
                f.result(timeout=3600)
        # close() drained the queue; callbacks ran on the worker thread
        lat_s = sorted(lat)
        span = (max(done_t) - min(done_t)) if len(done_t) > 1 else 1.0
        row = {
            "rate_rps": rate, "requests": len(lat),
            "throughput_rps": round((len(lat) - 1) / span, 3),
            "p50_s": round(lat_s[len(lat_s) // 2], 3),
            "p95_s": round(lat_s[int(len(lat_s) * 0.95)], 3),
            "max_s": round(lat_s[-1], 3),
            "policy": (f"{args.policy}+tome{args.tome}" if args.tome
                       else args.policy),
            "buckets": list(buckets),
            "deadline_ms": args.deadline_ms, "steps": args.steps,
            "flows": args.flows,
        }
        if args.flows in ("mixed", "all"):
            for fl, ls in sorted(flow_lat.items()):
                ls = sorted(ls)
                row[f"{fl}_requests"] = len(ls)
                row[f"{fl}_p50_s"] = round(ls[len(ls) // 2], 3)
                row[f"{fl}_p95_s"] = round(ls[int(len(ls) * 0.95)], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
