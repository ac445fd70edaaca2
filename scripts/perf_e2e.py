"""E2e t2i timing harness for perf experiments (feeds PERF.md).

Same serving path as bench.py (conditioning -> 50-step CFG UNet scan ->
KL-f8 decode) at ONE operating point, with switches for the experiment
queue: quant policy, XLA compiler-option overrides, attention/QKV variants
(via the usual VDTPU_* envs). Prints one JSON line per measurement.

Usage (through the axon tunnel):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_e2e.py \
      --batch 8 --policy int8 --runs 3 [--xla k=v,k=v] [--steps 50]
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--policy", default="int8", choices=["int8", "none"])
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--xla", default="", help="compiler-option overrides k=v,k=v")
    ap.add_argument("--tag", default="")
    ap.add_argument("--encreuse", type=int, default=0,
                    help="encoder-reuse interval (0 = exact path)")
    ap.add_argument("--sampler", default="ddim", choices=["ddim", "dpmpp2m"],
                    help="dpmpp2m: pair with --steps 20 (matched-quality "
                         "point, tests/test_dpmpp.py)")
    ap.add_argument("--cfg-interval", default="",
                    help="lo,hi trajectory fractions for limited-interval "
                         "CFG (half-batch UNet outside the band)")
    ap.add_argument("--scan-only", action="store_true",
                    help="time the bare CFG UNet scan (no decode) too")
    ap.add_argument("--tome", type=float, default=0.0,
                    help="token-merging ratio (opt-in approximate mode)")
    ap.add_argument("--tome-min", type=int, default=4096,
                    help="minimum site token count for merging")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/vdtpu-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np
    from vdtpu.config.bank import model_cfg_bank
    from vdtpu.config.registry import build
    from vdtpu.models.autoencoder import AutoencoderKL
    from vdtpu.models.vd import VDModel
    from vdtpu.ops import quant
    from vdtpu.sampling.ddim import DDIMTables, cfg_eps_fn, ddim_scan

    from _common import calibrate_int8, clip_conditioning, fill_params

    opts = dict(kv.split("=", 1) for kv in args.xla.split(",") if kv)

    if args.tome:
        from vdtpu.ops.tome import ToMeSpec, set_tome
        set_tome(ToMeSpec(ratio=args.tome, min_tokens=args.tome_min))

    dtype = jnp.bfloat16
    n = args.batch
    cfgm = model_cfg_bank()("vd_four_flow_v1-0")
    # headline-bench methodology (code-review r3 alignment): CLIP-encoded
    # conditioning drives BOTH calibration and sampling. Pre-alignment
    # ladder rows (PERF.md) calibrated on random *0.5 context and sampled
    # on zeros — throughput is value-independent, so rows stay comparable.
    cond1, uncond1 = clip_conditioning(cfgm, dtype)
    quant.set_policy(None if args.policy == "none" else args.policy)
    model = VDModel.from_config(cfgm, dtype=dtype, use_checkpoint=False)
    params = fill_params(model)
    key = jax.random.PRNGKey(0)

    if args.policy != "none":
        params = calibrate_int8(model, params, n, dtype, cond1, uncond1)

    vae_cfg = dict(cfgm["args"]["vae_cfg_list"])["image"]
    vae = build(vae_cfg, dtype=dtype)
    vparams = jax.jit(vae.init)(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))["params"]
    vparams = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), vparams)
    jax.block_until_ready(vparams)

    tables = DDIMTables.create(model.schedule, args.steps, eta=0.0)

    def t2i(params, vparams, cond, uncond, key):
        x = jax.random.normal(key, (n, 64, 64, 4), dtype)
        if args.encreuse:
            from vdtpu.sampling.ddim import (
                cfg_eps_fn_stateful, ddim_scan_encreuse, encoder_reuse_schedule)
            mask = encoder_reuse_schedule(args.steps, interval=args.encreuse,
                                          warmup=5)
            cache_shapes = jax.eval_shape(
                lambda p: model.apply_model_encoder(
                    p, jnp.zeros((2 * n, 64, 64, 4), dtype),
                    jnp.zeros((2 * n,), jnp.int32),
                    jnp.zeros((2 * n, 77, 768), dtype), "image", "text"),
                params)
            cache0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes)
            eps = cfg_eps_fn_stateful(
                lambda xx, tt, cc, uc, cache: model.apply_model_encreuse(
                    params, xx, tt, cc, "image", "text", cache, uc),
                cond, uncond, 7.5)
            if args.sampler == "dpmpp2m":
                from vdtpu.sampling.dpmpp import (DPMppTables,
                                                  dpmpp_scan_encreuse)
                x = dpmpp_scan_encreuse(
                    eps, x, DPMppTables.create(model.schedule, args.steps),
                    mask, cache0)
            else:
                x = ddim_scan_encreuse(eps, x, key, tables, mask, cache0)
        else:
            apply = lambda x_, t, c: model.apply_model(params, x_, t, c,
                                                       "image", "text")
            eps = cfg_eps_fn(apply, cond, uncond, 7.5)
            if args.sampler == "dpmpp2m":
                from vdtpu.sampling.dpmpp import DPMppTables, dpmpp_scan
                x = dpmpp_scan(eps, x, DPMppTables.create(
                    model.schedule, args.steps))
            elif args.cfg_interval:
                from vdtpu.sampling.ddim import slice_tables
                lo, hi = (float(v) for v in args.cfg_interval.split(","))
                a = int(round(lo * args.steps))
                b = int(round(hi * args.steps))
                eps_c = cfg_eps_fn(apply, cond, None, 1.0)  # cond-only
                for s0, s1, fn in ((0, a, eps_c), (a, b, eps),
                                   (b, args.steps, eps_c)):
                    if s1 > s0:
                        x, key = ddim_scan(fn, x, key,
                                           slice_tables(tables, s0, s1),
                                           return_final_key=True)
            else:
                x = ddim_scan(eps, x, key, tables)
        z = model.unscale_latent(x, "image")
        return vae.apply({"params": vparams}, z, method=AutoencoderKL.decode)

    key = jax.random.PRNGKey(42)
    cond = jnp.tile(cond1, (n, 1, 1))
    uncond = jnp.tile(uncond1, (n, 1, 1))
    cargs = (params, vparams, cond, uncond, key)
    t0 = time.perf_counter()
    if opts:
        fn = jax.jit(t2i).lower(*cargs).compile(compiler_options=opts)
    else:
        fn = jax.jit(t2i)
    out = fn(*cargs)
    np.asarray(out[0, 0, 0, 0])
    compile_s = time.perf_counter() - t0
    log(f"compile+first-run {compile_s:.1f}s")
    times = []
    for i in range(args.runs):
        t0 = time.perf_counter()
        out = fn(params, vparams, cond, uncond, jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        np.asarray(out[0, 0, 0, 0])
        times.append(time.perf_counter() - t0)
        log(f"run {i}: {times[-1]:.3f}s")
    med = sorted(times)[len(times) // 2]
    print(json.dumps({
        "tag": args.tag, "batch": n, "policy": args.policy, "xla": args.xla,
        "sampler": args.sampler, "steps": args.steps,
        "cfg_interval": args.cfg_interval, "encreuse": args.encreuse,
        "tome": args.tome, "tome_min": args.tome_min,
        "median_s": round(med, 4), "images_per_sec": round(n / med, 4),
        "compile_s": round(compile_s, 1),
        "runs": [round(t, 4) for t in times],
    }), flush=True)


if __name__ == "__main__":
    main()
