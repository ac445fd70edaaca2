"""Per-site int8 keep/drop frontier (VERDICT r3 task 1).

The int8 serving step pays a per-site quantize/GN-stat tax (34% of step,
PERF.md batch-16 trace) for a per-site MXU gain — and the ratio varies
wildly across site classes (a 64x64x320 conv quantizes 1.3M activations for
a 921 kFLOP/pixel GEMM; a GEGLU proj quantizes the same tokens for a wider
matmul). This script measures, on one model build + one calibration pass:

  1. the all-int8 baseline and all-bf16 floor,
  2. leave-one-class-out: e2e batch-8 t2i throughput with each site CLASS
     (role x channel width) dropped to bf16 via quant.set_site_filter,
  3. a greedy combined config dropping every class whose removal helped.

One JSON line per measurement (feeds PERF.md's ladder table).

Usage (axon tunnel):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/int8_sites.py \
      --batch 8 --runs 2 [--classes in_layers.2@320 ...] [--threshold 0.002]
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# Site classes: (label, filter-spec entry). Patterns substring-match the
# flax module path (see quant._compile_site_spec); channels are the site's
# INPUT width. Enumerated from the 2-D diffuser's quantized sites (probe:
# in_layers.2 / out_layers.3 convs at 320/640/1280, down "op" / up "conv",
# fused self-attn qkv + to_out.0, cross-attn (attn2), proj_in/out, GEGLU
# proj + net.2). The 8x8 level's convs already ride the bf16 min-pixels
# floor, so @1280 conv classes cover only the 16x16 level.
DEFAULT_CLASSES = [
    ("in320", "in_layers.2@320"),
    ("in640", "in_layers.2@640"),
    ("in1280", "in_layers.2@1280"),
    ("out320", "out_layers.3@320"),
    ("out640", "out_layers.3@640"),
    ("out1280", "out_layers.3@1280"),
    ("updown", "/op,/conv"),
    ("qkv320", "attn1/qkv@320"),
    ("qkvhi", "attn1/qkv@640,attn1/qkv@1280"),
    ("attnout", "attn1/to_out"),
    ("xattn", "attn2"),
    ("projio", "proj_in,proj_out"),
    ("ff0", "ff/net.0"),
    ("ff2", "ff/net.2"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--classes", nargs="*", default=None,
                    help="label=spec entries overriding the default ladder")
    ap.add_argument("--threshold", type=float, default=0.002,
                    help="min relative throughput gain for a drop to enter "
                         "the greedy combined config")
    ap.add_argument("--skip-bf16", action="store_true")
    ap.add_argument("--only", nargs="*", default=None,
                    help="measure only these class labels (plus baseline)")
    ap.add_argument("--final-spec", default=None,
                    help="measure ONLY baseline + this combined spec")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/vdtpu-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np
    from vdtpu.config.bank import model_cfg_bank
    from vdtpu.models.vd import VDModel
    from vdtpu.ops import quant
    from vdtpu.sampling.ddim import DDIMTables, cfg_eps_fn, ddim_scan

    from _common import calibrate_int8, clip_conditioning, fill_params

    dtype = jnp.bfloat16
    n = args.batch
    cfgm = model_cfg_bank()("vd_four_flow_v1-0")
    cond1, uncond1 = clip_conditioning(cfgm, dtype)
    quant.set_policy("int8")
    model = VDModel.from_config(cfgm, dtype=dtype, use_checkpoint=False)
    params = fill_params(model)
    params = calibrate_int8(model, params, n, dtype, cond1, uncond1)
    tables = DDIMTables.create(model.schedule, args.steps, eta=0.0)
    key = jax.random.PRNGKey(42)
    cond = jnp.tile(cond1, (n, 1, 1))
    uncond = jnp.tile(uncond1, (n, 1, 1))

    def measure(label, spec):
        """Throughput of the 50-step CFG scan under a site-filter spec.
        No decode: the VAE has no quantized sites, so its (constant) cost
        is the same for every row — scan deltas are what the ladder ranks.

        scan_fn is DEFINED HERE, fresh per measurement: jax.jit wrappers
        share a global trace cache keyed on the wrapped function object, so
        re-jitting one module-level function would silently reuse the trace
        made under the FIRST filter (measured: a changed trace-time global
        does not retrace through a fresh jax.jit of the same function)."""

        def scan_fn(params, cond, uncond, key):
            x = jax.random.normal(key, (n, 64, 64, 4), dtype)
            apply = lambda x_, t, c: model.apply_model(params, x_, t, c,
                                                       "image", "text")
            eps = cfg_eps_fn(apply, cond, uncond, 7.5)
            return ddim_scan(eps, x, key, tables)

        quant.set_site_filter(spec or None)
        try:
            t0 = time.perf_counter()
            fn = jax.jit(scan_fn)
            out = fn(params, cond, uncond, key)
            np.asarray(out[0, 0, 0, 0])
            compile_s = time.perf_counter() - t0
            times = []
            for i in range(args.runs):
                t0 = time.perf_counter()
                out = fn(params, cond, uncond, jax.random.fold_in(key, i))
                jax.block_until_ready(out)
                np.asarray(out[0, 0, 0, 0])
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2]
            row = {"label": label, "spec": spec, "median_s": round(med, 4),
                   "images_per_sec": round(n / med, 4),
                   "compile_s": round(compile_s, 1),
                   "runs": [round(t, 4) for t in times]}
            print(json.dumps(row), flush=True)
            log(f"{label}: {n / med:.4f} img/s (scan only)")
            return n / med
        finally:
            quant.set_site_filter(None)

    base = measure("baseline_int8", "")
    if args.final_spec is not None:
        measure("final", args.final_spec)
        return

    classes = DEFAULT_CLASSES
    if args.classes:
        classes = [tuple(c.split("=", 1)) for c in args.classes]
    if args.only:
        classes = [c for c in classes if c[0] in args.only]

    gains = []
    for label, spec in classes:
        ips = measure(f"drop_{label}", spec)
        gains.append((label, spec, (ips - base) / base))

    helped = [(l, s, g) for l, s, g in gains if g >= args.threshold]
    helped.sort(key=lambda t: -t[2])
    if helped:
        combo = ",".join(s for _, s, _ in helped)
        log(f"greedy combined drop: {[l for l, _, _ in helped]}")
        combo_ips = measure("combined", combo)
        # greedy backward pass: if the combo underperforms the best single
        # drop, classes interact — report both, the ladder decides
        log(f"combined {combo_ips:.4f} vs base {base:.4f}")
    else:
        log("no class drop cleared the threshold — frontier is flat")
    if not args.skip_bf16:
        # all-bf16 floor for the table (policy stays int8; every site
        # dropped — distinct from set_policy(None) only in that GN/skip
        # structure match the filtered rows exactly)
        measure("all_bf16", ",".join(s for _, s in classes))


if __name__ == "__main__":
    main()
