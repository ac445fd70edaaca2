"""Device-trace the CFG UNet scan step and print the op-class breakdown.

Produces the PERF.md step-breakdown tables: a 20-step in-graph scan at the
given batch (x2 CFG) under the chosen policy, traced with jax.profiler and
aggregated by op class (vdtpu.utils.profiling.summarize_trace).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_step.py --batch 8
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
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--trace-dir", default="/tmp/vdtpu-trace")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/vdtpu-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np
    from vdtpu.config.bank import model_cfg_bank
    from vdtpu.models.vd import VDModel
    from vdtpu.ops import quant
    from vdtpu.utils.profiling import summarize_trace, trace

    from _common import calibrate_int8, clip_conditioning, fill_params

    dtype = jnp.bfloat16
    n = args.batch
    cfgm = model_cfg_bank()("vd_four_flow_v1-0")
    # headline-bench methodology (code-review r3 alignment): CLIP-encoded
    # conditioning drives calibration and the traced step
    cond1, uncond1 = clip_conditioning(cfgm, dtype)
    quant.set_policy(None if args.policy == "none" else args.policy)
    model = VDModel.from_config(cfgm, dtype=dtype, use_checkpoint=False)
    params = fill_params(model)
    key = jax.random.PRNGKey(0)

    if args.policy != "none":
        params = calibrate_int8(model, params, n, dtype, cond1, uncond1)
        log("calibrated")

    ctx = jnp.concatenate([jnp.tile(uncond1, (n, 1, 1)),
                           jnp.tile(cond1, (n, 1, 1))], axis=0)

    @jax.jit
    def scan20(params, x0, ctx):
        def body(x, t):
            e = model.apply_model(params, jnp.concatenate([x, x], 0),
                                  jnp.full((2 * n,), t, jnp.int32), ctx,
                                  "image", "text")
            eu, ec = jnp.split(e, 2, axis=0)
            return x - 0.01 * (eu + 7.5 * (ec - eu)), None
        x, _ = jax.lax.scan(body, x0, jnp.arange(args.steps, dtype=jnp.int32))
        return x

    x0 = jax.random.normal(jax.random.fold_in(key, 8), (n, 64, 64, 4), dtype)
    t0 = time.perf_counter()
    out = scan20(params, x0, ctx)
    np.asarray(out[0, 0, 0, 0])
    log(f"compile+warm {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    out = scan20(params, x0, ctx)
    np.asarray(out[0, 0, 0, 0])
    base = time.perf_counter() - t0
    log(f"steady {base:.3f}s ({1000*base/args.steps:.1f} ms/step)")

    with trace(args.trace_dir):
        out = scan20(params, x0, ctx)
        np.asarray(out[0, 0, 0, 0])
    classes = summarize_trace(args.trace_dir, top=24)
    per_step = {k: round(v / args.steps, 3) for k, v in classes.items()}
    print(json.dumps({"batch": n, "policy": args.policy,
                      "ms_per_step_wall": round(1000 * base / args.steps, 2),
                      "per_step_ms_by_class": per_step}, indent=1))


if __name__ == "__main__":
    main()
