"""Headline benchmark: 512^2 DDIM-50 text-to-image throughput per chip.

Runs the full serving path (conditioning -> 50-step CFG-batched UNet scan ->
KL-f8 decode) on the available accelerator with random bf16 weights
(numerics identical to converted checkpoints; no pretrained blobs in this
environment). Prints ONE JSON line.

The headline is measured at the chip's throughput operating point (batch 8:
the step saturates there, PERF.md "Batch scaling") — the north star metric
is images/s/chip, i.e. throughput, and production serving batches requests.
The batch-2 latency point (the reference app's operating shape,
app.py:300-320) is measured too and reported in the same JSON line as
`batch2_images_per_sec` for round-over-round comparability with BENCH_r01.

vs_baseline: the reference has no published numbers; BASELINE.md derives
the A100 figure from exact FLOP counts — 0.85 img/s = 22.6% A100 MFU,
deliberately above anything published for the reference's implementation
class (eager fp16 torch, einsum attention), at ANY batch size, so
vs_baseline is a lower bound. vs_baseline = throughput / 0.85.
"""
from __future__ import annotations

import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)

A100_REFERENCE_IMGS_PER_SEC = 0.85


def main():
    import os

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/vdtpu-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from vdtpu.config.bank import model_cfg_bank
    from vdtpu.models.vd import VDModel
    from vdtpu.ops import quant
    from vdtpu.sampling.ddim import DDIMTables, cfg_eps_fn, ddim_scan
    from vdtpu.models.autoencoder import AutoencoderKL
    from vdtpu.config.registry import build

    # serving policy: calibrated int8 diffuser (10% faster step, eps cosine
    # > 0.99 vs bf16 — tests/test_quant.py); VDTPU_BENCH_POLICY=none for bf16
    policy = os.environ.get("VDTPU_BENCH_POLICY", "int8")
    quant.set_policy(None if policy == "none" else policy)

    dtype = jnp.bfloat16
    n_samples, steps = 2, 50
    cfgm = model_cfg_bank()("vd_four_flow_v1-0")
    model = VDModel.from_config(cfgm, dtype=dtype, use_checkpoint=False)
    t0 = time.perf_counter()
    # shapes via eval_shape + ONE fused on-device fill (per-leaf dispatch
    # costs ~80s through the device tunnel); timing is weight-value
    # independent, so this replaces the 2-minute full-init compile
    shapes = jax.eval_shape(lambda k: model.init_params(k, jit=False),
                            jax.random.PRNGKey(0))
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    key = jax.random.PRNGKey(0)
    # per-leaf dispatch (~80s through the tunnel) beats both the full-init
    # compile (~2 min) and a single fused fill graph (8 min AOT compile)
    params = treedef.unflatten([
        jax.random.normal(jax.random.fold_in(key, i), l.shape, jnp.bfloat16) * 0.02
        for i, l in enumerate(leaves)])
    jax.block_until_ready(params)
    log(f"diffuser params {time.perf_counter() - t0:.1f}s")

    if policy != "none":
        t0 = time.perf_counter()
        flows = []
        for i, tt in enumerate((0, 250, 500, 750, 999)):
            flows.append((
                jax.random.normal(jax.random.fold_in(key, 1000 + i),
                                  (2 * n_samples, 64, 64, 4), dtype),
                jnp.full((2 * n_samples,), tt, jnp.int32),
                jax.random.normal(jax.random.fold_in(key, 2000 + i),
                                  (2 * n_samples, 77, 768), dtype) * 0.5,
                "image", "text"))
        scales = quant.calibrate(model, params, flows)
        model.quant_scales = None  # thread as a jit argument, not a constant
        params = {"params": params, "quant": scales}
        log(f"int8 calibration {time.perf_counter() - t0:.1f}s")

    # VAE decode stays bf16: its conv3 call sites pass quant=False (the
    # policy is read at trace time, so it must stay active for the t2i jit)
    vae_cfg = dict(cfgm["args"]["vae_cfg_list"])["image"]
    vae = build(vae_cfg, dtype=dtype)
    t0 = time.perf_counter()
    vparams = jax.jit(vae.init)(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))["params"]
    vparams = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), vparams)
    jax.block_until_ready(vparams)
    log(f"vae init {time.perf_counter() - t0:.1f}s")

    tables = DDIMTables.create(model.schedule, steps, eta=0.0)

    def make_t2i(n: int):
        @jax.jit
        def t2i(params, vparams, cond, uncond, key):
            eps = cfg_eps_fn(
                lambda x, t, c: model.apply_model(params, x, t, c, "image", "text"),
                cond, uncond, 7.5)
            x = jax.random.normal(key, (n, 64, 64, 4), dtype)
            x = ddim_scan(eps, x, key, tables)
            z = model.unscale_latent(x, "image")
            return vae.apply({"params": vparams}, z, method=AutoencoderKL.decode)
        return t2i

    import numpy as np
    key = jax.random.PRNGKey(42)

    def measure(n: int, runs: int = 3) -> float:
        """Median s/run at batch n with a forced scalar read-back per run
        (block_until_ready alone returns early on tunneled backends)."""
        t2i = make_t2i(n)
        cond = jnp.zeros((n, 77, 768), dtype)
        uncond = jnp.zeros((n, 77, 768), dtype)
        t0 = time.perf_counter()
        out = t2i(params, vparams, cond, uncond, key)  # compile + warmup
        np.asarray(out[0, 0, 0, 0])
        log(f"batch {n}: compile+first-run {time.perf_counter() - t0:.1f}s")
        times = []
        for i in range(runs):
            t0 = time.perf_counter()
            out = t2i(params, vparams, cond, uncond, jax.random.fold_in(key, i))
            jax.block_until_ready(out)
            np.asarray(out[0, 0, 0, 0])
            times.append(time.perf_counter() - t0)
            log(f"batch {n} run {i}: {times[-1]:.3f}s")
        return sorted(times)[len(times) // 2]

    dt2 = measure(n_samples)              # latency point (reference app shape)
    batch2 = n_samples / dt2
    tp_batch = int(os.environ.get("VDTPU_BENCH_TP_BATCH", "8"))
    dt8 = measure(tp_batch)               # throughput point (step saturates, PERF.md)
    throughput = tp_batch / dt8

    print(json.dumps({
        "metric": "512px_ddim50_t2i_images_per_sec_per_chip",
        "value": round(throughput, 4),
        "unit": "images/s",
        "vs_baseline": round(throughput / A100_REFERENCE_IMGS_PER_SEC, 3),
        "batch": tp_batch,
        "batch2_images_per_sec": round(batch2, 4),
    }))


if __name__ == "__main__":
    main()
