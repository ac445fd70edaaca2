"""Shared helpers for the measurement scripts (perf_e2e, trace_step,
int8_quality, train_bench).

Code-review r3: the param-fill / CLIP-conditioning / int8-calibration
blocks were copy-pasted across five scripts and had drifted — perf_e2e and
trace_step calibrated on random *0.5 context while the headline bench.py
calibrates on CLIP-encoded token ids, so ladder experiments measured a
slightly different int8 configuration than the headline. These helpers
reproduce bench.py's methodology exactly; bench.py itself stays
self-contained by design (it is the driver-run artifact).
"""
from __future__ import annotations

import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def fill_params(model, seed: int = 0, scale: float = 0.02, chunk: int = 256):
    """Random bf16 diffuser params via eval_shape + CHUNKED jitted fill.

    Timing is weight-value independent. The fill is dispatch-bound through
    the tunnel (~25 ms/leaf x ~4k leaves = ~100 s per-leaf, bench r3);
    grouping leaves into a few jitted graphs cuts that to ~16 dispatches,
    and the chunk HLO is stable across runs so warm boots hit the
    persistent compilation cache. Values are IDENTICAL to the historical
    per-leaf fill (same fold_in(key, global_leaf_index) stream), so
    round-over-round bench numbers stay comparable."""
    import jax
    import jax.numpy as jnp
    t0 = time.perf_counter()
    shapes = jax.eval_shape(lambda k: model.init_params(k, jit=False),
                            jax.random.PRNGKey(seed))
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    key = jax.random.PRNGKey(seed)
    out = []
    for c0 in range(0, len(leaves), max(chunk, 1)):
        sub = leaves[c0:c0 + chunk]

        def fill(k, _c0=c0, _sub=sub):
            return [jax.random.normal(jax.random.fold_in(k, _c0 + j),
                                      l.shape, jnp.bfloat16) * scale
                    for j, l in enumerate(_sub)]

        out.extend(jax.jit(fill)(key))
    params = treedef.unflatten(out)
    jax.block_until_ready(params)
    log(f"diffuser params {time.perf_counter() - t0:.1f}s "
        f"({len(leaves)} leaves, chunk {chunk})")
    return params


def clip_conditioning(cfgm, dtype, normalize: bool = False):
    """(cond1, uncond1) [1,77,768]: CLIP text tower on random token ids —
    the bench.py headline conditioning. Build under the null quant policy
    (the one-time encode is not part of the timed path).

    normalize=True rescales to unit std (int8_quality's harder setting:
    random CLIP weights under-scale the embeddings, std ~0.04 vs ~1
    trained, which would make CFG contrast unrealistically weak)."""
    import jax
    import jax.numpy as jnp
    from vdtpu.config.registry import build
    from vdtpu.ops import quant
    prev = quant.get_policy()
    quant.set_policy(None)
    try:
        t0 = time.perf_counter()
        tcfg = dict(cfgm["args"]["ctx_cfg_list"])["text"]
        # geometry from the config (tiny towers have short max_len / small
        # vocab; out-of-range ids would NaN-fill through jnp.take)
        vocab = tcfg.get("args", {}).get("vocab_size", 49408)
        max_len = tcfg.get("args", {}).get("max_len", 77)
        clip = build(tcfg, dtype=dtype)
        ids_c = jax.random.randint(jax.random.PRNGKey(5), (1, max_len), 0, vocab)
        ids_u = jnp.full((1, max_len), vocab - 1, jnp.int32)  # empty-prompt stand-in
        cparams = jax.jit(clip.init)(jax.random.PRNGKey(2), ids_c)["params"]
        cparams = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), cparams)
        enc = jax.jit(lambda p, i: clip.apply({"params": p}, i))
        cond1 = enc(cparams, ids_c).astype(dtype)
        uncond1 = enc(cparams, ids_u).astype(dtype)
        if normalize:
            cond1 = cond1 / jnp.std(cond1.astype(jnp.float32)).astype(dtype)
            uncond1 = uncond1 / jnp.std(
                uncond1.astype(jnp.float32)).astype(dtype)
        jax.block_until_ready((cond1, uncond1))
        log(f"CLIP conditioning {time.perf_counter() - t0:.1f}s")
        return cond1, uncond1
    finally:
        quant.set_policy(prev)


def calibrate_int8(model, params, n: int, dtype, cond1=None, uncond1=None,
                   seed: int = 0):
    """5-timestep post-training calibration at CFG batch 2n; returns the
    {"params", "quant"} tree the jitted step consumes. With cond1/uncond1
    the context matches the headline bench (CFG-stacked CLIP encodings);
    without, it falls back to random *0.5 context (the pre-r3 script
    methodology — kept only for reproducing old ladder rows)."""
    import jax
    import jax.numpy as jnp
    from vdtpu.ops import quant
    t0 = time.perf_counter()
    key = jax.random.PRNGKey(seed)
    flows = []
    for i, tt in enumerate((0, 250, 500, 750, 999)):
        if cond1 is not None:
            ctx = jnp.concatenate([jnp.tile(uncond1, (n, 1, 1)),
                                   jnp.tile(cond1, (n, 1, 1))], axis=0)
        else:
            ctx = jax.random.normal(jax.random.fold_in(key, 2000 + i),
                                    (2 * n, 77, 768), dtype) * 0.5
        flows.append((
            jax.random.normal(jax.random.fold_in(key, 1000 + i),
                              (2 * n, 64, 64, 4), dtype),
            jnp.full((2 * n,), tt, jnp.int32), ctx, "image", "text"))
    scales = quant.calibrate(model, params, flows)
    model.quant_scales = None  # thread as a jit argument, not a constant
    log(f"int8 calibration {time.perf_counter() - t0:.1f}s")
    return {"params": params, "quant": scales}
