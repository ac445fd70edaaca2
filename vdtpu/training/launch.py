"""Training launcher: the `main.py` equivalent.

Capability parity with `/root/reference/main.py` + the exec containers
(`lib/utils.py:409-601`): load an experiment config, set up the run dir,
build model/optimizer/scheduler/data, run the step-typed loop with nested
eval and checkpointing. Single-controller: one process drives every chip
through a (dp, tp) mesh — `mp.spawn` + DDP + rank bookkeeping are gone; on
multi-host pods call `jax.distributed.initialize()` first (flag below).

Usage:
  python -m vdtpu.training.launch --config vdtpu/config/experiments/vd_laion.yaml
"""
from __future__ import annotations

import argparse
from typing import Any

import jax
import numpy as np
import yaml


def build_dataloader(dcfg: dict[str, Any]):
    from vdtpu.data.webdataset import ImageTextPipeline, ShardIndex
    index = ShardIndex.from_dir(
        dcfg["shards"],
        process_index=jax.process_index(), process_count=jax.process_count(),
        seed=dcfg.get("seed", 0))
    return ImageTextPipeline(
        index, batch_size=dcfg["batch_size"],
        image_size=dcfg.get("image_size", 512),
        shuffle_buffer=dcfg.get("shuffle_buffer", 1000))


def _realize_with_retry(fn, *args, attempts: int = 4):
    """np.asarray(fn(*args)) with a bounded ResourceExhausted retry.

    Tunnel-backend quirk (measured round 5, scripts/train_sustained.py
    post-mortem): with ~10 GiB resident the FIRST heavy dispatch after the
    init burst (param fill + cast + opt-state init) can spuriously report
    RESOURCE_EXHAUSTED even though a 12 GiB probe allocation at the same
    point succeeds and the identical call passes once a few trivial
    dispatches settle the server-side state. Genuine OOMs still surface:
    the retries re-raise after `attempts` failures."""
    import time

    import jax.numpy as jnp
    for k in range(attempts):
        try:
            return np.asarray(fn(*args))
        except jax.errors.JaxRuntimeError as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or k == attempts - 1:
                raise
            from vdtpu.utils.logging import print_log
            print_log(f"ingest encode hit ResourceExhausted "
                      f"(attempt {k + 1}/{attempts}); settling and retrying")
            jnp.zeros((256, 256), jnp.bfloat16).block_until_ready()
            time.sleep(2.0 * (k + 1))


def encode_batches(pipeline, system, x_type="image", c_type="text",
                   tokenizer=None, encode_chunk=None):
    """Stream raw (image, caption) batches through the frozen VAE + context
    encoder into diffusion-space training batches (the VD step contract:
    encode -> q_sample -> p_losses, vd.py:241-280).

    ``encode_chunk`` bounds the device-side ingest peak: the frozen VAE
    encoder's 512^2 activations run ~0.3 GB/sample transient, which at the
    single-chip training max (batch 16) collides with the resident
    params+Adam state that the step itself fits only with headroom
    (PERF.md train_bench table). Chunking slices the raw batch before
    encoding and reassembles latents on host — the step executable still
    sees the full batch."""
    for batch in pipeline:
        img = batch["image"]
        n = len(img)
        step = n if not encode_chunk else max(1, min(int(encode_chunk), n))
        xs, cs = [], []
        for i in range(0, n, step):
            sl = slice(i, i + step)
            xs.append(_realize_with_retry(system.vae_encode, img[sl], x_type))
            if c_type == "text":
                ids = tokenizer(batch["caption"][sl]) if tokenizer else None
                cs.append(_realize_with_retry(system.ctx_encode, ids, "text"))
            else:
                cs.append(_realize_with_retry(
                    system.ctx_encode, img[sl], "image"))
        yield {"x": xs[0] if len(xs) == 1 else np.concatenate(xs),
               "ctx": cs[0] if len(cs) == 1 else np.concatenate(cs)}


def cached_latent_batches(pipeline, system, x_type="image", c_type="text",
                          tokenizer=None, encode_chunk=None,
                          num_batches=None, seed=0, free_encoders=True):
    """Latent-cache ingest (``data.cache_latents: N``): encode the first N
    batches ONCE, drop the frozen VAE/CLIP towers from HBM, and train from
    the host cache (batch-shuffled per epoch, forever).

    Memory contract: the streaming path interleaves the frozen-tower
    encodes with the resident training state (params + Adam moments +
    donated step buffers) — at full size on one 16 GB chip that is exactly
    the collision that OOMed the sustained run (PERF.md round 5, even with
    ``encode_chunk`` and the bounded retry). Caching moves every encode
    BEFORE the optimizer state exists and frees the towers afterwards, so
    the training loop holds only the diffuser + moments. Standard practice
    for frozen-encoder diffusion fine-tuning; the reference streams raw
    pixels to 8x40 GB A100s and re-encodes every step (main.py ->
    lib/model_zoo/vd.py forward), which a single chip cannot afford."""
    import itertools
    src = encode_batches(pipeline, system, x_type, c_type, tokenizer,
                         encode_chunk)
    cache = list(itertools.islice(src, num_batches))
    if not cache:
        raise SystemExit("data.cache_latents: the pipeline yielded no batches")
    if free_encoders:
        # drop the frozen towers' device buffers — training needs only the
        # diffuser; a resume pass re-initializes and re-encodes its own cache
        for group in ("vae", "ctx"):
            for slot in list(system.params.get(group) or {}):
                system.params[group][slot] = None

    def replay():
        rng = np.random.default_rng(seed)
        while True:
            for i in rng.permutation(len(cache)):
                yield cache[i]
    return replay()


def build_tokenizer(ecfg):
    """CLIP tokenizer from config paths; `clip_max_length` caps the token
    length (77 for the published towers, smaller for test miniatures)."""
    if not ecfg.get("clip_vocab"):
        return None
    import functools
    from vdtpu.data.tokenizers import CLIPTokenizer
    tok = CLIPTokenizer(ecfg["clip_vocab"], ecfg["clip_merges"])
    return functools.partial(tok, max_length=ecfg.get("clip_max_length", 77))


def run_eval(ecfg, system, exp, args):
    """Eval-only exec container (ref `eval`, lib/utils.py:567-601 and the
    deprecated README's `--eval` entry, README_deprecated.md:97-103): stream
    the eval split, generate images from the captions with the frozen
    system, score with the configured evaluator, write the summary under
    ``<log_dir>/<eval_subdir>/``. The reference shipped this container but
    not its `lib/evaluator`; ours is `vdtpu.training.evaluator`."""
    import itertools
    import os

    import jax.numpy as jnp

    from vdtpu.training.evaluator import EvalStage, get_evaluator
    from vdtpu.utils.logging import print_log, set_log_file

    vcfg = dict(ecfg.get("eval") or {})
    out_dir = os.path.join(exp.log_dir, args.eval_subdir or "eval")
    os.makedirs(out_dir, exist_ok=True)
    set_log_file(os.path.join(out_dir, "eval.log"))

    tokenizer = build_tokenizer(ecfg)
    if tokenizer is None:
        raise SystemExit("--eval needs clip_vocab/clip_merges in the config")

    steps = vcfg.get("ddim_steps", 50)
    scale = vcfg.get("scale", 7.5)
    latent = vcfg.get("latent_size", 64)
    latent_dim = vcfg.get("latent_dim", 4)
    ev_name = vcfg.get("evaluator", "clip_similarity")
    # eval-throughput knob: `sampler: dpmpp2m` + `ddim_steps: 20` runs the
    # few-step solver (sampling/dpmpp.py) — DDIM-50-class sample quality at
    # ~2.4x the eval generation rate (matched-quality point, PERF.md)
    method = vcfg.get("sampler", "ddim")
    key = jax.random.PRNGKey(vcfg.get("seed", 0))
    uncond_1 = system.ctx_encode(tokenizer([""]), "text")

    def sample_fn(batch):
        nonlocal key
        ids = tokenizer(list(batch["caption"]))
        c = system.ctx_encode(ids, "text")
        u = jnp.tile(uncond_1, (c.shape[0], 1, 1))
        key, sub = jax.random.split(key)
        x = system.sampler.sample(
            system.params["diffuser"], sub, steps,
            (c.shape[0], latent, latent, latent_dim), {"type": "image"},
            {"type": "text", "conditioning": c,
             "unconditional_conditioning": u,
             "unconditional_guidance_scale": scale},
            dtype=system.dtype, method=method)
        imgs = system.vae_decode(x, "image")
        # CLIP-sim pairs generations with their prompts; FID with the reals
        return (imgs, ids) if ev_name == "clip_similarity" \
            else (imgs, batch["image"])

    if ev_name == "clip_similarity":
        evaluator = get_evaluator(ev_name,
                                  image_embed_fn=system.clip_image_features,
                                  text_embed_fn=system.clip_text_features)
    else:
        evaluator = get_evaluator(ev_name,
                                  feature_fn=system.clip_image_features)
    stage = EvalStage(evaluator, sample_fn)
    loader = iter(build_dataloader(ecfg["data"]))
    if vcfg.get("max_batches"):
        loader = itertools.islice(loader, vcfg["max_batches"])
    summary = stage(loader)
    with open(os.path.join(out_dir, "summary.yaml"), "w") as f:
        yaml.safe_dump({k: float(v) for k, v in summary.items()}, f)
    print_log(f"eval summary written to {out_dir}/summary.yaml")
    set_log_file(None)  # end of run: don't leak the file into later stages
    return summary


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--signature", nargs="*", default=[])
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--resume_dir", default=None)
    p.add_argument("--resume_weight", default=None,
                   help="checkpoint tag to restore (default: latest)")
    p.add_argument("--eval", action="store_true",
                   help="run the eval stage only (ref lib/utils.py:567-601)")
    p.add_argument("--eval_subdir", default=None)
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (TPU pods)")
    args = p.parse_args(argv)

    if args.multihost:
        jax.distributed.initialize()

    with open(args.config) as f:
        ecfg = yaml.safe_load(f)

    from vdtpu.models.vd import VDModel
    from vdtpu.parallel.mesh import make_mesh, shard_params
    from vdtpu.serving.api import VDSystem
    from vdtpu.training.experiment import Experiment
    from vdtpu.training.harness import Trainer
    from vdtpu.training.optim import get_optimizer
    from vdtpu.training.schedulers import get_scheduler

    if args.resume_dir:
        exp = Experiment.resume(args.resume_dir)
        ecfg = exp.cfg
    else:
        exp = Experiment(ecfg, signature=args.signature, debug=args.debug,
                         seed=args.seed)
        exp.initiate(snapshot_code_from=".")

    import jax.numpy as jnp
    # training remat knobs from the train: section (ref use_checkpoint,
    # configs/model/openai_unet.yaml; selective remat is a vdtpu extension
    # for compile services that OOM on the full-remat HLO — PERF.md)
    _t = {} if args.eval else (ecfg.get("train") or {})
    system = VDSystem(ecfg["model"],
                      dtype=jnp.bfloat16 if ecfg.get("bf16") else jnp.float32,
                      model_args=ecfg.get("model_args"),
                      use_checkpoint=bool(_t.get("use_checkpoint", False)),
                      remat_max_channels=_t.get("remat_max_channels"),
                      # image-flow training doesn't need the Optimus towers
                      # resident (full-size single-chip memory budget)
                      with_text_vae=bool(ecfg.get("with_text_vae", True)))
    system.init_random(args.seed or 0)
    if ecfg.get("pretrained"):
        import torch
        sd = torch.load(ecfg["pretrained"], map_location="cpu")
        system.load_torch_checkpoint(sd.get("state_dict", sd))

    model = system.model
    params = system.params["diffuser"]

    if args.eval:
        # evaluate the run's own trained weights when the dir holds
        # checkpoints: prefer the EMA shadow — the reference evaluates under
        # ema_scope (vd.py:188-198) — configurable via eval.use_ema
        try:
            tag = system.load_vdtpu_checkpoint(
                exp.weight_dir, tag=args.resume_weight,
                use_ema=bool((ecfg.get("eval") or {}).get("use_ema", True)))
            from vdtpu.utils.logging import print_log
            print_log(f"eval: loaded trained checkpoint '{tag}' "
                      f"from {exp.weight_dir}")
        except FileNotFoundError:
            if args.resume_weight is not None:
                # the user named a tag explicitly — evaluating whatever
                # weights happen to be loaded instead would silently score
                # the wrong model
                raise SystemExit(
                    f"--resume_weight {args.resume_weight!r} not found "
                    f"under {exp.weight_dir}")
            pass  # pretrained-only eval: no trained checkpoints in this dir
        return run_eval(ecfg, system, exp, args)

    tcfg = ecfg["train"]
    if tcfg.get("params_dtype"):
        # single-chip full-size budget: flax-init f32 master weights
        # (10.3 GB for the four-flow diffuser) cannot share a 16 GB chip
        # with Adam state — `params_dtype: bfloat16` trains on bf16 master
        # weights, the measured train_bench configuration (PERF.md; the
        # optimizer moments inherit the dtype via zeros_like)
        system.cast_params(getattr(jnp, tcfg["params_dtype"]))
        params = system.params["diffuser"]
    mesh = make_mesh(tp=tcfg.get("tp", 1))
    dp = mesh.shape["dp"]
    bsz = ecfg["data"]["batch_size"]
    if bsz % (dp * tcfg.get("gradacc_every", 1)):
        # up-front alignment check (ref cfg_helper.py:456-461 asserts
        # batch_size % gpu_count; here the batch shards over the dp axis)
        raise SystemExit(
            f"data.batch_size={bsz} must be divisible by dp={dp} x "
            f"gradacc_every={tcfg.get('gradacc_every', 1)}")
    tokenizer = build_tokenizer(ecfg)
    pipeline = build_dataloader(ecfg["data"])
    cache_n = ecfg["data"].get("cache_latents")
    if cache_n:
        # encode NOW — before shard_params/optimizer/Trainer allocate the
        # training state — then train from the host cache with the frozen
        # towers freed (docstring above)
        batches = cached_latent_batches(
            pipeline, system, tcfg.get("x_type", "image"),
            tcfg.get("c_type", "text"), tokenizer,
            encode_chunk=ecfg["data"].get("encode_chunk"),
            num_batches=int(cache_n), seed=args.seed or 0)
    else:
        batches = encode_batches(
            pipeline, system, tcfg.get("x_type", "image"),
            tcfg.get("c_type", "text"), tokenizer,
            encode_chunk=ecfg["data"].get("encode_chunk"))

    params = shard_params(mesh, params)
    # rebind the system's diffuser tree to the mesh-laid-out copy:
    # shard_params device_puts fresh arrays, and keeping the pre-layout
    # originals alive through `system` (encode_batches needs its VAE/CLIP,
    # not the diffuser) pins a second ~4.8 GiB full-size tree — enough to
    # OOM the 16 GB chip before the first ingest encode (measured r5)
    system.params["diffuser"] = params
    tx, set_lr = get_optimizer(
        tcfg.get("optimizer", "adamw"), params=params,
        pg_lrscale=tcfg.get("pg_lrscale"),
        freeze=tcfg.get("freeze"), **tcfg.get("optimizer_args", {}))
    sched = get_scheduler(tcfg.get("scheduler"),
                          global_batch_size=tcfg.get("batch_size", 1),
                          gradacc_every=tcfg.get("gradacc_every", 1))

    trainer = Trainer(
        model, params, tx, set_lr, scheduler=sched,
        x_type=tcfg.get("x_type", "image"), c_type=tcfg.get("c_type", "text"),
        ema_decay=tcfg.get("ema_decay"),
        grad_accum=tcfg.get("gradacc_every", 1), mesh=mesh,
        log_every=tcfg.get("log_every", 100),
        ckpt_every=tcfg.get("ckpt_every"), ckpt_dir=exp.weight_dir,
        async_ckpt=bool(tcfg.get("async_ckpt", False)),
        freeze_groups=tuple(tcfg.get("freeze") or ()),
        donate=bool(tcfg.get("donate", False)))

    if args.resume_dir:
        # restore params + opt_state + EMA + step and continue counting
        # (the reference only re-enters the loop at --resume_step and never
        # restores optimizer state, lib/utils.py:79-85; fixed here)
        state = trainer.restore(exp.weight_dir, tag=args.resume_weight)
        from vdtpu.utils.logging import print_log
        print_log(f"resumed from {exp.weight_dir} at step {state.step}")

    try:
        trainer.run(batches, num_iters=tcfg["num_iters"])
    finally:
        from vdtpu.utils.logging import set_log_file
        set_log_file(None)  # end of run: don't leak the logfile registration


if __name__ == "__main__":
    main()
