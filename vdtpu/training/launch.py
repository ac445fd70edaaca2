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


def encode_batches(pipeline, system, x_type="image", c_type="text",
                   tokenizer=None):
    """Stream raw (image, caption) batches through the frozen VAE + context
    encoder into diffusion-space training batches (the VD step contract:
    encode -> q_sample -> p_losses, vd.py:241-280)."""
    for batch in pipeline:
        x = system.vae_encode(batch["image"], x_type)
        if c_type == "text":
            ids = tokenizer(batch["caption"]) if tokenizer else None
            ctx = system.ctx_encode(ids, "text")
        else:
            ctx = system.ctx_encode(batch["image"], "image")
        yield {"x": np.asarray(x), "ctx": np.asarray(ctx)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--signature", nargs="*", default=[])
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--resume_dir", default=None)
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
    system = VDSystem(ecfg["model"],
                      dtype=jnp.bfloat16 if ecfg.get("bf16") else jnp.float32)
    system.init_random(args.seed or 0)
    if ecfg.get("pretrained"):
        import torch
        sd = torch.load(ecfg["pretrained"], map_location="cpu")
        system.load_torch_checkpoint(sd.get("state_dict", sd))

    model = system.model
    params = system.params["diffuser"]

    tcfg = ecfg["train"]
    mesh = make_mesh(tp=tcfg.get("tp", 1))
    params = shard_params(mesh, params)
    tx, set_lr = get_optimizer(
        tcfg.get("optimizer", "adamw"), params=params,
        pg_lrscale=tcfg.get("pg_lrscale"), **tcfg.get("optimizer_args", {}))
    sched = get_scheduler(tcfg.get("scheduler"),
                          global_batch_size=tcfg.get("batch_size", 1),
                          gradacc_every=tcfg.get("gradacc_every", 1))

    trainer = Trainer(
        model, params, tx, set_lr, scheduler=sched,
        x_type=tcfg.get("x_type", "image"), c_type=tcfg.get("c_type", "text"),
        ema_decay=tcfg.get("ema_decay"),
        grad_accum=tcfg.get("gradacc_every", 1), mesh=mesh,
        log_every=tcfg.get("log_every", 100),
        ckpt_every=tcfg.get("ckpt_every"), ckpt_dir=exp.weight_dir)

    tokenizer = None
    if ecfg.get("clip_vocab"):
        from vdtpu.data.tokenizers import CLIPTokenizer
        tokenizer = CLIPTokenizer(ecfg["clip_vocab"], ecfg["clip_merges"])

    pipeline = build_dataloader(ecfg["data"])
    batches = encode_batches(pipeline, system, tcfg.get("x_type", "image"),
                             tcfg.get("c_type", "text"), tokenizer)
    trainer.run(batches, num_iters=tcfg["num_iters"])


if __name__ == "__main__":
    main()
