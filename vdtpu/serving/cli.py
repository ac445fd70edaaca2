"""Headless CLI covering every flow (the reference only ships the WebUI).

Usage:
  python -m vdtpu.serving.cli t2i --text "a dog" --seed 0 --out out/
  python -m vdtpu.serving.cli i2i --image in.png --fid 0.5 --fcs 0.5
  python -m vdtpu.serving.cli i2t --image in.png
  python -m vdtpu.serving.cli t2t --text "a dog"
  python -m vdtpu.serving.cli dcg --image in.png --text "snowy" --textstrength 0.5
  python -m vdtpu.serving.cli mcg --image a.png --image b.png --text "..."

Checkpoints: --ckpt path/to/vd-four-flow-v1-0.pth (torch state_dict,
converted on load); otherwise random weights (smoke/benchmark mode).
CLIP vocab: --clip-vocab/--clip-merges point at the tokenizer files.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def _load_image(path: str, size: int = 512) -> np.ndarray:
    from PIL import Image
    im = Image.open(path).convert("RGB").resize((size, size),
                                                Image.Resampling.BICUBIC)
    return np.asarray(im, np.float32)[None] / 255.0


def _save_images(batch, out_dir: str, stem: str):
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, b in enumerate(np.asarray(batch)):
        p = os.path.join(out_dir, f"{stem}_{i}.png")
        Image.fromarray((b * 255).astype(np.uint8)).save(p)
        paths.append(p)
    return paths


def build_inference(args):
    import jax.numpy as jnp
    from vdtpu.serving.api import VDInference, VDSystem

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    sysm = VDSystem(args.config, dtype=dtype).init_random(0)
    if args.ckpt:
        import torch
        sd = torch.load(args.ckpt, map_location="cpu")
        if "state_dict" in sd:
            sd = sd["state_dict"]
        missing = sysm.load_torch_checkpoint(sd)
        print(f"loaded checkpoint; {len(missing)} unmatched params")
    if args.int8:
        # calibrated int8 serving policy (the bench headline path; quality
        # table in PERF.md "Approximate-mode quality")
        sysm.enable_int8(image_size=args.size,
                         latent_downsample=args.latent_downsample)
    if args.tome:
        sysm.enable_tome(ratio=args.tome)
    tokenizer = None
    if args.clip_vocab and args.clip_merges:
        import functools
        from vdtpu.data.tokenizers import CLIPTokenizer
        tok = CLIPTokenizer(args.clip_vocab, args.clip_merges)
        tokenizer = functools.partial(tok, max_length=args.clip_max_length)
    return VDInference(sysm, text_tokenizer=tokenizer,
                       ddim_steps=args.steps,
                       output_dim=(args.size, args.size),
                       n_sample_image=args.n_images,
                       n_sample_text=args.n_texts,
                       image_latent_dim=args.image_latent_dim,
                       text_latent_dim=args.text_latent_dim,
                       latent_downsample=args.latent_downsample,
                       encoder_reuse=args.encoder_reuse or None,
                       sampler=args.sampler,
                       cfg_interval=(tuple(float(v) for v in
                                           args.cfg_interval.split(","))
                                     if args.cfg_interval else None))


def main(argv=None):
    p = argparse.ArgumentParser(prog="vdtpu")
    p.add_argument("flow", choices=["t2i", "i2i", "i2t", "t2t", "dcg", "tcg", "mcg"])
    p.add_argument("--text", default=None)
    p.add_argument("--image", action="append", default=[])
    p.add_argument("--mask", action="append", default=[])
    p.add_argument("--strength", type=float, action="append", default=[])
    p.add_argument("--fid", type=float, default=0.5)
    p.add_argument("--fcs", type=float, default=0.5)
    p.add_argument("--clr-adj", action="store_true")
    p.add_argument("--textstrength", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--out", default="outputs")
    p.add_argument("--config", default="vd_four_flow_v1-0")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--clip-vocab", default=None)
    p.add_argument("--clip-merges", default=None)
    p.add_argument("--clip-max-length", type=int, default=77)
    p.add_argument("--bf16", action="store_true")
    # generation geometry (defaults = published model; override for
    # miniature configs, e.g. --config vd_test_tiny --size 64
    # --latent-downsample 2 --text-latent-dim 96)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--n-images", type=int, default=2)
    p.add_argument("--n-texts", type=int, default=4)
    p.add_argument("--image-latent-dim", type=int, default=4)
    p.add_argument("--text-latent-dim", type=int, default=768)
    p.add_argument("--latent-downsample", type=int, default=8)
    p.add_argument("--encoder-reuse", type=int, default=0,
                   help="opt-in approximate mode: encoder-feature reuse "
                        "interval (0 = exact DDIM)")
    p.add_argument("--sampler", choices=["ddim", "dpmpp2m"], default="ddim",
                   help="dpmpp2m: second-order deterministic solver — "
                        "DDIM-50-class quality at ~20 steps (pair with "
                        "--steps 20)")
    p.add_argument("--cfg-interval", default=None, metavar="LO,HI",
                   help="opt-in approximate mode: trajectory fractions "
                        "where CFG is active (e.g. 0.0,0.7); outside them "
                        "the UNet runs at half batch")
    p.add_argument("--int8", action="store_true",
                   help="calibrated int8 diffuser (the bench headline "
                        "serving policy; +41%% at batch 8, PERF.md)")
    p.add_argument("--tome", type=float, default=0.0, metavar="RATIO",
                   help="opt-in approximate mode: token-merging ratio for "
                        "the 4096-token self-attention sites (ToMe-SD, "
                        "arXiv 2303.17604; 0 = off, 0.5 typical)")
    args = p.parse_args(argv)

    vdi = build_inference(args)
    if args.flow == "t2i":
        out = vdi.inference_t2i(args.text, args.seed)
        print(_save_images(out, args.out, "t2i"))
    elif args.flow == "i2i":
        im = _load_image(args.image[0], args.size)
        out = vdi.inference_i2i(im, args.fid, args.fcs,
                                "Simple" if args.clr_adj else None, args.seed)
        print(_save_images(out, args.out, "i2i"))
    elif args.flow == "i2t":
        print("\n".join(vdi.inference_i2t(_load_image(args.image[0], args.size), args.seed)))
    elif args.flow == "t2t":
        print("\n".join(vdi.inference_t2t(args.text, args.seed)))
    elif args.flow in ("dcg", "tcg", "mcg"):
        ctxs = []
        for i, pth in enumerate(args.image):
            ctx = {"image": _load_image(pth, args.size),
                   "strength": args.strength[i] if i < len(args.strength) else 1.0,
                   "fcs_lvl": args.fcs}
            if i < len(args.mask) and args.mask[i]:
                from PIL import Image
                m = Image.open(args.mask[i]).convert("L").resize((args.size, args.size))
                ctx["mask"] = np.asarray(m, np.float32)[None, :, :, None] / 255.0
            ctxs.append(ctx)
        if args.flow == "dcg":
            out = vdi.inference_dcg(ctxs[0]["image"], args.fcs, args.text,
                                    args.textstrength, args.seed)
        else:
            fn = vdi.inference_tcg if args.flow == "tcg" else vdi.inference_mcg
            _, out = fn(ctxs, args.text, args.textstrength, args.seed)
        print(_save_images(out, args.out, args.flow))


if __name__ == "__main__":
    main()
