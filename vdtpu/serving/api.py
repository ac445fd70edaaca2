"""Serving API: the TPU-native equivalent of the reference WebUI backend
(`vd_inference`, `/root/reference/app.py:244-579`).

`VDSystem` wires config -> modules -> params (random init or converted torch
checkpoint). `VDInference` exposes the seven flow entry points with the same
semantics and defaults (DDIM-50, eta 0, CFG 7.5, 512x512, 2 images / 4
texts): t2i, i2i (fidelity/focus/color-adjust), i2t, t2t, dcg, tcg, mcg
(masked, weighted, multi-image). Heavy paths are jitted once per
(flow, shape, steps, scale) signature and cached.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vdtpu.config.bank import model_cfg_bank
from vdtpu.config.registry import build
from vdtpu.interop.torch_convert import torch_to_flax
from vdtpu.models.clip import preprocess_images, vision_token_mask
from vdtpu.models.vd import VDModel
from vdtpu.sampling.ddim import DDIMSampler
from vdtpu.serving.postprocess import AdjustRank, color_adjust_simple, remove_duplicate_word


def regularize_image(x, hw, method: str = "bicubic"):
    """Resize a [B,H,W,C] float batch to ``hw`` = (H, W).

    Input regularization: the reference bicubic-resizes every uploaded
    image to ``output_dim`` at the top of each image flow (app.py:329-330
    i2i, :392 i2t, :460 dcg, :534 mcg) and bilinear-resizes masks
    (app.py:536). No-op when already at ``hw``. Bicubic output is clamped
    to [0, 1] because PIL's uint8 resample saturates where the kernel
    overshoots."""
    x = jnp.asarray(x)
    h, w = int(hw[0]), int(hw[1])
    if x.shape[1:3] == (h, w):
        return x
    out = jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method)
    return jnp.clip(out, 0.0, 1.0) if method == "bicubic" else out


def vd_inference(which: str = "v1.0", fp16: bool = False,
                 checkpoint: str | None = None, **kw) -> "VDInference":
    """Drop-in for the reference constructor (`app.py:244-298`):
    `vd_inference(which='v1.0', fp16=True)` -> ready VDInference.

    fp16 maps to bf16 (the TPU half-precision); `checkpoint` loads the
    published torch state_dict."""
    import jax.numpy as jnp
    if which != "v1.0":
        raise ValueError("Model type not supported")
    system = VDSystem("vd_four_flow_v1-0",
                      dtype=jnp.bfloat16 if fp16 else jnp.float32)
    system.init_random(0)
    if checkpoint:
        import torch
        sd = torch.load(checkpoint, map_location="cpu")
        system.load_torch_checkpoint(sd.get("state_dict", sd))
    if fp16:
        system.cast_params(jnp.bfloat16)
    return VDInference(system, **kw)


class VDSystem:
    """Builds and owns every module + param tree of a VD config."""

    def __init__(self, cfg_name: str = "vd_four_flow_v1-0", dtype=jnp.float32,
                 with_text_vae: bool = True, model_args=None,
                 use_checkpoint: bool | None = False,
                 remat_max_channels: int | None = None):
        """use_checkpoint/remat_max_channels reach the diffusers (training
        builds pass them from the experiment config's train: section; the
        serving default False avoids the ~7% remat-barrier forward cost)."""
        self.cfg = model_cfg_bank()(cfg_name)
        if model_args:
            # experiment-level overlay over the model bank entry (training
            # knobs like learn_logvar / l_elbo_weight / v_posterior — the
            # reference's experiment cfg `args` dict-update, cfg_helper.py:123-135)
            self.cfg = dict(self.cfg, args=dict(self.cfg["args"], **model_args))
        args = self.cfg["args"]
        self.dtype = dtype
        self.model = VDModel.from_config(self.cfg, dtype=dtype,
                                         use_checkpoint=use_checkpoint,
                                         remat_max_channels=remat_max_channels)
        self.sampler = DDIMSampler(self.model)

        self.vae: dict[str, Any] = {}
        for name, sub in args["vae_cfg_list"]:
            if name == "text" and not with_text_vae:
                continue
            self.vae[name] = build(sub, dtype=dtype)
        self.ctx: dict[str, Any] = {
            name: build(sub, dtype=dtype) for name, sub in args["ctx_cfg_list"]}

        self.params: dict[str, Any] = {"diffuser": None, "vae": {}, "ctx": {}}

    # ---- parameter management ----

    def init_random(self, seed: int = 0, image_size: int = 64):
        key = jax.random.PRNGKey(seed)
        kd, kv, kc1, kc2, kt = jax.random.split(key, 5)
        self.params["diffuser"] = self.model.init_params(kd)
        if "image" in self.vae:
            x = jnp.zeros((1, image_size, image_size, 3))
            self.params["vae"]["image"] = self.vae["image"].init(kv, x)["params"]
        if "text" in self.vae:
            self.params["vae"]["text"] = self.vae["text"].init_params(kt)
        if "image" in self.ctx:
            sz = self.ctx["image"].image_size
            px = jnp.zeros((1, sz, sz, 3))
            self.params["ctx"]["image"] = self.ctx["image"].init(kc1, px)["params"]
        if "text" in self.ctx:
            ids = jnp.zeros((1, self.ctx["text"].max_len), jnp.int32)
            self.params["ctx"]["text"] = self.ctx["text"].init(kc2, ids)["params"]
        return self

    def cast_params(self, dtype):
        """One-time param cast (serving): avoids per-call f32->bf16 weight
        conversion inside the sampling scan."""
        self.params = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if hasattr(a, "astype") else a, self.params)
        return self

    def enable_int8(self, image_size: int = 512, latent_downsample: int = 8,
                    n: int = 2, timesteps=(0, 250, 500, 750, 999),
                    seed: int = 0,
                    flows=(("image", "text"), ("image", "image"),
                           ("text", "image"), ("text", "text"))):
        """Switch the diffusers to the calibrated-int8 serving policy (the
        bench.py headline path: +41% at batch 8, quality table in PERF.md)
        through the production API.

        Sets the process-wide quant policy (read at trace time by every
        subsequent sampler jit), runs the activation-scale calibration pass
        over (noise, t, context) probes spanning the timestep range for
        each requested flow, and re-packs params["diffuser"] as
        {"params", "quant"} so the scales thread into the jits as arguments
        (VDModel._variables). Calibration contexts come from this system's
        own context encoders on random inputs; pass a trimmed `flows` tuple
        to calibrate a subset (scales merge by max across flows). Params
        must be loaded/initialized first.

        Scope: only DIFFUSER call sites quantize — context encoders and
        VAEs always run in the compute dtype (clip.py / optimus.py /
        autoencoder.py bind quant=False). A flow excluded from `flows`
        still runs its diffuser under int8 but with per-batch dynamic
        activation scales: slower (extra absmax pass) and batch-composition
        dependent — serve uncalibrated flows only for experiments.
        """
        from vdtpu.ops import quant
        if self.params["diffuser"] is None:
            raise RuntimeError("load or init params before enable_int8()")
        if isinstance(self.params["diffuser"], dict) \
                and "quant" in self.params["diffuser"]:
            return self  # already calibrated
        quant.set_policy("int8")
        key = jax.random.PRNGKey(seed)
        ctxs = {}
        for c_type in {c for _, c in flows}:
            enc = self.ctx[c_type]
            if c_type == "text":
                vocab = getattr(enc, "vocab_size", 49408)
                ids = jax.random.randint(key, (2 * n, enc.max_len), 0, vocab)
                ctxs["text"] = self.ctx_encode(ids, "text").astype(self.dtype)
            else:
                sz = enc.image_size
                px = jax.random.uniform(key, (2 * n, sz, sz, 3))
                ctxs["image"] = self.ctx_encode(px, "image").astype(self.dtype)
        d_cfgs = dict(self.model.diffuser.diffuser_cfgs)
        probes = []
        for x_type, c_type in flows:
            a = d_cfgs[x_type]["args"]
            if "in_channels" in a:  # 2-D flow: latent image
                s = image_size // latent_downsample
                shape = (2 * n, s, s, a["in_channels"])
            else:  # 0-D flow: latent vector
                shape = (2 * n, a["input_channels"])
            for i, tt in enumerate(timesteps):
                probes.append((
                    jax.random.normal(jax.random.fold_in(key, 7000 + i),
                                      shape, self.dtype),
                    jnp.full((2 * n,), tt, jnp.int32),
                    ctxs[c_type], x_type, c_type))
        from vdtpu.ops.quant import calibrate
        scales = calibrate(self.model, self.params["diffuser"], probes)
        self.model.quant_scales = None  # thread as a jit argument instead
        self.params["diffuser"] = {"params": self.params["diffuser"],
                                   "quant": scales}
        return self

    def enable_tome(self, ratio: float = 0.5, min_tokens: int = 4096):
        """Switch on token merging (opt-in APPROXIMATE serving mode).

        Sets the process-wide ToMe policy (vdtpu/ops/tome.py — read at
        trace time by the transformer blocks; the sampler jit cache keys
        on it, so flows warmed before this call re-trace). ratio=0.5
        merges half the tokens at every self-attention site of at least
        `min_tokens` tokens (default: only the 64x64 latent maps, the
        ToMe-SD recipe). ratio=0 turns the mode off.

        Composes with enable_int8 (full-resolution calibration bounds
        remain valid upper bounds under merging — ops/tome.py docstring),
        dpmpp2m, encoder_reuse and cfg_interval. Quality/throughput table:
        PERF.md "Approximate-mode quality"."""
        from vdtpu.ops.tome import ToMeSpec, set_tome
        set_tome(ToMeSpec(ratio=float(ratio), min_tokens=int(min_tokens))
                 if ratio else None)
        return self

    # ---- CLIP feature helpers (evaluator plumbing: CLIP-sim / CLIP-FID) ----

    def clip_image_features(self, images) -> jnp.ndarray:
        """CLS-token projected embedding [B, 768] for metric computation."""
        z = self.ctx_encode(jnp.asarray(images), "image")
        return z[:, 0]

    def clip_text_features(self, token_ids) -> jnp.ndarray:
        """EOT-pooled projected embedding [B, 768]."""
        ids = jnp.asarray(token_ids)
        z = self.ctx_encode(ids, "text")
        eot = jnp.argmax(ids, axis=-1)
        return jnp.take_along_axis(z, eot[:, None, None], axis=1)[:, 0]

    def export_torch_checkpoint(self) -> dict:
        """Export every param tree back to the reference's flat state_dict
        scheme (inverse of load_torch_checkpoint) so checkpoints trained here
        load into the PyTorch reference."""
        from vdtpu.interop.torch_convert import flax_to_torch, vd_conv1x1_pred
        sd: dict = {}
        sd.update(flax_to_torch(self.params["diffuser"], prefix="diffuser.",
                                conv1x1_pred=vd_conv1x1_pred))
        for name, p in self.params["vae"].items():
            if name == "text":
                for tower in ("encoder", "decoder"):
                    part = flax_to_torch(p[tower], prefix=f"vae.text.{tower}.")
                    conv1d = (".attn.c_attn.weight", ".attn.c_proj.weight",
                              ".mlp.c_fc.weight", ".mlp.c_proj.weight")
                    part = {k: (v.T if k.endswith(conv1d) else v)
                            for k, v in part.items()}
                    sd.update(part)
            else:
                sd.update(flax_to_torch(p, prefix=f"vae.{name}."))
        for name, p in self.params["ctx"].items():
            sd.update(flax_to_torch(p, prefix=f"ctx.{name}.model."))
        return sd

    def load_torch_checkpoint(self, state_dict: Mapping[str, Any], strict: bool = False):
        """Load the published flat state_dict tree (`vd-four-flow-v1-0.pth`),
        key scheme per SURVEY.md section 3.5. Call after init_random (the
        templates define structure)."""
        self.params["diffuser"], m0 = torch_to_flax(
            state_dict, self.params["diffuser"], prefix="diffuser.", strict=strict)
        missing = list(m0)
        for name in self.params["vae"]:
            if name == "text":
                missing += self.vae[name].load_torch(state_dict, self.params["vae"],
                                                     prefix=f"vae.{name}.", strict=strict)
                continue
            self.params["vae"][name], m = torch_to_flax(
                state_dict, self.params["vae"][name], prefix=f"vae.{name}.", strict=strict)
            missing += m
        for name in self.params["ctx"]:
            self.params["ctx"][name], m = torch_to_flax(
                state_dict, self.params["ctx"][name], prefix=f"ctx.{name}.model.", strict=strict)
            missing += m
        return missing

    def load_vdtpu_checkpoint(self, ckpt_dir: str, tag: str | None = None,
                              use_ema: bool = True, ctx_slot: str = "text"):
        """Serve weights trained by vdtpu's own Trainer (orbax layout:
        params + opt_state + EMA + step, training/checkpoints.py).

        use_ema prefers the EMA shadow when the run kept one — the reference
        samples under ema_scope (vd.py:188-198), so EMA weights are the
        production serving set — and falls back to the raw params otherwise.
        Checkpoints from the ctx_encode_trainable path ({'diffuser','ctx'}
        param layout, harness.make_loss_fn) restore the fine-tuned context
        encoder into ``self.params['ctx'][ctx_slot]`` too. Returns the tag
        actually loaded.
        """
        from vdtpu.training.checkpoints import latest_tag, restore_checkpoint
        if tag is None:
            tag = latest_tag(ckpt_dir)
        payload = restore_checkpoint(ckpt_dir, tag)
        ema = payload.get("ema")
        # runs without EMA persist ema=None (orbax may surface it as an
        # empty container): fall back to the raw params
        src = ema["shadow"] if (use_ema and isinstance(ema, Mapping)
                                and ema.get("shadow") is not None) \
            else payload["params"]
        if isinstance(src, Mapping) and set(src) >= {"diffuser"}:
            diff, ctx = src["diffuser"], src.get("ctx")
        else:
            diff, ctx = src, None
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a).astype(self.dtype)
            if hasattr(a, "astype") else a, t)
        self.params["diffuser"] = cast(diff)
        if ctx is not None:
            self.params["ctx"][ctx_slot] = cast(ctx)
        return tag

    # ---- stage wrappers (jitted) ----

    @functools.cached_property
    def _ctx_encode_text(self):
        return jax.jit(lambda p, ids: self.ctx["text"].apply({"params": p}, ids))

    @functools.cached_property
    def _ctx_encode_image(self):
        return jax.jit(lambda p, px: self.ctx["image"].apply({"params": p}, px))

    @functools.cached_property
    def _ctx_encode_image_masked(self):
        return jax.jit(lambda p, px, tm: self.ctx["image"].apply({"params": p}, px, tm))

    @functools.cached_property
    def _vae_decode_image(self):
        from vdtpu.models.autoencoder import AutoencoderKL
        return jax.jit(lambda p, z: self.vae["image"].apply(
            {"params": p}, z, method=AutoencoderKL.decode))

    @functools.cached_property
    def _vae_encode_image(self):
        from vdtpu.models.autoencoder import AutoencoderKL
        return jax.jit(lambda p, x: self.vae["image"].apply(
            {"params": p}, x, method=AutoencoderKL.encode))

    def ctx_encode(self, x, which: str, masks=None):
        """vd.py:300-305 equivalent."""
        p = self.params["ctx"][which]
        if which == "text":
            return self._ctx_encode_text(p, jnp.asarray(x))
        sz = self.ctx["image"].image_size
        # always through the processor: resize/crop when needed, CLIP
        # mean/std normalization unconditionally (ref clip.py:88-94)
        px = preprocess_images(jnp.asarray(x), sz)
        if masks is None:
            return self._ctx_encode_image(p, px)
        m = jnp.asarray(masks, jnp.float32)
        if m.shape[1:3] != (sz, sz):  # bilinear to encoder res (ref clip.py:109)
            m = jax.image.resize(m, (m.shape[0], sz, sz, m.shape[3]), "bilinear")
        tm = vision_token_mask(m, patch=self.ctx["image"].patch)
        return self._ctx_encode_image_masked(p, px, tm)

    def vae_encode(self, x, which: str):
        z = self._vae_encode_image(self.params["vae"]["image"], jnp.asarray(x)) \
            if which == "image" else self.vae["text"].encode(self.params["vae"]["text"], x)
        return self.model.scale_latent(z, which)

    def vae_decode(self, z, which: str, **kw):
        z = self.model.unscale_latent(z, which)
        if which == "image":
            return self._vae_decode_image(self.params["vae"]["image"], z)
        return self.vae["text"].decode(self.params["vae"]["text"], z, **kw)


class VDInference:
    """Flow-level API mirroring `vd_inference` (app.py:244-579)."""

    def __init__(self, system: VDSystem,
                 text_tokenizer: Callable[[Sequence[str]], np.ndarray] | None = None,
                 output_dim=(512, 512), ddim_steps=50, ddim_eta=0.0,
                 n_sample_image=2, n_sample_text=4,
                 image_latent_dim=4, text_latent_dim=768,
                 latent_downsample=8, mesh=None, encoder_reuse=None,
                 sampler="ddim", cfg_interval=None):
        self.sys = system
        # batch-parallel serving: with a mesh, conditioning tensors are
        # placed batch-sharded over the dp axis and every downstream op
        # (the 50-step scan included) partitions across chips via SPMD
        self.mesh = mesh
        self.tokenizer = text_tokenizer
        self.output_dim = tuple(output_dim)
        self.ddim_steps = ddim_steps
        self.ddim_eta = ddim_eta
        self.n_sample_image = n_sample_image
        self.n_sample_text = n_sample_text
        self.scale_textto = 7.5
        self.scale_imgto = 7.5
        self.image_latent_dim = image_latent_dim
        self.text_latent_dim = text_latent_dim
        self.latent_downsample = latent_downsample
        self.text_temperature = 1.0
        # opt-in APPROXIMATE serving mode (Faster Diffusion encoder reuse,
        # sampling/ddim.py): int interval or {"interval","warmup"}; None =
        # the exact DDIM path (default). Applies to single-context flows.
        self.encoder_reuse = encoder_reuse
        # "ddim" (reference algorithm) or "dpmpp2m" (sampling/dpmpp.py):
        # second-order deterministic solver — DDIM-50-class quality at
        # ~20 steps; pair with ddim_steps=20 and ddim_eta=0
        self.sampler = sampler
        # opt-in APPROXIMATE mode (limited-interval guidance, arXiv
        # 2404.07724): (lo, hi) trajectory fractions where CFG is active;
        # outside them the UNet runs at half batch. None = full CFG.
        self.cfg_interval = cfg_interval
        self.adjust_rank_f = AdjustRank(max_drop_rank=(1, 5), q=20)
        self.disentanglement_noglobal = True

    # ---- helpers ----

    def _encode_text(self, texts: Sequence[str]):
        if self.tokenizer is None:
            raise RuntimeError("no CLIP tokenizer configured; pass token ids "
                               "or construct VDInference with text_tokenizer")
        ids = np.asarray(self.tokenizer(list(texts)))
        return self.sys.ctx_encode(ids, "text")

    def _focus_filter(self, ci, fcs_lvl: float):
        """adjust_rank on local tokens, global CLS preserved (app.py:338-344)."""
        if self.disentanglement_noglobal:
            glb, loc = ci[:, 0:1], ci[:, 1:]
            return jnp.concatenate([glb, self.adjust_rank_f(loc, fcs_lvl)], axis=1)
        return self.adjust_rank_f(ci, fcs_lvl)

    def _image_shape(self, n):
        h, w = self.output_dim
        f = self.latent_downsample
        return (n, h // f, w // f, self.image_latent_dim)

    def _regularize(self, image, method: str = "bicubic"):
        """Input regularization to output_dim (reference app.py:329-330)."""
        return regularize_image(image, self.output_dim, method)

    def _shard_batch(self, c_info):
        if self.mesh is None:
            return c_info
        from vdtpu.parallel.mesh import batch_sharding
        bs = batch_sharding(self.mesh)
        out = dict(c_info)
        for k in ("conditioning", "unconditional_conditioning"):
            if out.get(k) is not None:
                out[k] = jax.device_put(jnp.asarray(out[k]), bs)
        return out

    def _sample(self, key, shape, x_info, c_info):
        c_info = self._shard_batch(c_info)
        return self.sys.sampler.sample(
            self.sys.params["diffuser"], key, self.ddim_steps, shape,
            x_info, c_info, eta=self.ddim_eta, dtype=self.sys.dtype,
            encoder_reuse=self.encoder_reuse, method=self.sampler,
            cfg_interval=self.cfg_interval)

    def _sample_multi(self, key, shape, x_info, c_info_list):
        c_info_list = [self._shard_batch(ci) for ci in c_info_list]
        return self.sys.sampler.sample_multicontext(
            self.sys.params["diffuser"], key, self.ddim_steps, shape,
            x_info, c_info_list, eta=self.ddim_eta, dtype=self.sys.dtype,
            encoder_reuse=self.encoder_reuse, method=self.sampler,
            cfg_interval=self.cfg_interval)

    def _decode_texts(self, x, key) -> list[str]:
        txts = self.sys.vae_decode(x, "text", temperature=self.text_temperature,
                                   rng=key)
        return [remove_duplicate_word(t) for t in txts]

    # ---- flows (app.py:300-579) ----

    def inference_t2i(self, text: str, seed: int):
        n = self.n_sample_image
        u = jnp.tile(self._encode_text([""]), (n, 1, 1))
        c = jnp.tile(self._encode_text([text]), (n, 1, 1))
        key = jax.random.PRNGKey(seed)
        x = self._sample(key, self._image_shape(n), {"type": "image"},
                         {"type": "text", "conditioning": c,
                          "unconditional_conditioning": u,
                          "unconditional_guidance_scale": self.scale_textto})
        return self.sys.vae_decode(x, "image")

    def inference_i2i(self, image, fid_lvl: float, fcs_lvl: float,
                      clr_adj: str | None, seed: int):
        """image: [1,H,W,3] float [0,1] NHWC, any H,W — bicubic-resized to
        output_dim first (app.py:322-382; resize precedes the fid_lvl=1
        short-circuit, so that path returns the RESIZED image)."""
        n = self.n_sample_image
        cx = self._regularize(image)
        if fid_lvl == 1:
            return jnp.tile(cx, (n, 1, 1, 1))
        ci = self.sys.ctx_encode(cx, "image")
        c = jnp.tile(self._focus_filter(ci, fcs_lvl), (n, 1, 1))
        u = jnp.zeros_like(c)
        key = jax.random.PRNGKey(seed)
        x_info = {"type": "image"}
        if fid_lvl != 0:
            x0 = jnp.tile(self.sys.vae_encode(cx, "image"), (n, 1, 1, 1))
            x_info = {"type": "image", "x0": x0,
                      "x0_forward_timesteps": int(self.ddim_steps * (1 - fid_lvl))}
        x = self._sample(key, self._image_shape(n), x_info,
                         {"type": "image", "conditioning": c,
                          "unconditional_conditioning": u,
                          "unconditional_guidance_scale": self.scale_imgto})
        out = self.sys.vae_decode(x, "image")
        if clr_adj == "Simple":
            out = color_adjust_simple(out, cx)
        return out

    def inference_i2t(self, image, seed: int):
        n = self.n_sample_text
        cx = self._regularize(image)  # app.py:392 (bicubic to output_dim)
        c = jnp.tile(self.sys.ctx_encode(cx, "image"), (n, 1, 1))
        u = jnp.tile(self.sys.ctx_encode(jnp.zeros_like(cx), "image"), (n, 1, 1))
        key = jax.random.PRNGKey(seed)
        x = self._sample(key, (n, self.text_latent_dim), {"type": "text"},
                         {"type": "image", "conditioning": c,
                          "unconditional_conditioning": u,
                          "unconditional_guidance_scale": self.scale_imgto})
        return self._decode_texts(x, jax.random.fold_in(key, 1))

    def inference_t2t(self, text: str, seed: int):
        n = self.n_sample_text
        u = jnp.tile(self._encode_text([""]), (n, 1, 1))
        c = jnp.tile(self._encode_text([text]), (n, 1, 1))
        key = jax.random.PRNGKey(seed)
        x = self._sample(key, (n, self.text_latent_dim), {"type": "text"},
                         {"type": "text", "conditioning": c,
                          "unconditional_conditioning": u,
                          "unconditional_guidance_scale": self.scale_textto})
        return self._decode_texts(x, jax.random.fold_in(key, 1))

    def inference_dcg(self, image, fcs_lvl: float, text: str,
                      textstrength: float, seed: int):
        """Dual-context (app.py:436-492)."""
        return self.inference_mcg(
            [{"image": image, "strength": 1.0, "fcs_lvl": fcs_lvl}],
            text=text, textstrength=textstrength, seed=seed)[1]

    def inference_tcg(self, image_ctxs, text, textstrength, seed):
        """Triple-context = mcg limited to two images (app.py:494-498)."""
        return self.inference_mcg(image_ctxs[:2], text, textstrength, seed)

    def inference_mcg(self, image_ctxs: Sequence[Mapping[str, Any]],
                      text: str | None, textstrength: float, seed: int):
        """Multi-context blend (app.py:500-579). Each image ctx:
        {image: [1,H,W,3], strength, fcs_lvl, mask: optional [1,H,W,1]}."""
        n = self.n_sample_image
        inputs_shown, c_info_list = self._mcg_context(
            image_ctxs, text, textstrength, n)
        key = jax.random.PRNGKey(seed)
        x = self._sample_multi(key, self._image_shape(n), {"type": "image"}, c_info_list)
        return inputs_shown, self.sys.vae_decode(x, "image")

    def _mcg_context(self, image_ctxs: Sequence[Mapping[str, Any]],
                     text: str | None, textstrength: float, n: int):
        """(inputs_shown, c_info_list) for a multi-context request with the
        conditioning tiled to ``n`` rows. Split out of inference_mcg so the
        serving queue can build per-request single-row conditionings and
        stack them into one multicontext batch (serving/queue.py)."""
        c_info_list = []
        if text and textstrength != 0:
            ut = jnp.tile(self._encode_text([""]), (n, 1, 1))
            ct = jnp.tile(self._encode_text([text]), (n, 1, 1))
            scale = self.scale_imgto * (1 - textstrength) + self.scale_textto * textstrength
            c_info_list.append({
                "type": "text", "conditioning": ct,
                "unconditional_conditioning": ut,
                "unconditional_guidance_scale": scale, "ratio": textstrength})
        else:
            scale, textstrength = self.scale_imgto, 0.0

        inputs_shown, imc = [], []
        for ctx in image_ctxs:
            if ctx is None or ctx.get("image") is None:
                continue
            cx = self._regularize(ctx["image"])  # app.py:534/:460 bicubic
            mask = ctx.get("mask")
            if mask is not None:
                # masks ride bilinear to output_dim (app.py:536)
                m = 1.0 - self._regularize(jnp.asarray(mask), "bilinear")
                inputs_shown.append(cx * m)
                ci = self.sys.ctx_encode(cx, "image", masks=m)
            else:
                inputs_shown.append(cx)
                ci = self.sys.ctx_encode(cx, "image")
            ci = jnp.tile(self._focus_filter(ci, ctx.get("fcs_lvl", 0.5)), (n, 1, 1))
            imc.append(ci * ctx.get("strength", 1.0))
        cis = jnp.concatenate(imc, axis=1)
        c_info_list.append({
            "type": "image", "conditioning": cis,
            "unconditional_conditioning": jnp.zeros_like(cis),
            "unconditional_guidance_scale": scale, "ratio": 1 - textstrength})
        return inputs_shown, c_info_list
