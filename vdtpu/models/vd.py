"""Versatile-Diffusion orchestrator: multi-flow diffuser + system wrapper.

Capability parity with `VD_v2_0` (`/root/reference/lib/model_zoo/vd.py:41-455`):
dicts of VAEs / context encoders / diffusers, schedule registration, per-flow
``apply_model`` threading latents through data blocks of one diffuser and
context blocks of another, multi-context ratio mixing, training losses.

TPU-first re-design:
- The runtime interpreter over ModuleLists becomes a static program walk
  inside one linen module (`MultiDiffuser`); each (x_type, c_type) flow is a
  separately traced/jitted pure function.
- VAEs and context encoders are separate top-level modules with their own
  param trees (they are frozen at diffusion-training time and live in
  different precision policies); `VDSystem` wires everything together.
- Randomness (q_sample noise, timestep draws) comes in via explicit PRNG keys.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from vdtpu.config.registry import build, register
from vdtpu.models.layers import Dtype
from vdtpu.models.unet import UNetBase
from vdtpu.ops.schedules import DiffusionSchedule, extract


class MultiDiffuser(nn.Module):
    """Holds the named diffusers; methods implement the flow walks.

    Param tree: {"<name>": <unet params>} — torch prefix ``diffuser.<name>.``.
    """
    diffuser_cfgs: Sequence[tuple[str, Mapping[str, Any]]]  # ((name, cfg), ...)
    global_layer_ptr: str | None = None
    dtype: Dtype = jnp.float32
    use_checkpoint: bool | None = None  # None = per-config; False for serving
    remat_max_channels: int | None = None  # remat only blocks <= this width

    def setup(self):
        unets = {}
        for name, cfg in self.diffuser_cfgs:
            over = ({} if self.use_checkpoint is None
                    else {"use_checkpoint": self.use_checkpoint})
            if self.remat_max_channels is not None:
                over["remat_max_channels"] = self.remat_max_channels
            unets[name] = build(cfg, dtype=self.dtype, name=name, **over)
        self.unets = unets
        orders = [u.program.layer_order for u in unets.values()]
        if any(o != orders[0] for o in orders[1:]):
            raise ValueError("diffuser layer programs are not aligned "
                             "(check_diffuser contract, vd.py:313-320)")

    def _emb(self, timesteps, x_dtype, x_type: str):
        ptr = self.global_layer_ptr or x_type
        return self.unets[ptr].time_embedding(timesteps, x_dtype)

    def apply_flow(self, x, timesteps, context, x_type: str, c_type: str):
        """vd.py:330-381 — data blocks from x_type, context blocks from c_type."""
        emb = self._emb(timesteps, x.dtype, x_type)
        host = self.unets[x_type]
        return host.walk(x, emb, context, host, self.unets[c_type])

    def apply_flow_encoder(self, x, timesteps, context, x_type: str, c_type: str):
        """Encoder half only — used to shape/seed the encoder-reuse cache."""
        emb = self._emb(timesteps, x.dtype, x_type)
        host = self.unets[x_type]
        return host.walk_encoder(x, emb, context, host, self.unets[c_type])

    def apply_flow_encreuse(self, x, timesteps, context, x_type: str,
                            c_type: str, cache, use_cache):
        """apply_flow with encoder-feature reuse (Faster Diffusion,
        arXiv 2312.09608): on reuse steps (`use_cache` true) the encoder half
        is skipped and the previous key step's (h, skips) drive the decoder
        at the CURRENT timestep embedding. Approximate serving mode — the
        exact path stays `apply_flow`; quality gate in tests/test_encreuse.py
        and PERF.md. Returns (eps, cache)."""
        emb = self._emb(timesteps, x.dtype, x_type)
        host = self.unets[x_type]
        ctx_host = self.unets[c_type]

        def compute(x, emb, context, cache):
            h, hs = host.walk_encoder(x, emb, context, host, ctx_host)
            return (h, hs)

        def reuse(x, emb, context, cache):
            return cache

        # both branches are pure reads of bound variables (no sow: the int8
        # calibration pass never runs through this method), so a plain
        # lax.cond is safe inside linen apply
        cache = jax.lax.cond(use_cache, reuse, compute, x, emb, context, cache)
        h, hs = cache
        out = host.walk_decoder(h, hs, emb, context, host, ctx_host)
        return out, cache

    def apply_flow_multicontext(
            self, x, timesteps, contexts, ratios, x_type: str,
            c_types: Sequence[str], mixing_type: str = "attention",
            layer_choices=None):
        """vd.py:404-455. 'attention' mixing: at every context slot run each
        context's block stack and ratio-blend the outputs. 'layer' mixing:
        per slot, one context is selected (the reference samples
        npr.choice(p=ratios) per slot, vd.py:397-402) — pass the sampled
        indices as `layer_choices` [num_c_slots] int array (traced
        lax.switch; no retrace per draw).

        contexts: list of [B, M_i, D] arrays; ratios: [num_ctx] (normalized
        here); c_types: the diffuser whose context blocks serve each context.
        """
        emb = self._emb(timesteps, x.dtype, x_type)
        host = self.unets[x_type]
        h, _ = self._mc_run_tokens(
            host.program.layer_order, x, [], emb, contexts, ratios, host,
            c_types, mixing_type, layer_choices)
        return h

    def _mc_run_tokens(self, tokens, h, hs, emb, contexts, ratios, host,
                       c_types, mixing_type, layer_choices, di=0, ci=0):
        """Token walk with context mixing at every 'c' slot (the multicontext
        analogue of UNetBase._run_tokens, so the walk can be split at the
        encoder boundary for the encoder-reuse serving mode)."""
        from vdtpu.ops import tome
        tome.begin_walk()  # per-(sub)walk ToMe assignment reuse (ops/tome.py)
        try:
            return self._mc_run_tokens_inner(
                tokens, h, hs, emb, contexts, ratios, host, c_types,
                mixing_type, layer_choices, di, ci)
        finally:
            tome.end_walk()

    def _mc_run_tokens_inner(self, tokens, h, hs, emb, contexts, ratios,
                             host, c_types, mixing_type, layer_choices,
                             di=0, ci=0):
        r = jnp.asarray(ratios, dtype=jnp.float32)
        r = r / jnp.sum(r)
        hs = list(hs)
        for token in tokens:
            if token == "d":
                h = host.run_data(di, h, emb)
                di += 1
            elif token == "c":
                if mixing_type == "attention":
                    mixed = None
                    for idx, (ctx, ct) in enumerate(zip(contexts, c_types)):
                        hi = self.unets[ct].run_context(
                            ci, h, ctx, tokenizer=host) * r[idx].astype(h.dtype)
                        mixed = hi if mixed is None else mixed + hi
                    h = mixed
                elif mixing_type == "layer":
                    # one-hot select of the per-slot sampled context (output
                    # identical to the reference's branch pick; all branches
                    # are computed and masked — jit-stable across draws)
                    sel = jax.nn.one_hot(layer_choices[ci], len(contexts),
                                         dtype=h.dtype)
                    mixed = None
                    for idx, (ctx, ct) in enumerate(zip(contexts, c_types)):
                        hi = self.unets[ct].run_context(
                            ci, h, ctx, tokenizer=host) * sel[idx]
                        mixed = hi if mixed is None else mixed + hi
                    h = mixed
                else:
                    raise ValueError(mixing_type)
                ci += 1
            elif token == "save":
                hs.append(h)
            elif token == "load":
                h = jnp.concatenate([h, hs.pop()], axis=-1)
        return h, hs

    def apply_flow_multicontext_encoder(
            self, x, timesteps, contexts, ratios, x_type: str,
            c_types: Sequence[str], mixing_type: str = "attention",
            layer_choices=None):
        """Encoder half of the multicontext walk (cache for encoder reuse)."""
        emb = self._emb(timesteps, x.dtype, x_type)
        host = self.unets[x_type]
        h, hs = self._mc_run_tokens(
            host.program.i_order, x, [], emb, contexts, ratios, host,
            c_types, mixing_type, layer_choices)
        return h, tuple(hs)

    def apply_flow_multicontext_encreuse(
            self, x, timesteps, contexts, ratios, x_type: str,
            c_types: Sequence[str], cache, use_cache,
            mixing_type: str = "attention", layer_choices=None):
        """Multicontext walk with encoder-feature reuse — the same
        Faster-Diffusion contract as apply_flow_encreuse, mixing included
        in both halves. Returns (eps, cache)."""
        emb = self._emb(timesteps, x.dtype, x_type)
        host = self.unets[x_type]

        def compute(x, emb, contexts, cache):
            h, hs = self._mc_run_tokens(
                host.program.i_order, x, [], emb, contexts, ratios, host,
                c_types, mixing_type, layer_choices)
            return (h, tuple(hs))

        def reuse(x, emb, contexts, cache):
            return cache

        cache = jax.lax.cond(use_cache, reuse, compute, x, emb, contexts, cache)
        h, hs = cache
        di, ci = host._encoder_counts()
        h, _ = self._mc_run_tokens(
            host.program.m_order + host.program.o_order, h, list(hs), emb,
            contexts, ratios, host, c_types, mixing_type, layer_choices,
            di=di, ci=ci)
        return h, cache

    def __call__(self, inputs: Mapping[str, Any], timesteps):
        """Init-only path: walks every diffuser standalone so all params
        (data + context + global) of every flow get created."""
        outs = {}
        for name, unet in self.unets.items():
            x = inputs[name]["x"]
            ctx = inputs[name]["context"]
            emb = self._emb(timesteps, x.dtype, name)
            outs[name] = unet.walk(x, emb, ctx, unet, unet)
        return outs


@dataclasses.dataclass
class VDModel:
    """The four-flow model: diffusers + schedule + latent scaling + losses.

    This is the TPU-native equivalent of the reference's top-level module;
    VAEs/context encoders are attached by `VDSystem` (vdtpu/serving/api.py).
    """
    diffuser: MultiDiffuser
    schedule: DiffusionSchedule
    latent_scale_factor: Mapping[str, float]
    parameterization: str = "eps"
    loss_type: str = "l2"
    l_simple_weight: float = 1.0
    l_elbo_weight: float = 0.0
    learn_logvar: bool = False
    logvar_init: float = 0.0
    use_ema: bool = False
    # calibrated int8 activation scales ('quant' collection); set by
    # vdtpu.ops.quant.calibrate under the int8 serving policy
    quant_scales: Any = None

    # ---- construction ----

    @classmethod
    def from_config(cls, cfg: Mapping[str, Any], dtype=jnp.float32,
                    use_checkpoint: bool | None = None,
                    remat_max_channels: int | None = None) -> "VDModel":
        """use_checkpoint overrides the per-diffuser config flag: pass False
        for serving (remat barriers cost ~7% forward time), True/None for
        training (activation rematerialization). remat_max_channels limits
        remat to blocks <= that width (selective remat: the high-res levels
        hold ~85% of activation bytes; see UNetBase._remat)."""
        args = cfg["args"]
        diffuser = MultiDiffuser(
            diffuser_cfgs=tuple((n, c) for n, c in args["diffuser_cfg_list"]),
            global_layer_ptr=args.get("global_layer_ptr"),
            dtype=dtype, use_checkpoint=use_checkpoint,
            remat_max_channels=remat_max_channels)
        schedule = DiffusionSchedule.create(
            timesteps=args.get("timesteps", 1000),
            beta_schedule=args.get("beta_schedule", "linear"),
            linear_start=args.get("beta_linear_start", 1e-4),
            linear_end=args.get("beta_linear_end", 2e-2),
            v_posterior=args.get("v_posterior", 0.0),
            parameterization=args.get("parameterization", "eps"))
        return cls(
            diffuser=diffuser,
            schedule=schedule,
            latent_scale_factor=args.get("latent_scale_factor") or {},
            parameterization=args.get("parameterization", "eps"),
            loss_type=args.get("loss_type", "l2"),
            l_simple_weight=args.get("l_simple_weight", 1.0),
            l_elbo_weight=args.get("l_elbo_weight", 0.0),
            learn_logvar=args.get("learn_logvar", False),
            logvar_init=args.get("logvar_init", 0.0),
            use_ema=args.get("use_ema", False))

    def init_params(self, rng, shapes: Mapping[str, tuple] | None = None,
                    jit: bool = True):
        """Initialize every diffuser's full param tree on tiny dummy shapes.

        jit=True compiles the init once instead of dispatching thousands of
        individual ops (54s vs ~8min through a remote-device tunnel).
        """
        inputs = {}
        for name, cfg in self.diffuser.diffuser_cfgs:
            args = cfg["args"]
            if shapes and name in shapes:
                xshape = shapes[name]
            elif "in_channels" in args:  # 2-D stream
                xshape = (1, 8, 8, args["in_channels"])
            else:  # 0-D stream
                xshape = (1, args["input_channels"])
            ctx = jnp.zeros((1, 4, args.get("context_dim", 768)), jnp.float32)
            inputs[name] = {"x": jnp.zeros(xshape, jnp.float32), "context": ctx}
        t = jnp.zeros((1,), jnp.int32)
        init = jax.jit(self.diffuser.init) if jit else self.diffuser.init
        params = init(rng, inputs, t)["params"]
        if self.learn_logvar:
            # learnable per-timestep logvar vector (ref vd.py:101-103:
            # nn.Parameter of size [num_timesteps] when learn_logvar)
            params = dict(params)
            params["logvar"] = jnp.full(
                (self.schedule.num_timesteps,), self.logvar_init, jnp.float32)
        return params

    # ---- inference ----

    def apply_model(self, params, x, timesteps, context, x_type: str, c_type: str):
        return self.diffuser.apply(
            self._variables(params), x, timesteps, context, x_type, c_type,
            method=MultiDiffuser.apply_flow)

    def _variables(self, params):
        # "packed params" {"params": tree, "quant": scales} thread the int8
        # tables as jit ARGUMENTS (as closure constants they become HLO
        # literals — ~0.9 GB of them stalled compilation, PERF.md r2)
        if isinstance(params, dict) and "quant" in params and "params" in params:
            return {"params": self._diffuser_params(params["params"]),
                    "quant": params["quant"]}
        v = {"params": self._diffuser_params(params)}
        if self.quant_scales is not None:
            v["quant"] = self.quant_scales
        return v

    @staticmethod
    def _diffuser_params(params):
        """Strip non-module leaves (the learnable logvar) from the tree the
        linen diffuser sees."""
        return {k: v for k, v in params.items() if k != "logvar"} \
            if "logvar" in params else params

    def apply_model_encoder(self, params, x, timesteps, context,
                            x_type: str, c_type: str):
        """Encoder-half apply (cache shapes/values for encoder reuse)."""
        return self.diffuser.apply(
            self._variables(params), x, timesteps, context, x_type, c_type,
            method=MultiDiffuser.apply_flow_encoder)

    def apply_model_encreuse(self, params, x, timesteps, context,
                             x_type: str, c_type: str, cache, use_cache):
        """apply_model with encoder-feature reuse (see apply_flow_encreuse)."""
        return self.diffuser.apply(
            self._variables(params), x, timesteps, context, x_type, c_type,
            cache, use_cache, method=MultiDiffuser.apply_flow_encreuse)

    def apply_model_multicontext(self, params, x, timesteps, contexts, ratios,
                                 x_type: str, c_types: Sequence[str],
                                 mixing_type: str = "attention",
                                 layer_choices=None):
        return self.diffuser.apply(
            self._variables(params), x, timesteps, contexts,
            ratios, x_type, c_types, mixing_type, layer_choices,
            method=MultiDiffuser.apply_flow_multicontext)

    def apply_model_multicontext_encoder(
            self, params, x, timesteps, contexts, ratios, x_type: str,
            c_types: Sequence[str], mixing_type: str = "attention",
            layer_choices=None):
        """Encoder-half multicontext apply (encoder-reuse cache shapes)."""
        return self.diffuser.apply(
            self._variables(params), x, timesteps, contexts,
            ratios, x_type, c_types, mixing_type, layer_choices,
            method=MultiDiffuser.apply_flow_multicontext_encoder)

    def apply_model_multicontext_encreuse(
            self, params, x, timesteps, contexts, ratios, x_type: str,
            c_types: Sequence[str], cache, use_cache,
            mixing_type: str = "attention", layer_choices=None):
        """Multicontext apply with encoder-feature reuse ((eps, cache))."""
        return self.diffuser.apply(
            self._variables(params), x, timesteps, contexts,
            ratios, x_type, c_types, cache, use_cache, mixing_type,
            layer_choices,
            method=MultiDiffuser.apply_flow_multicontext_encreuse)

    def num_context_slots(self, x_type: str = "image") -> int:
        """Context-layer slot count of a diffuser's program."""
        from vdtpu.models.unet import build_program_0d, build_program_2d
        cfg = dict(self.diffuser.diffuser_cfgs)[x_type]
        a = cfg["args"]
        if "in_channels" in a:
            prog = build_program_2d(
                a["in_channels"], a["model_channels"], a["out_channels"],
                list(a["num_res_blocks"]), list(a["attention_resolutions"]),
                list(a["channel_mult"]), a.get("num_heads"),
                a.get("num_head_channels"))
        else:
            prog = build_program_0d(
                a["input_channels"], a["model_channels"], a["output_channels"],
                list(a["num_noattn_blocks"]), list(a["channel_mult"]),
                list(a["second_dim"]), list(a["with_attn"]),
                a.get("num_heads"), a.get("num_head_channels"))
        return len(prog.ctx)

    def sample_layer_choices(self, rng, ratios, x_type: str = "image"):
        """Per-context-slot categorical draws from the (normalized) ratios —
        the host-side equivalent of the reference's npr.choice per slot
        (vd.py:397-399), for mixing_type='layer'."""
        n_slots = self.num_context_slots(x_type)
        r = jnp.asarray(ratios, jnp.float32)
        r = r / r.sum()
        logits = jnp.broadcast_to(jnp.log(r), (n_slots, r.shape[0]))
        return jax.random.categorical(rng, logits, axis=-1)

    def scale_latent(self, z, which: str):
        s = self.latent_scale_factor.get(which)
        return z if s is None else z * s

    def unscale_latent(self, z, which: str):
        s = self.latent_scale_factor.get(which)
        return z if s is None else z / s

    # ---- training ----

    def q_sample(self, x_start, t, noise):
        return self.schedule.q_sample(x_start, t, noise)

    def get_loss(self, pred, target):
        if self.loss_type == "l1":
            return jnp.abs(target - pred)
        if self.loss_type == "l2":
            return (target - pred) ** 2
        raise NotImplementedError(self.loss_type)

    def p_losses(self, params, x, t, context, x_type: str, c_type: str, noise):
        """eps/x0-parameterized diffusion loss (ref vd.py:246-280):

        loss = l_simple_weight * mean(loss_simple / exp(logvar_t) + logvar_t)
             + l_elbo_weight * mean(lvlb_weights[t] * loss_simple)

        logvar_t comes from the learnable params["logvar"] vector when
        learn_logvar (ref :101-103, :264-273), else the constant logvar_init.
        NOTE: the reference declares l_elbo_weight but never applies it
        (vd.py:274-277 computes loss_vlb into the dict only — dropping the
        `loss += original_elbo_weight * loss_vlb` of the LDM lineage); here
        the declared semantics are implemented, and the default
        l_elbo_weight=0 reproduces the reference's effective behavior.
        """
        x_noisy = self.q_sample(x, t, noise)
        model_out = self.apply_model(params, x_noisy, t, context, x_type, c_type)
        target = x if self.parameterization == "x0" else noise
        bsz = model_out.shape[0]
        per_ex = self.get_loss(model_out, target).reshape(bsz, -1).mean(-1)
        loss_simple = per_ex.mean()
        if self.learn_logvar:
            logvar_t = params["logvar"][t]
        else:
            logvar_t = jnp.full_like(per_ex, self.logvar_init)
        gamma = per_ex / jnp.exp(logvar_t) + logvar_t
        lvlb = (extract(self.schedule.lvlb_weights, t, 1) * per_ex).mean()
        loss = self.l_simple_weight * gamma.mean() + self.l_elbo_weight * lvlb
        aux = {"loss_simple": loss_simple, "loss_vlb": lvlb, "Loss": loss}
        if self.learn_logvar:
            aux["loss_gamma"] = gamma.mean()
            aux["logvar"] = params["logvar"].mean()
        return loss, aux


@register("vd_v2_0")
def build_vd(**args):
    return VDModel.from_config({"args": args})
