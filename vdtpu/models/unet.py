"""Multi-flow UNet diffusers: 2-D (image latent) and 0-D (text latent).

Capability parity with the reference `UNetModel2D_Next` / `UNetModel0D_Next`
(`/root/reference/lib/model_zoo/openaimodel.py:2575-2975`). The reference
builds three nn.ModuleLists plus i/m/o-order token lists and interprets them
at runtime; here the layer program is built once at construction as a static
Python structure (`UNetProgram`) that the traced forward walks — after jit
there is no interpreter left, only a fixed XLA graph. The same program object
drives checkpoint-key generation (construction-order replay, the "hard part"
flagged in SURVEY.md section 7).

Layout: 2-D stream is NHWC; 0-D stream is a flat channel-major [B, C*S]
feature vector equivalent to the torch [B, C, S, 1] view. Context layers are
token-based (`vdtpu.models.transformer.SpatialTransformer`).

The two diffusers emit identical layer-order token sequences (asserted by
`VDModel`), which is what makes data/context block mixing across diffusers
(`vd.py:330-381`) well-defined.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from vdtpu.config.registry import register
from vdtpu.models.blocks import FCBlock, ResBlock2D
from vdtpu.models.layers import (
    Dtype, Downsample2D, TimeEmbedMLP, Upsample2D, conv3, dense, group_norm, silu)
from vdtpu.models.transformer import SpatialTransformer
from vdtpu.ops.schedules import timestep_embedding

SAVE, LOAD, D, C = "save", "load", "d", "c"


@dataclasses.dataclass(frozen=True)
class DataSpec:
    name: str       # torch state-dict prefix, e.g. "data_blocks.3.0"
    kind: str       # conv_in|res|down|up|out | linear_in|fc|linear|out0d
    in_ch: int
    out_ch: int


@dataclasses.dataclass(frozen=True)
class CtxSpec:
    name: str
    channels: int
    heads: int
    dim_head: int


@dataclasses.dataclass(frozen=True)
class UNetProgram:
    data: tuple[DataSpec, ...]
    ctx: tuple[CtxSpec, ...]
    i_order: tuple[str, ...]
    m_order: tuple[str, ...]
    o_order: tuple[str, ...]

    @property
    def layer_order(self) -> tuple[str, ...]:
        return self.i_order + self.m_order + self.o_order


def _heads(ch: int, num_heads, num_head_channels) -> tuple[int, int]:
    if num_head_channels is None:
        return num_heads, ch // num_heads
    return ch // num_head_channels, num_head_channels


class _ProgramBuilder:
    def __init__(self, num_heads, num_head_channels):
        self.data: list[DataSpec] = []
        self.ctx: list[CtxSpec] = []
        self.order: list[str] = []
        self.num_heads = num_heads
        self.num_head_channels = num_head_channels

    def add_d(self, kind, in_ch, out_ch):
        self.data.append(DataSpec(f"data_blocks.{len(self.data)}.0", kind, in_ch, out_ch))
        self.order.append(D)

    def add_c(self, ch):
        h, dh = _heads(ch, self.num_heads, self.num_head_channels)
        self.ctx.append(CtxSpec(f"context_blocks.{len(self.ctx)}.0", ch, h, dh))
        self.order.append(C)

    def take_order(self):
        out, self.order = tuple(self.order), []
        return out


def build_program_2d(
    in_channels: int, model_channels: int, out_channels: int,
    num_res_blocks: Sequence[int], attention_resolutions: Sequence[int],
    channel_mult: Sequence[int], num_heads: int | None,
    num_head_channels: int | None = None,
) -> UNetProgram:
    """Replays the reference construction order (openaimodel.py:2664-2741)."""
    b = _ProgramBuilder(num_heads, num_head_channels)
    mc = model_channels
    b.add_d("conv_in", in_channels, mc)
    b.order.append(SAVE)
    chans = [mc]
    ch, ds = mc, 1
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks[level]):
            b.add_d("res", ch, mult * mc)
            ch = mult * mc
            if ds in attention_resolutions:
                b.add_c(ch)
            chans.append(ch)
            b.order.append(SAVE)
        if level != len(channel_mult) - 1:
            b.add_d("down", ch, ch)
            chans.append(ch)
            b.order.append(SAVE)
            ds *= 2
    i_order = b.take_order()

    b.add_d("res", ch, ch)
    b.add_c(ch)
    b.add_d("res", ch, ch)
    m_order = b.take_order()

    for level, mult in list(enumerate(channel_mult))[::-1]:
        for _ in range(num_res_blocks[level] + 1):
            b.order.append(LOAD)
            ich = chans.pop()
            b.add_d("res", ch + ich, mc * mult)
            ch = mc * mult
            if ds in attention_resolutions:
                b.add_c(ch)
        if level != 0:
            b.add_d("up", ch, ch)
            ds //= 2
    b.add_d("out", ch, out_channels)
    o_order = b.take_order()
    return UNetProgram(tuple(b.data), tuple(b.ctx), i_order, m_order, o_order)


def build_program_0d(
    input_channels: int, model_channels: int, output_channels: int,
    num_noattn_blocks: Sequence[int], channel_mult: Sequence[int],
    second_dim: Sequence[int], with_attn: Sequence[bool], num_heads: int | None,
    num_head_channels: int | None = None,
) -> UNetProgram:
    """Replays the 0-D construction order (openaimodel.py:2885-2963).

    in_ch/out_ch of fc/linear specs are FLAT feature sizes (C*S); ctx specs
    carry the channel count C (attention tokens are the S second-dim slots).
    """
    b = _ProgramBuilder(num_heads, num_head_channels)
    mc = model_channels
    sdim = second_dim[0]
    cur = (mc, sdim)  # (C, S)
    flat = lambda cs: cs[0] * cs[1]
    b.add_d("linear_in", input_channels, flat(cur))
    b.order.append(SAVE)
    chans = [cur]
    for level, (mult, sdim) in enumerate(zip(channel_mult, second_dim)):
        for _ in range(num_noattn_blocks[level]):
            nxt = (mult * mc, sdim)
            b.add_d("fc", flat(cur), flat(nxt))
            cur = nxt
            if with_attn[level]:
                b.add_c(cur[0])
            chans.append(cur)
            b.order.append(SAVE)
        if level != len(channel_mult) - 1:
            b.add_d("linear", flat(cur), flat(cur))
            chans.append(cur)
            b.order.append(SAVE)
    i_order = b.take_order()

    b.add_d("fc", flat(cur), flat(cur))
    b.add_c(cur[0])
    b.add_d("fc", flat(cur), flat(cur))
    m_order = b.take_order()

    for level, (mult, sdim) in list(enumerate(zip(channel_mult, second_dim)))[::-1]:
        for _ in range(num_noattn_blocks[level] + 1):
            b.order.append(LOAD)
            extra = chans.pop()
            nxt = (mult * mc, sdim)
            b.add_d("fc", flat(cur) + flat(extra), flat(nxt))
            cur = nxt
            if with_attn[level]:
                b.add_c(cur[0])
        if level != 0:
            b.add_d("linear", flat(cur), flat(cur))
    b.add_d("out0d", flat(cur), output_channels)
    o_order = b.take_order()
    return UNetProgram(tuple(b.data), tuple(b.ctx), i_order, m_order, o_order)


class _Out2D(nn.Module):
    """Final GN -> SiLU -> zero conv3 (torch Sequential indices 0.0 / 0.2)."""
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = group_norm("0")(x).astype(self.dtype)
        return conv3(self.out_channels, "2", self.dtype, zero_init=True)(silu(h))


class _Out0D(nn.Module):
    """Final per-channel GN over [B,C,S] -> SiLU -> zero Dense(C*S -> out)."""
    channels: int
    second_dim: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x flat [B, C*S]
        bsz = x.shape[0]
        h = x.reshape(bsz, self.channels, self.second_dim).transpose(0, 2, 1)
        h = group_norm("0")(h).astype(self.dtype)
        h = silu(h).transpose(0, 2, 1).reshape(bsz, -1)
        return dense(self.out_channels, "2", self.dtype, zero_init=True)(h)


class UNetBase(nn.Module):
    """Shared walk/dispatch machinery; subclasses provide `program`."""

    def _remat(self, cls, channels: int | None = None):
        """Gradient checkpointing per block (the reference's use_checkpoint,
        diffusion_utils.py:84-129) as `nn.remat` — forward identical, the
        backward pass recomputes block activations instead of storing them.

        `remat_max_channels` (when set) restricts remat to blocks whose
        channel count is <= the threshold. Channel count maps 1:1 to
        resolution level (320 -> 64^2, 640 -> 32^2, 1280 -> 16^2/8^2), so
        e.g. 640 remats only the two high-resolution levels — where ~85% of
        activation bytes live — while keeping the rematerialized graph small
        enough for compile services that OOM on the full-remat HLO (the
        observed tpu_compile_helper SIGKILL at full size, PERF.md)."""
        if not self.use_checkpoint:
            return cls
        mx = getattr(self, "remat_max_channels", None)
        if mx is not None and channels is not None and channels > mx:
            return cls
        return nn.remat(cls)

    def _make_data_module(self, spec: DataSpec):
        dt = self.dtype
        if spec.kind == "conv_in":
            return conv3(spec.out_ch, spec.name, dt)
        if spec.kind == "res":
            return self._remat(ResBlock2D, spec.out_ch)(
                spec.in_ch, spec.out_ch, dt, name=spec.name)
        if spec.kind == "down":
            return Downsample2D(spec.out_ch, dt, name=spec.name)
        if spec.kind == "up":
            return Upsample2D(spec.out_ch, dt, name=spec.name)
        if spec.kind == "out":
            return _Out2D(spec.out_ch, dt, name=spec.name)
        if spec.kind == "linear_in" or spec.kind == "linear":
            return dense(spec.out_ch, spec.name, dt)
        if spec.kind == "fc":
            return self._remat(FCBlock, spec.out_ch)(
                spec.in_ch, spec.out_ch, dt, name=spec.name)
        if spec.kind == "out0d":
            return _Out0D(self.current_out_channels(), self.second_dim[0],
                          spec.out_ch, dt, name=spec.name)
        raise ValueError(spec.kind)

    # ---- methods callable from the VD orchestrator ----

    def time_embedding(self, timesteps, dtype=None):
        t_emb = timestep_embedding(timesteps, self.model_channels)
        if dtype is not None:
            t_emb = t_emb.astype(dtype)
        return self.time_embed(t_emb)

    def run_data(self, i: int, h, emb):
        spec = self.program.data[i]
        mod = self._data[i]
        if spec.kind in ("res", "fc"):
            return mod(h, emb)
        return mod(h)

    def run_context(self, i: int, h, ctx, tokenizer: "UNetBase | None" = None):
        """Apply context block i. `tokenizer` is the diffuser that owns the
        data stream (its shape determines tokenization); in cross-flow use the
        context-block owner and the data stream differ (vd.py:344-345)."""
        tokens, restore = (tokenizer or self).tokens_of(h, i)
        return restore(self._ctx[i](tokens, ctx))

    def __call__(self, x, timesteps, context):
        """Standalone full walk over this diffuser's own blocks.

        Mirrors the reference forward (openaimodel.py:2774-2812) but walks
        the *correct* o_order for the output stage (the reference re-walks
        i_order there — a documented bug it never hits because VD always
        goes through vd.py:apply_model; see SURVEY.md section 7).
        """
        emb = self.time_embedding(timesteps, x.dtype)
        return self.walk(x, emb, context, self, self)

    def _run_tokens(self, tokens, h, hs, emb, context,
                    data_host: "UNetBase", ctx_host: "UNetBase",
                    di: int = 0, ci: int = 0):
        """Dispatch a token subsequence; data blocks come from `data_host`,
        context blocks from `ctx_host` (cross-flow mixing, vd.py:344-345)."""
        hs = list(hs)
        for token in tokens:
            if token == D:
                h = data_host.run_data(di, h, emb)
                di += 1
            elif token == C:
                h = ctx_host.run_context(ci, h, context, tokenizer=data_host)
                ci += 1
            elif token == SAVE:
                hs.append(h)
            elif token == LOAD:
                h = jnp.concatenate([h, hs.pop()], axis=-1)
        return h, hs

    def walk(self, x, emb, context, data_host: "UNetBase", ctx_host: "UNetBase"):
        """Full program walk."""
        from vdtpu.ops import tome
        tome.begin_walk()  # per-walk merge-assignment reuse (no-op unless on)
        try:
            h, _ = self._run_tokens(self.program.layer_order, x, [], emb,
                                    context, data_host, ctx_host)
        finally:
            tome.end_walk()
        return h

    def _encoder_counts(self) -> tuple[int, int]:
        return (sum(1 for t in self.program.i_order if t == D),
                sum(1 for t in self.program.i_order if t == C))

    def walk_encoder(self, x, emb, context, data_host, ctx_host):
        """Input-half walk (i_order): returns (h, skip stack) — the state
        reused across adjacent timesteps by the encoder-reuse serving mode
        (Faster Diffusion, arXiv 2312.09608)."""
        from vdtpu.ops import tome
        tome.begin_walk()
        try:
            h, hs = self._run_tokens(self.program.i_order, x, [], emb,
                                     context, data_host, ctx_host)
        finally:
            tome.end_walk()
        return h, tuple(hs)

    def walk_decoder(self, h, hs, emb, context, data_host, ctx_host):
        """Mid + output walk from a (possibly cached) encoder state."""
        from vdtpu.ops import tome
        di, ci = self._encoder_counts()
        tome.begin_walk()
        try:
            h, _ = self._run_tokens(
                self.program.m_order + self.program.o_order,
                h, list(hs), emb, context, data_host, ctx_host, di=di, ci=ci)
        finally:
            tome.end_walk()
        return h


@register("openai_unet_2d_next")
class UNet2DNext(UNetBase):
    """Image-latent diffuser (ref openaimodel.py:2575-2812). NHWC."""
    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: Sequence[int] = (2, 2, 2, 2)
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int | None = 8
    num_head_channels: int | None = None
    context_dim: int = 768
    dropout: float = 0.0
    use_checkpoint: bool = False
    remat_max_channels: int | None = None
    parts: Sequence[str] = ("global", "data", "context")
    dtype: Dtype = jnp.float32

    def setup(self):
        self.program = build_program_2d(
            self.in_channels, self.model_channels, self.out_channels,
            tuple(self.num_res_blocks), tuple(self.attention_resolutions),
            tuple(self.channel_mult), self.num_heads, self.num_head_channels)
        if "global" in self.parts:
            self.time_embed = TimeEmbedMLP(
                self.model_channels * 4, self.dtype, name="time_embed")
        if "data" in self.parts:
            self._data = [self._make_data_module(s) for s in self.program.data]
        if "context" in self.parts:
            self._ctx = [
                self._remat(SpatialTransformer, s.channels)(
                    s.channels, s.heads, s.dim_head,
                    dtype=self.dtype, name=s.name)
                for s in self.program.ctx]

    def tokens_of(self, h, ci: int = 0):
        b, hh, ww, c = h.shape
        return h.reshape(b, hh * ww, c), lambda t: t.reshape(b, hh, ww, c)


@register("openai_unet_0d_next")
class UNet0DNext(UNetBase):
    """Text-latent diffuser (ref openaimodel.py:2814-2975). Flat [B, C*S]."""
    input_channels: int = 768
    model_channels: int = 320
    output_channels: int = 768
    num_noattn_blocks: Sequence[int] = (2, 2, 2, 2)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    second_dim: Sequence[int] = (4, 4, 4, 4)
    with_attn: Sequence[bool] = (True, True, True, False)
    num_heads: int | None = 8
    num_head_channels: int | None = None
    context_dim: int = 768
    use_checkpoint: bool = False
    remat_max_channels: int | None = None
    parts: Sequence[str] = ("global", "data", "context")
    dtype: Dtype = jnp.float32

    def current_out_channels(self) -> int:
        return self.channel_mult[0] * self.model_channels

    def setup(self):
        self.program = build_program_0d(
            self.input_channels, self.model_channels, self.output_channels,
            tuple(self.num_noattn_blocks), tuple(self.channel_mult),
            tuple(self.second_dim), tuple(self.with_attn),
            self.num_heads, self.num_head_channels)
        if "global" in self.parts:
            self.time_embed = TimeEmbedMLP(
                self.model_channels * 4, self.dtype, name="time_embed")
        if "data" in self.parts:
            self._data = [self._make_data_module(s) for s in self.program.data]
        if "context" in self.parts:
            self._ctx = [
                self._remat(SpatialTransformer, s.channels)(
                    s.channels, s.heads, s.dim_head,
                    dtype=self.dtype, name=s.name)
                for s in self.program.ctx]

    def tokens_of(self, h, ci: int = 0):
        # flat channel-major [B, C*S] -> tokens [B, S, C]; the channel count
        # at context slot `ci` comes from the layer program (per-level
        # second_dim means S varies across slots — ref openaimodel.py:
        # 2885-2963 carries [C, S, 1] state per level; round 1 wrongly
        # assumed S == second_dim[0] everywhere)
        b, f = h.shape
        c = self.program.ctx[ci].channels
        sdim = f // c
        tokens = h.reshape(b, c, sdim).transpose(0, 2, 1)
        return tokens, lambda t: t.transpose(0, 2, 1).reshape(b, f)


# The legacy (pre-v2) diffuser families share the "openai_unet" registry
# prefix; importing them here makes the lazy registry lookup find them
# (vdtpu/config/registry.py routes the prefix to this module).
from vdtpu.models import legacy as _legacy  # noqa: E402,F401
