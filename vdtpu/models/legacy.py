"""Legacy (pre-v2) model zoo: checkpoint-compat diffuser families.

Capability parity with the reference's legacy classes kept for older released
checkpoints (`/root/reference/lib/model_zoo/openaimodel.py:412-2574`):

- ``openai_unet``                      UNetModel (SD v1 / guided-diffusion UNet)
- ``openai_unet_dual_context``         UNetModelDualContext (VD-DC)
- ``openai_unet_nocontext``            UNetModelNoContext
- ``openai_unet_nocontext_noatt``      UNetModelNoContextNoAtt
- ``openai_unet_nocontext_noatt_decoderonly``  decoder-only variant
- ``openai_unet_2d``                   UNetModel2D (pre-next image trunk)
- ``openai_unet_0d``                   UNetModel0D (pre-next text trunk)
- ``openai_unet_0dmd``                 UNetModel0D_MultiDim
- ``openai_unet_vd``                   UNetModelVD (two-trunk zip walk, VD v1)

Not reproduced: ``EncoderUNetModel`` (openaimodel.py:779 — never registered,
unreachable from any config) and ``bert.py``'s BERTEmbedder (its
x-transformers import is commented out at `bert.py:5`, so instantiating it
raises NameError in the reference itself — dead code, documented in
PARITY.md).

Design: the reference interprets nn.ModuleLists at runtime; here each family
compiles its construction loop once into a static tuple-of-stages program
(same approach as `vdtpu.models.unet.UNetProgram`) that the traced forward
walks — a fixed XLA graph after jit. Module names are the exact torch
state-dict paths (``input_blocks.3.0`` ...), so `vdtpu.interop.torch_convert`
loads legacy checkpoints mechanically. Layout is NHWC / token-first; the 0-D
stream is the flat channel-major vector equivalent of the torch
[B, C, S, 1] view.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from vdtpu.config.registry import register
from vdtpu.models.blocks import FCBlock
from vdtpu.models.layers import (
    Downsample2D, Dtype, TimeEmbedMLP, Upsample2D, conv3, dense, group_norm,
    silu)
from vdtpu.models.transformer import BasicTransformerBlock, SpatialTransformer
from vdtpu.ops.attention import scaled_dot_product_attention
from vdtpu.ops.schedules import timestep_embedding


def _nn_up2(x):
    """Parameter-free nearest 2x (ref Upsample(use_conv=False), :89-117)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _avg_pool2(x):
    """2x2 stride-2 average pool (ref Downsample(use_conv=False), :133-159)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


class LegacyResBlock(nn.Module):
    """Reference ResBlock (openaimodel.py:162-274) incl. the options the v2
    blocks dropped: FiLM as scale-shift norm, in-block up/downsampling
    (parameter-free h_upd/x_upd), conv skip. NHWC."""
    channels: int
    out_channels: int
    dropout: float = 0.0
    scale_shift: bool = False
    up: bool = False
    down: bool = False
    conv_skip: bool = False       # use_conv: 3x3 skip instead of 1x1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        h = silu(group_norm("in_layers.0")(x).astype(self.dtype))
        if self.up:
            h, x = _nn_up2(h), _nn_up2(x)
        elif self.down:
            h, x = _avg_pool2(h), _avg_pool2(x)
        h = conv3(self.out_channels, "in_layers.2", self.dtype)(h)
        e_dim = 2 * self.out_channels if self.scale_shift else self.out_channels
        e = dense(e_dim, "emb_layers.1", self.dtype,
                  quant=False)(silu(emb.astype(self.dtype)))
        if self.scale_shift:   # h = norm(h)*(1+scale)+shift -> SiLU (ref :266-270)
            scale, shift = jnp.split(e, 2, axis=-1)
            h = group_norm("out_layers.0")(h).astype(self.dtype)
            h = h * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
            h = silu(h)
        else:
            h = h + e[:, None, None, :]
            h = silu(group_norm("out_layers.0")(h).astype(self.dtype))
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv3(self.out_channels, "out_layers.3", self.dtype,
                  zero_init=True)(h)
        if self.out_channels == self.channels:
            skip = x
        elif self.conv_skip:
            skip = conv3(self.out_channels, "skip_connection", self.dtype)(x)
        else:
            skip = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                           name="skip_connection")(x)
        return skip + h


class LegacyAttentionBlock(nn.Module):
    """Self-attention block (openaimodel.py:277-323): GN -> fused qkv ->
    QKVAttention(Legacy) -> zero proj_out, residual. Token interface
    [B, N, C]; the torch 1-D convs become Dense over the channel axis.

    ``new_order`` selects the qkv channel layout: legacy splits heads before
    qkv (channel order [H, 3, d], :346-371), new splits qkv before heads
    ([3, H, d], :378-405). Softmax scale (ch**-0.25 on both operands) equals
    the standard d**-0.5."""
    channels: int
    heads: int
    new_order: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        b, n, c = tokens.shape
        d = c // self.heads
        h = group_norm("norm")(tokens).astype(self.dtype)
        qkv = dense(3 * c, "qkv", self.dtype)(h)
        if self.new_order:
            qkv = qkv.reshape(b, n, 3, self.heads, d)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        else:
            qkv = qkv.reshape(b, n, self.heads, 3, d)
            q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        out = scaled_dot_product_attention(q, k, v).reshape(b, n, c)
        return tokens + dense(c, "proj_out", self.dtype, zero_init=True)(out)


class DualSpatialTransformer(nn.Module):
    """Two parallel cross-attention branches over one trunk feature
    (ref attention.py:345-435; the VD-DC context layer). ``which``:

    - 0 or 1 (python int): run that branch only — ``x + branch(which)``;
    - a float/traced scalar r: blend ``b0*r + b1*(1-r) + x`` where branch i
      consumes context[i] (ref :407-426, used by UNetModelDualContext with
      `which_attn` and UNetModelVD.forward_dc's mixed_ratio).
    """
    channels: int
    heads: int
    dim_head: int
    depth: int = 1
    disable_self_attn: bool = False
    dtype: Dtype = jnp.float32

    def _branch(self, i: int, tokens, context):
        inner = self.heads * self.dim_head
        x = group_norm(f"norm_{i}", eps=1e-6)(tokens).astype(self.dtype)
        x = dense(inner, f"proj_in_{i}", self.dtype)(x)
        for di in range(self.depth):
            x = BasicTransformerBlock(
                inner, self.heads, self.dim_head, self.dtype,
                disable_self_attn=self.disable_self_attn,
                name=f"transformer_blocks_{i}.{di}")(x, context=context)
        return dense(self.channels, f"proj_out_{i}", self.dtype,
                     zero_init=True)(x)

    @nn.compact
    def __call__(self, tokens, context=None, which=None):
        if isinstance(which, int) and which in (0, 1):
            out = self._branch(which, tokens, context)
            if self.is_initializing():   # materialize the idle branch's params
                _ = self._branch(1 - which, tokens, context)
            return tokens + out
        c0, c1 = context
        x0 = self._branch(0, tokens, c0)
        x1 = self._branch(1, tokens, c1)
        w = jnp.asarray(which, tokens.dtype)
        return x0 * w + x1 * (1.0 - w) + tokens


# ---------------------------------------------------------------------------
# layer programs
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LLayer:
    kind: str            # conv_in|res|res_up|res_down|attn|st|dual|up|down|
                         # pool|nn_up | lin_in|conv1_in|fc|lin|conv1|down0d
    name: str            # torch state-dict prefix, e.g. "input_blocks.3.1"
    ch: int = 0
    out_ch: int = 0
    heads: int = 0
    dim_head: int = 0
    depth: int = 1
    new_order: bool = False
    scale_shift: bool = False
    disable_self: bool = False


Stage = tuple  # tuple[LLayer, ...]


def _normalize_res_blocks(num_res_blocks, channel_mult) -> tuple[int, ...]:
    if isinstance(num_res_blocks, int):
        return (num_res_blocks,) * len(channel_mult)
    if len(num_res_blocks) != len(channel_mult):
        raise ValueError("num_res_blocks must be an int or match channel_mult")
    return tuple(num_res_blocks)


def build_conv_program(
    in_channels: int, model_channels: int, out_channels: int,
    num_res_blocks, channel_mult: Sequence[int],
    *,
    attn: str,                       # 'st' | 'dual' | 'self' | 'none'
    attention_resolutions: Sequence[int] = (),
    with_attn: Sequence[bool] | None = None,   # 2D-family per-level switch
    num_heads: int = -1, num_head_channels: int = -1,
    num_heads_upsample: int = -1,
    use_scale_shift_norm: bool = False, resblock_updown: bool = False,
    conv_resample: bool = True, transformer_depth: int = 1,
    use_new_attention_order: bool = False, legacy: bool = True,
    disable_self_attentions=None, num_attention_blocks=None,
    middle_attn: bool = True,
) -> tuple[tuple[Stage, ...], Stage, tuple[Stage, ...]]:
    """Replays the reference construction loops into a static program.

    Mirrors UNetModel (openaimodel.py:536-726) when ``with_attn is None``
    and the 2D family (UNetModel2D :1986-2067) when ``with_attn`` is given
    (plain dim_head = ch // num_heads, per-level attention). The local
    ``num_heads`` mutation at :565/:619/:673 is reproduced via ``nh``.
    """
    nrb = _normalize_res_blocks(num_res_blocks, channel_mult)
    if num_heads_upsample == -1:
        num_heads_upsample = num_heads
    use_st = attn in ("st", "dual")
    nh = num_heads

    def attn_spec(name: str, ch: int, level: int, heads_param: int) -> LLayer:
        nonlocal nh
        if with_attn is not None:
            dim_head = ch // nh
        elif num_head_channels == -1:
            dim_head = ch // nh
        else:
            nh = ch // num_head_channels
            dim_head = num_head_channels
        if with_attn is None and legacy:
            dim_head = ch // nh if use_st else num_head_channels
        disabled = bool(disable_self_attentions[level]) \
            if disable_self_attentions is not None else False
        if attn == "dual":
            return LLayer("dual", name, ch=ch, heads=nh, dim_head=dim_head,
                          depth=transformer_depth, disable_self=disabled)
        if attn == "st":
            return LLayer("st", name, ch=ch, heads=nh, dim_head=dim_head,
                          depth=transformer_depth, disable_self=disabled)
        # AttentionBlock's own head resolution (openaimodel.py:294-300),
        # receiving num_head_channels=dim_head:
        bh = heads_param if dim_head == -1 else ch // dim_head
        return LLayer("attn", name, ch=ch, heads=bh,
                      new_order=use_new_attention_order)

    def has_attn(level: int, block_idx: int, ds: int) -> bool:
        if attn == "none":
            return False
        if with_attn is not None:
            return bool(with_attn[level])
        if ds not in attention_resolutions:
            return False
        return num_attention_blocks is None or \
            block_idx < num_attention_blocks[level]

    res = lambda name, ci, co: LLayer("res", name, ch=ci, out_ch=co,
                                      scale_shift=use_scale_shift_norm)
    mc = model_channels
    stages_in: list[Stage] = [(LLayer("conv_in", "input_blocks.0.0",
                                      ch=in_channels, out_ch=mc),)]
    chans = [mc]
    ch, ds = mc, 1
    for level, mult in enumerate(channel_mult):
        for nr in range(nrb[level]):
            i = len(stages_in)
            st = [res(f"input_blocks.{i}.0", ch, mult * mc)]
            ch = mult * mc
            if has_attn(level, nr, ds):
                st.append(attn_spec(f"input_blocks.{i}.1", ch, level, nh))
            stages_in.append(tuple(st))
            chans.append(ch)
        if level != len(channel_mult) - 1:
            i = len(stages_in)
            if resblock_updown:
                down = LLayer("res_down", f"input_blocks.{i}.0", ch=ch,
                              out_ch=ch, scale_shift=use_scale_shift_norm)
            elif conv_resample:
                down = LLayer("down", f"input_blocks.{i}.0", ch=ch, out_ch=ch)
            else:
                down = LLayer("pool", f"input_blocks.{i}.0", ch=ch, out_ch=ch)
            stages_in.append((down,))
            chans.append(ch)
            ds *= 2

    mid: list[LLayer] = [res("middle_block.0", ch, ch)]
    if middle_attn and attn != "none":
        mid.append(attn_spec("middle_block.1", ch, len(channel_mult) - 1, nh))
        mid.append(res("middle_block.2", ch, ch))
    else:
        mid.append(res("middle_block.1", ch, ch))

    stages_out: list[Stage] = []
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for i in range(nrb[level] + 1):
            ich = chans.pop()
            si = len(stages_out)
            st = [res(f"output_blocks.{si}.0", ch + ich, mc * mult)]
            ch = mc * mult
            j = 1
            if has_attn(level, i, ds):
                st.append(attn_spec(f"output_blocks.{si}.{j}", ch, level,
                                    num_heads_upsample))
                j += 1
            if level and i == nrb[level]:
                if resblock_updown:
                    st.append(LLayer("res_up", f"output_blocks.{si}.{j}",
                                     ch=ch, out_ch=ch,
                                     scale_shift=use_scale_shift_norm))
                elif conv_resample:
                    st.append(LLayer("up", f"output_blocks.{si}.{j}",
                                     ch=ch, out_ch=ch))
                else:
                    st.append(LLayer("nn_up", f"output_blocks.{si}.{j}",
                                     ch=ch, out_ch=ch))
                ds //= 2
            stages_out.append(tuple(st))
    return tuple(stages_in), tuple(mid), tuple(stages_out)


def build_fc_program(
    input_channels: int, model_channels: int,
    num_noattn_blocks, channel_mult: Sequence[int],
    with_attn: Sequence[bool], num_heads: int,
    second_dim: Sequence[int] | None,
) -> tuple[tuple[Stage, ...], Stage, tuple[Stage, ...], int]:
    """0-D programs. ``second_dim=None`` → UNetModel0D (openaimodel.py:
    2143-2275: scalar channels, real 1x1 convs + 3x3 downsamples on the
    [.,.,1,1] map); otherwise UNetModel0D_MultiDim (:2334-2451: flat
    [C*S] features, everything Linear). Returns (..., final flat width)."""
    md = second_dim is not None
    nrb = _normalize_res_blocks(num_noattn_blocks, channel_mult)
    mc = model_channels
    nh = num_heads
    if md:
        cur = (mc, second_dim[0])
        flat = lambda cs: cs[0] * cs[1]
        first = LLayer("lin_in", "input_blocks.0.0", ch=input_channels,
                       out_ch=flat(cur))
    else:
        cur = (mc, 1)
        flat = lambda cs: cs[0]
        first = LLayer("conv1_in", "input_blocks.0.0", ch=input_channels,
                       out_ch=mc)
    stages_in: list[Stage] = [(first,)]
    chans = [cur]
    dim_head = cur[0] // nh
    levels = list(zip(channel_mult, second_dim)) if md else \
        [(m, 1) for m in channel_mult]
    for level, (mult, sdim) in enumerate(levels):
        for _ in range(nrb[level]):
            i = len(stages_in)
            nxt = (mult * mc, sdim)
            st = [LLayer("fc", f"input_blocks.{i}.0", ch=flat(cur),
                         out_ch=flat(nxt))]
            cur = nxt
            dim_head = cur[0] // nh
            if with_attn[level]:
                st.append(LLayer("st", f"input_blocks.{i}.1", ch=cur[0],
                                 heads=nh, dim_head=dim_head))
            stages_in.append(tuple(st))
            chans.append(cur)
        if level != len(channel_mult) - 1:
            i = len(stages_in)
            kind = "lin" if md else "down0d"
            stages_in.append((LLayer(kind, f"input_blocks.{i}.0",
                                     ch=flat(cur), out_ch=flat(cur)),))
            chans.append(cur)

    mid = (LLayer("fc", "middle_block.0", ch=flat(cur), out_ch=flat(cur)),
           LLayer("st", "middle_block.1", ch=cur[0], heads=nh,
                  dim_head=dim_head),
           LLayer("fc", "middle_block.2", ch=flat(cur), out_ch=flat(cur)))

    stages_out: list[Stage] = []
    for level, (mult, sdim) in list(enumerate(levels))[::-1]:
        for i in range(nrb[level] + 1):
            extra = chans.pop()
            si = len(stages_out)
            nxt = (mult * mc, sdim)
            st = [LLayer("fc", f"output_blocks.{si}.0",
                         ch=flat(cur) + flat(extra), out_ch=flat(nxt))]
            cur = nxt
            j = 1
            if with_attn[level]:
                st.append(LLayer("st", f"output_blocks.{si}.{j}", ch=cur[0],
                                 heads=nh, dim_head=cur[0] // nh))
                j += 1
            if level != 0 and i == nrb[level]:
                kind = "lin" if md else "conv1"
                st.append(LLayer(kind, f"output_blocks.{si}.{j}",
                                 ch=flat(cur), out_ch=flat(cur)))
            stages_out.append(tuple(st))
    return tuple(stages_in), tuple(mid), tuple(stages_out), flat(cur)


# ---------------------------------------------------------------------------
# generic walkers
# ---------------------------------------------------------------------------

class _LegacyBase(nn.Module):
    """Shared module factory + stage runner."""

    def _maybe_remat(self, cls):
        return nn.remat(cls) if getattr(self, "use_checkpoint", False) else cls

    def _make(self, spec: LLayer):
        dt, k = self.dtype, spec.kind
        if k == "conv_in":
            return conv3(spec.out_ch, spec.name, dt)
        if k in ("res", "res_up", "res_down"):
            cls = self._maybe_remat(LegacyResBlock)
            return cls(spec.ch, spec.out_ch,
                       dropout=getattr(self, "dropout", 0.0),
                       scale_shift=spec.scale_shift, up=(k == "res_up"),
                       down=(k == "res_down"), dtype=dt, name=spec.name)
        if k == "st":
            cls = self._maybe_remat(SpatialTransformer)
            return cls(spec.ch, spec.heads, spec.dim_head, depth=spec.depth,
                       disable_self_attn=spec.disable_self, dtype=dt,
                       name=spec.name)
        if k == "dual":
            cls = self._maybe_remat(DualSpatialTransformer)
            return cls(spec.ch, spec.heads, spec.dim_head, depth=spec.depth,
                       disable_self_attn=spec.disable_self, dtype=dt,
                       name=spec.name)
        if k == "attn":
            return LegacyAttentionBlock(spec.ch, spec.heads, spec.new_order,
                                        dt, name=spec.name)
        if k == "down":
            return Downsample2D(spec.out_ch, dt, name=spec.name)
        if k == "up":
            return Upsample2D(spec.out_ch, dt, name=spec.name)
        if k in ("pool", "nn_up"):
            return None  # parameter-free resample
        if k in ("lin_in", "lin"):
            return dense(spec.out_ch, spec.name, dt)
        if k == "fc":
            cls = self._maybe_remat(FCBlock)
            return cls(spec.ch, spec.out_ch, dt, name=spec.name)
        if k in ("conv1_in", "conv1"):
            return nn.Conv(spec.out_ch, (1, 1), dtype=dt, name=spec.name)
        if k == "down0d":   # 3x3/stride-2 conv on the [B,1,1,C] map
            return Downsample2D(spec.out_ch, dt, name=spec.name)
        raise ValueError(k)

    def _tokens(self, h, spec: LLayer):
        """Map the stream state to attention tokens and back."""
        if h.ndim == 4:
            b, hh, ww, c = h.shape
            return h.reshape(b, hh * ww, c), \
                lambda t: t.reshape(b, hh, ww, c)
        b, f = h.shape   # flat 0-D stream, channel-major [B, C*S]
        c = spec.ch
        s = f // c
        tok = h.reshape(b, c, s).transpose(0, 2, 1)
        return tok, lambda t: t.transpose(0, 2, 1).reshape(b, f)

    def _run(self, pairs, h, emb, context, which_attn=None,
             deterministic: bool = True):
        for spec, mod in pairs:
            k = spec.kind
            if k in ("res", "res_up", "res_down"):
                h = mod(h, emb, deterministic=deterministic)
            elif k == "fc":
                h = mod(h, emb)
            elif k == "st":
                tok, restore = self._tokens(h, spec)
                h = restore(mod(tok, context))
            elif k == "dual":
                tok, restore = self._tokens(h, spec)
                h = restore(mod(tok, context, which=which_attn))
            elif k == "attn":
                tok, restore = self._tokens(h, spec)
                h = restore(mod(tok))
            elif k == "pool":
                h = _avg_pool2(h)
            elif k == "nn_up":
                h = _nn_up2(h)
            else:
                h = mod(h)
        return h


class LegacyConvUNet(_LegacyBase):
    """Classic input/middle/output UNet walker over `build_conv_program`
    (ref forward: openaimodel.py:744-776). Subclass-configured."""
    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: Any = 2
    attention_resolutions: Sequence[int] = ()
    with_attn: Sequence[bool] | None = None
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    dims: int = 2
    num_classes: int | None = None
    use_checkpoint: bool = False
    use_fp16: bool = False           # accepted for config compat; see dtype
    num_heads: int = -1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    context_dim: int | None = None
    n_embed: int | None = None
    legacy: bool = True
    disable_self_attentions: Sequence[bool] | None = None
    num_attention_blocks: Sequence[int] | None = None
    image_size: int | None = None    # unused by the reference forward too
    with_time_embed: bool = True
    dual: bool = False               # DualSpatialTransformer context layers
    has_context: bool = True
    dtype: Dtype = jnp.float32

    def _attn_mode(self) -> str:
        if not self.has_context and not self.attention_resolutions:
            return "none"
        if self.use_spatial_transformer:
            return "dual" if self.dual else "st"
        return "self"

    def setup(self):
        assert self.dims == 2, "legacy zoo: only 2-D conv variants shipped"
        if self.use_spatial_transformer and self.has_context:
            assert self.context_dim is not None
        self._stages = build_conv_program(
            self.in_channels, self.model_channels, self.out_channels,
            self.num_res_blocks, tuple(self.channel_mult),
            attn=self._attn_mode(),
            attention_resolutions=tuple(self.attention_resolutions),
            with_attn=None if self.with_attn is None else tuple(self.with_attn),
            num_heads=self.num_heads,
            num_head_channels=self.num_head_channels,
            num_heads_upsample=self.num_heads_upsample,
            use_scale_shift_norm=self.use_scale_shift_norm,
            resblock_updown=self.resblock_updown,
            conv_resample=self.conv_resample,
            transformer_depth=self.transformer_depth,
            use_new_attention_order=self.use_new_attention_order,
            legacy=self.legacy,
            disable_self_attentions=self.disable_self_attentions,
            num_attention_blocks=self.num_attention_blocks)
        ins, mid, outs = self._stages
        if self.with_time_embed:
            self.time_embed = TimeEmbedMLP(self.model_channels * 4,
                                           self.dtype, name="time_embed")
        if self.num_classes is not None:
            self.label_emb = nn.Embed(self.num_classes,
                                      self.model_channels * 4,
                                      name="label_emb")
        self._in = [tuple((s, self._make(s)) for s in st) for st in ins]
        self._mid = tuple((s, self._make(s)) for s in mid)
        self._out = [tuple((s, self._make(s)) for s in st) for st in outs]
        if self.n_embed is not None:
            self._id_norm = group_norm("id_predictor.0")
            self._id_conv = nn.Conv(self.n_embed, (1, 1), dtype=self.dtype,
                                    name="id_predictor.1")
        else:
            self._out_norm = group_norm("out.0")
            self._out_conv = conv3(self.out_channels, "out.2", self.dtype,
                                   zero_init=True)

    def time_embedding(self, timesteps, dtype=None):
        t_emb = timestep_embedding(timesteps, self.model_channels)
        if dtype is not None:
            t_emb = t_emb.astype(dtype)
        return self.time_embed(t_emb)

    def __call__(self, x, timesteps, context=None, y=None, which_attn=None,
                 deterministic: bool = True):
        emb = self.time_embedding(timesteps, x.dtype)
        if self.num_classes is not None:
            emb = emb + self.label_emb(y)
        hs = []
        h = x
        for st in self._in:
            h = self._run(st, h, emb, context, which_attn, deterministic)
            hs.append(h)
        h = self._run(self._mid, h, emb, context, which_attn, deterministic)
        for st in self._out:
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = self._run(st, h, emb, context, which_attn, deterministic)
        if self.n_embed is not None:
            return self._id_conv(self._id_norm(h).astype(self.dtype))
        return self._out_conv(silu(self._out_norm(h).astype(self.dtype)))


@register("openai_unet")
class LegacyUNetModel(LegacyConvUNet):
    """UNetModel (openaimodel.py:412-776): the SD v1 / guided-diffusion UNet."""


@register("openai_unet_dual_context")
class LegacyUNetDualContext(LegacyConvUNet):
    """UNetModelDualContext (openaimodel.py:1621-1946; VD-DC): UNetModel with
    DualSpatialTransformer context layers and `which_attn` threading."""
    dual: bool = True


@register("openai_unet_nocontext")
class LegacyUNetNoContext(LegacyConvUNet):
    """UNetModelNoContext (openaimodel.py:1003-1286): attention without
    cross-context (ST runs self-attention when use_spatial_transformer)."""
    has_context: bool = False

    def __call__(self, x, timesteps, context=None, y=None, which_attn=None,
                 deterministic: bool = True):
        return super().__call__(x, timesteps, None, y, None, deterministic)


@register("openai_unet_nocontext_noatt")
class LegacyUNetNoContextNoAtt(LegacyConvUNet):
    """UNetModelNoContextNoAtt (openaimodel.py:1287-1479): plain res-walk,
    middle block is two ResBlocks with no attention."""
    has_context: bool = False
    attention_resolutions: Sequence[int] = ()


@register("openai_unet_nocontext_noatt_decoderonly")
class LegacyDecoderOnly(_LegacyBase):
    """UNetModelNoContextNoAttDecoderOnly (openaimodel.py:1480-1607): a
    sequential decoder (conv_in + per-level res[*n] + upsample), no skips."""
    in_channels: int = 4
    out_channels: int = 3
    model_channels: int = 64
    num_res_blocks: Any = 2
    dropout: float = 0.0
    channel_mult: Sequence[int] = (4, 2, 1)
    conv_resample: bool = True
    dims: int = 2
    num_classes: int | None = None
    use_checkpoint: bool = False
    use_fp16: bool = False
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    n_embed: int | None = None
    dtype: Dtype = jnp.float32

    def setup(self):
        nrb = _normalize_res_blocks(self.num_res_blocks, self.channel_mult)
        mc = self.model_channels
        ch = mc * self.channel_mult[0]
        stages: list[Stage] = [(LLayer("conv_in", "output_blocks.0.0",
                                       ch=self.in_channels, out_ch=ch),)]
        for level, mult in enumerate(self.channel_mult):
            for i in range(nrb[level]):
                si = len(stages)
                st = [LLayer("res", f"output_blocks.{si}.0", ch=ch,
                             out_ch=mc * mult,
                             scale_shift=self.use_scale_shift_norm)]
                ch = mc * mult
                if level != len(self.channel_mult) - 1 and i == nrb[level] - 1:
                    kind = ("res_up" if self.resblock_updown else
                            "up" if self.conv_resample else "nn_up")
                    st.append(LLayer(kind, f"output_blocks.{si}.1", ch=ch,
                                     out_ch=ch,
                                     scale_shift=self.use_scale_shift_norm))
                stages.append(tuple(st))
        self.time_embed = TimeEmbedMLP(mc * 4, self.dtype, name="time_embed")
        self._seq = [tuple((s, self._make(s)) for s in st) for st in stages]
        self._out_norm = group_norm("out.0")
        self._out_conv = conv3(self.out_channels, "out.2", self.dtype,
                               zero_init=True)

    def __call__(self, x, timesteps, deterministic: bool = True):
        t_emb = timestep_embedding(timesteps, self.model_channels)
        emb = self.time_embed(t_emb.astype(x.dtype))
        h = x
        for st in self._seq:
            h = self._run(st, h, emb, None, None, deterministic)
        return self._out_conv(silu(self._out_norm(h).astype(self.dtype)))


class LegacyUNet2D(LegacyConvUNet):
    """UNetModel2D (openaimodel.py:1948-2082): the pre-next image trunk —
    per-level `with_attn`, SpatialTransformer context, dim_head =
    ch // num_heads. Registered via `legacy_unet_2d`, which accepts the
    reference's arg names (input_channels/output_channels/num_noattn_blocks)."""
    use_spatial_transformer: bool = True
    with_attn: Sequence[bool] | None = (True, True, True, False)
    num_heads: int = 8
    context_dim: int | None = 768


def _remap_2d_args(kw: dict) -> dict:
    kw = dict(kw)
    for src, dst in (("input_channels", "in_channels"),
                     ("output_channels", "out_channels"),
                     ("num_noattn_blocks", "num_res_blocks")):
        if src in kw:
            kw[dst] = kw.pop(src)
    return kw


@register("openai_unet_2d")
def legacy_unet_2d(**kw):
    """Builder accepting the reference's UNetModel2D arg names."""
    return LegacyUNet2D(**_remap_2d_args(kw))


class LegacyFCUNet(_LegacyBase):
    """UNetModel0D / UNetModel0D_MultiDim (openaimodel.py:2143-2275,
    2334-2466). ``second_dim=None`` selects the 0d variant: state is the
    [B,1,1,C] NHWC map (its conv_in/downsamples are real convs); otherwise
    state is the flat channel-major [B, C*S] vector."""
    input_channels: int = 768
    model_channels: int = 320
    output_channels: int = 768
    context_dim: int | None = 768
    num_noattn_blocks: Sequence[int] = (2, 2, 2, 2)
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    second_dim: Sequence[int] | None = None
    with_attn: Sequence[bool] = (True, True, True, False)
    num_heads: int = 8
    use_checkpoint: bool = False
    with_time_embed: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        ins, mid, outs, _ = build_fc_program(
            self.input_channels, self.model_channels,
            tuple(self.num_noattn_blocks), tuple(self.channel_mult),
            tuple(self.with_attn), self.num_heads,
            None if self.second_dim is None else tuple(self.second_dim))
        self._final_ch = self.channel_mult[0] * self.model_channels
        if self.with_time_embed:
            self.time_embed = TimeEmbedMLP(self.model_channels * 4,
                                           self.dtype, name="time_embed")
        self._in = [tuple((s, self._make(s)) for s in st) for st in ins]
        self._mid = tuple((s, self._make(s)) for s in mid)
        self._out = [tuple((s, self._make(s)) for s in st) for st in outs]
        self._out_norm = group_norm("out.0")
        if self.second_dim is None:
            self._out_head = nn.Conv(self.output_channels, (1, 1),
                                     kernel_init=nn.initializers.zeros,
                                     dtype=self.dtype, name="out.2")
        else:
            self._out_head = dense(self.output_channels, "out.2", self.dtype,
                                   zero_init=True)

    def _run(self, pairs, h, emb, context, which_attn=None,
             deterministic: bool = True):
        md = self.second_dim is not None
        for spec, mod in pairs:
            k = spec.kind
            if k == "fc":
                if md:
                    h = mod(h, emb)
                else:   # state [B,1,1,C] <-> flat around the FC block
                    b = h.shape[0]
                    h = mod(h.reshape(b, -1), emb).reshape(b, 1, 1, -1)
            elif k == "st":
                tok, restore = self._tokens(h, spec)
                h = restore(mod(tok, context))
            else:
                h = mod(h)
        return h

    def time_embedding(self, timesteps, dtype=None):
        t_emb = timestep_embedding(timesteps, self.model_channels)
        if dtype is not None:
            t_emb = t_emb.astype(dtype)
        return self.time_embed(t_emb)

    def __call__(self, x, timesteps, context=None, deterministic: bool = True):
        """0d: x [B, C] (the torch [B,C,1,1] squeezed); 0dmd: x [B, C]."""
        emb = self.time_embedding(timesteps, x.dtype)
        if self.second_dim is None and x.ndim == 2:
            x = x[:, None, None, :]
        hs = []
        h = x
        for st in self._in:
            h = self._run(st, h, emb, context, deterministic=deterministic)
            hs.append(h)
        h = self._run(self._mid, h, emb, context, deterministic=deterministic)
        for st in self._out:
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = self._run(st, h, emb, context, deterministic=deterministic)
        return self._out_head_apply(h)

    def _out_head_apply(self, h):
        if self.second_dim is None:   # GN over C on the [B,1,1,C] map
            y = silu(self._out_norm(h).astype(self.dtype))
            return self._out_head(y)[:, 0, 0, :]
        # GN over C (not flat) on [B, C, S] (ref normalization(current[0]))
        b, f = h.shape
        c = self._final_ch
        y = h.reshape(b, c, f // c).transpose(0, 2, 1)
        y = silu(self._out_norm(y).astype(self.dtype))
        return self._out_head(y.transpose(0, 2, 1).reshape(b, f))


@register("openai_unet_0d")
class LegacyUNet0D(LegacyFCUNet):
    second_dim: Sequence[int] | None = None


@register("openai_unet_0dmd")
class LegacyUNet0DMultiDim(LegacyFCUNet):
    second_dim: Sequence[int] | None = (4, 4, 4, 4)


@register("openai_unet_vd")
class LegacyUNetVD(_LegacyBase):
    """UNetModelVD (openaimodel.py:2468-2566): zip-walks an image trunk
    (UNetModel2D) and a text trunk (UNetModel0D_MultiDim), dispatching each
    layer pair on (xtype, ctype); one shared time_embed (the torch ctor
    hoists unet_image.time_embed and deletes the trunks', :2477-2479).

    `forward_dc` blends two contexts at every context layer:
    h += r*(ctx0_layer(h) - h) + (1-r)*(ctx1_layer(h) - h) (:2548-2566) —
    the ancestor of v2's multicontext 'layer' mixing (vd.py:383-402)."""
    unet_image_cfg: dict
    unet_text_cfg: dict
    dtype: Dtype = jnp.float32

    def setup(self):
        self.unet_image = LegacyUNet2D(
            **_remap_2d_args(dict(self.unet_image_cfg.get("args") or {})),
            with_time_embed=False, dtype=self.dtype, name="unet_image")
        self.unet_text = LegacyUNet0DMultiDim(
            **dict(self.unet_text_cfg.get("args") or {}),
            with_time_embed=False, dtype=self.dtype, name="unet_text")
        self.model_channels = self.unet_image.model_channels
        self.time_embed = TimeEmbedMLP(self.model_channels * 4, self.dtype,
                                       name="time_embed")

    def _pick(self, ispec_mod, tspec_mod, xtype: str):
        return ispec_mod if xtype == "image" else tspec_mod

    def _run_pair(self, istage, tstage, h, emb, ctx_apply, xtype: str,
                  deterministic: bool):
        """ctx_apply(h, active_trunk, spec, i_mod, t_mod) handles 'st'."""
        for (ispec, imod), (tspec, tmod) in zip(istage, tstage):
            if ispec.kind == "st" or tspec.kind == "st":
                h = ctx_apply(h, ispec if xtype == "image" else tspec,
                              imod, tmod)
                continue
            spec, mod = self._pick((ispec, imod), (tspec, tmod), xtype)
            if spec.kind in ("res", "res_up", "res_down"):
                h = mod(h, emb, deterministic=deterministic)
            elif spec.kind == "fc":
                h = mod(h, emb)
            elif spec.kind == "pool":       # parameter-free resamples
                h = _avg_pool2(h)
            elif spec.kind == "nn_up":
                h = _nn_up2(h)
            else:
                h = mod(h)
        return h

    def _walk(self, x, timesteps, ctx_apply, xtype: str,
              deterministic: bool = True):
        emb = self.time_embed(
            timestep_embedding(timesteps, self.model_channels).astype(x.dtype))
        trunk = self.unet_image if xtype == "image" else self.unet_text
        hs = []
        h = x  # image: NHWC map; text: flat [B, C] (torch's [B,C,1,1] view)
        for istage, tstage in zip(self.unet_image._in, self.unet_text._in):
            h = self._run_pair(istage, tstage, h, emb, ctx_apply, xtype,
                               deterministic)
            hs.append(h)
        h = self._run_pair(self.unet_image._mid, self.unet_text._mid, h, emb,
                           ctx_apply, xtype, deterministic)
        for istage, tstage in zip(self.unet_image._out, self.unet_text._out):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = self._run_pair(istage, tstage, h, emb, ctx_apply, xtype,
                               deterministic)
        return trunk._out_head_apply(h) if xtype == "text" else \
            trunk._out_conv(silu(trunk._out_norm(h).astype(self.dtype)))

    def __call__(self, x, timesteps, context, xtype: str = "image",
                 ctype: str = "prompt", deterministic: bool = True):
        def ctx_apply(h, spec, imod, tmod):
            tok, restore = self._tokens(h, spec)
            mod = imod if ctype == "vision" else tmod   # ref :2514-2517
            return restore(mod(tok, context))
        return self._walk(x, timesteps, ctx_apply, xtype, deterministic)

    def forward_dc(self, x, timesteps, c0, c1, xtype: str, c0_type: str,
                   c1_type: str, mixed_ratio, deterministic: bool = True):
        def ctx_apply(h, spec, imod, tmod):
            tok, restore = self._tokens(h, spec)
            m0 = imod if c0_type == "vision" else tmod
            m1 = imod if c1_type == "vision" else tmod
            h0 = m0(tok, c0) - tok
            h1 = m1(tok, c1) - tok
            w = jnp.asarray(mixed_ratio, tok.dtype)
            return restore(tok + h0 * w + h1 * (1.0 - w))
        return self._walk(x, timesteps, ctx_apply, xtype, deterministic)

    def init_walk(self, x_image, x_text, timesteps, c_vision, c_prompt):
        """Touches every parameter group for flax init: (image, vision)
        covers the image trunk's data+context blocks, (text, prompt) the
        text trunk's."""
        a = self(x_image, timesteps, c_vision, xtype="image", ctype="vision")
        b = self(x_text, timesteps, c_prompt, xtype="text", ctype="prompt")
        return a, b
