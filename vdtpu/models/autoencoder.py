"""KL-f8 image VAE (LDM first-stage autoencoder), NHWC Flax.

Capability parity with `/root/reference/lib/model_zoo/autokl.py:14-141` and
its module file `autokl_modules.py:368-569` (Encoder/Decoder/ResnetBlock/
AttnBlock). Submodule names replicate the torch state-dict tree
(`encoder.down.0.block.1.conv2` ...) so `kl-f8.pth` converts mechanically.

TPU-first notes: convs run NHWC in the module compute dtype (bf16 on TPU for
serving); GroupNorm is f32. The single-head attention blocks use the shared
attention op. The torch downsample's asymmetric (0,1,0,1) padding is kept
exactly — it changes output parity with even inputs.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from vdtpu.config.registry import register
from vdtpu.models.distributions import DiagonalGaussian
from vdtpu.models.layers import Dtype, conv3, group_norm
from vdtpu.ops.attention import scaled_dot_product_attention


def _swish(x):
    return nn.silu(x)


class VAEResnetBlock(nn.Module):
    """GN(eps 1e-6)-swish-conv3 x2 with 1x1 nin_shortcut (autokl_modules.py:82-141)."""
    in_channels: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = group_norm("norm1", eps=1e-6)(x).astype(self.dtype)
        h = conv3(self.out_channels, "conv1", self.dtype, quant=False)(_swish(h))
        h = group_norm("norm2", eps=1e-6)(h).astype(self.dtype)
        h = conv3(self.out_channels, "conv2", self.dtype, quant=False)(_swish(h))
        if self.in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head spatial self-attention with 1x1 projections (ref :150-202)."""
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = group_norm("norm", eps=1e-6)(x).astype(self.dtype)
        to = lambda name: nn.Conv(c, (1, 1), dtype=self.dtype, name=name)
        q, k, v = to("q")(h), to("k")(h), to("v")(h)
        tok = lambda t: t.reshape(b, hh * ww, 1, c)
        out = scaled_dot_product_attention(tok(q), tok(k), tok(v), scale=c ** -0.5)
        out = out.reshape(b, hh, ww, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class _Down(nn.Module):
    """Asymmetric-pad stride-2 conv (ref :60-79)."""
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class _Up(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return conv3(self.channels, "conv", self.dtype, quant=False)(x)


class VAEEncoder(nn.Module):
    """ref autokl_modules.py:368-459."""
    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    z_channels: int
    double_z: bool = True
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    in_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        num_res = len(self.ch_mult)
        curr_res = self.resolution
        h = conv3(self.ch, "conv_in", self.dtype, quant=False)(x)
        block_in = self.ch
        for i_level in range(num_res):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = VAEResnetBlock(block_in, block_out, self.dtype,
                                   name=f"down.{i_level}.block.{i_block}")(h)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = VAEAttnBlock(block_in, self.dtype,
                                     name=f"down.{i_level}.attn.{i_block}")(h)
            if i_level != num_res - 1:
                h = _Down(block_in, self.dtype, name=f"down.{i_level}.downsample")(h)
                curr_res //= 2
        h = VAEResnetBlock(block_in, block_in, self.dtype, name="mid.block_1")(h)
        h = VAEAttnBlock(block_in, self.dtype, name="mid.attn_1")(h)
        h = VAEResnetBlock(block_in, block_in, self.dtype, name="mid.block_2")(h)
        h = group_norm("norm_out", eps=1e-6)(h).astype(self.dtype)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return conv3(out_ch, "conv_out", self.dtype, quant=False)(_swish(h))


class VAEDecoder(nn.Module):
    """ref autokl_modules.py:462-569."""
    ch: int
    out_ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    z_channels: int
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_res - 1]
        curr_res = self.resolution // 2 ** (num_res - 1)
        h = conv3(block_in, "conv_in", self.dtype, quant=False)(z)
        h = VAEResnetBlock(block_in, block_in, self.dtype, name="mid.block_1")(h)
        h = VAEAttnBlock(block_in, self.dtype, name="mid.attn_1")(h)
        h = VAEResnetBlock(block_in, block_in, self.dtype, name="mid.block_2")(h)
        for i_level in reversed(range(num_res)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = VAEResnetBlock(block_in, block_out, self.dtype,
                                   name=f"up.{i_level}.block.{i_block}")(h)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = VAEAttnBlock(block_in, self.dtype,
                                     name=f"up.{i_level}.attn.{i_block}")(h)
            if i_level != 0:
                h = _Up(block_in, self.dtype, name=f"up.{i_level}.upsample")(h)
                curr_res *= 2
        h = group_norm("norm_out", eps=1e-6)(h).astype(self.dtype)
        return conv3(self.out_ch, "conv_out", self.dtype, quant=False)(_swish(h))


@register("autoencoderkl")
class AutoencoderKL(nn.Module):
    """ref autokl.py:14-141. encode: [0,1] NHWC image -> latent sample;
    decode: latent -> [0,1] image (clamped)."""
    ddconfig: Any = None
    embed_dim: int = 4
    lossconfig: Any = None  # adversarial training loss configured separately
    dtype: Dtype = jnp.float32

    def setup(self):
        dd = dict(self.ddconfig)
        self.encoder = VAEEncoder(
            ch=dd["ch"], ch_mult=tuple(dd["ch_mult"]),
            num_res_blocks=dd["num_res_blocks"], z_channels=dd["z_channels"],
            double_z=dd.get("double_z", True),
            attn_resolutions=tuple(dd.get("attn_resolutions") or ()),
            resolution=dd.get("resolution", 256), in_channels=dd.get("in_channels", 3),
            dtype=self.dtype, name="encoder")
        self.decoder = VAEDecoder(
            ch=dd["ch"], out_ch=dd["out_ch"], ch_mult=tuple(dd["ch_mult"]),
            num_res_blocks=dd["num_res_blocks"], z_channels=dd["z_channels"],
            attn_resolutions=tuple(dd.get("attn_resolutions") or ()),
            resolution=dd.get("resolution", 256), dtype=self.dtype, name="decoder")
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(dd["z_channels"], (1, 1), dtype=self.dtype,
                                       name="post_quant_conv")

    def posterior(self, x) -> DiagonalGaussian:
        x = x * 2.0 - 1.0  # [0,1] -> [-1,1] (autokl.py:35)
        moments = self.quant_conv(self.encoder(x.astype(self.dtype)))
        return DiagonalGaussian(moments)

    def encode(self, x, rng=None):
        post = self.posterior(x)
        if rng is None:
            return post.mode()
        return post.sample(rng)

    def decode(self, z, clamp: bool = True):
        dec = self.decoder(self.post_quant_conv(z.astype(self.dtype)))
        dec = (dec + 1.0) / 2.0
        if clamp:
            dec = jnp.clip(dec, 0.0, 1.0)
        return dec

    def __call__(self, x, rng=None):
        """Reconstruction pass (used for init + training)."""
        post = self.posterior(x)
        z = post.mode() if rng is None else post.sample(rng)
        return self.decode(z, clamp=False), post
