"""CLIP ViT-L/14 context encoders (text + vision) in Flax.

Capability parity with `/root/reference/lib/model_zoo/clip.py`:
- text encode (:53-62): token-level hidden states -> text_projection,
  normalized by the norm of the projected *pooled* (EOT) embedding -> (B,77,768)
- image encode (:88-101): vision hidden states -> post_layernorm ->
  visual_projection, normalized by the CLS-token norm -> (B,257,768)
- masked image encode (:103-143): per-token mask derived by patch-pooling the
  pixel mask; the reference monkey-patches the embeddings forward — here the
  mask is a functional argument to the vision tower.

The towers are written from the CLIP architecture spec with HF
`CLIPModel` state-dict names (text_model.encoder.layers.N..., including HF's
historical "pre_layrnorm" spelling) so `openai/clip-vit-large-patch14`
weights convert with the standard converter. Frozen (no training path).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vdtpu.config.registry import register
from vdtpu.models.layers import Dtype
from vdtpu.models.layers import dense as _dense
from vdtpu.ops.attention import scaled_dot_product_attention

# The int8 serving policy scopes to the DIFFUSERS: calibration
# (serving/api.py enable_int8) covers only their call sites, so a CLIP
# tower traced under the process-wide policy would fall back to dynamic
# per-batch-tensor absmax — making a request's conditioning depend on
# which co-rider texts share its encode batch (test_serving_queue.py::
# test_composition_independence_int8 caught this). Context towers always
# run in the compute dtype, like the VAE (autoencoder.py quant=False).
dense = functools.partial(_dense, quant=False)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


@dataclasses.dataclass(frozen=True)
class CLIPTowerConfig:
    hidden: int
    layers: int
    heads: int
    intermediate: int


TEXT_L14 = CLIPTowerConfig(hidden=768, layers=12, heads=12, intermediate=3072)
VISION_L14 = CLIPTowerConfig(hidden=1024, layers=24, heads=16, intermediate=4096)
PROJECTION_DIM = 768
VOCAB_SIZE = 49408
MAX_TEXT_LEN = 77
IMAGE_SIZE = 224
PATCH = 14

CLIP_PIXEL_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_PIXEL_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTowerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        cfg = self.cfg
        ln = lambda n: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=n)
        h = ln("layer_norm1")(x).astype(self.dtype)
        b, n, _ = h.shape
        hd = cfg.hidden // cfg.heads
        q = dense(cfg.hidden, "self_attn.q_proj", self.dtype)(h) * (hd ** -0.5)
        k = dense(cfg.hidden, "self_attn.k_proj", self.dtype)(h)
        v = dense(cfg.hidden, "self_attn.v_proj", self.dtype)(h)
        shape = lambda t: t.reshape(b, n, cfg.heads, hd)
        attn = scaled_dot_product_attention(shape(q), shape(k), shape(v),
                                            mask=mask, scale=1.0)
        attn = dense(cfg.hidden, "self_attn.out_proj", self.dtype)(attn.reshape(b, n, cfg.hidden))
        x = x + attn
        h = ln("layer_norm2")(x).astype(self.dtype)
        h = dense(cfg.intermediate, "mlp.fc1", self.dtype)(h)
        h = dense(cfg.hidden, "mlp.fc2", self.dtype)(quick_gelu(h))
        return x + h


class CLIPTextTower(nn.Module):
    """HF names under text_model.* ; causal attention; final_layer_norm."""
    cfg: CLIPTowerConfig = TEXT_L14
    vocab_size: int = VOCAB_SIZE
    max_len: int = MAX_TEXT_LEN
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        b, n = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.cfg.hidden, dtype=self.dtype,
                       name="embeddings.token_embedding")(input_ids)
        pos = nn.Embed(self.max_len, self.cfg.hidden, dtype=self.dtype,
                       name="embeddings.position_embedding")(jnp.arange(n)[None])
        x = tok + pos
        causal = jnp.tril(jnp.ones((n, n), bool))[None, None]
        for i in range(self.cfg.layers):
            x = CLIPEncoderLayer(self.cfg, self.dtype,
                                 name=f"encoder.layers.{i}")(x, mask=causal)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            name="final_layer_norm")(x).astype(self.dtype)


class CLIPVisionTower(nn.Module):
    """HF names under vision_model.* ; returns pre-post_layernorm hiddens."""
    cfg: CLIPTowerConfig = VISION_L14
    image_size: int = IMAGE_SIZE
    patch: int = PATCH
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels, token_mask=None):
        # pixels: [B, H, W, 3] normalized; token_mask: [B, 1+P, 1] or None
        b = pixels.shape[0]
        patches = nn.Conv(self.cfg.hidden, (self.patch, self.patch),
                          strides=(self.patch, self.patch), padding="VALID",
                          use_bias=False, dtype=self.dtype,
                          name="embeddings.patch_embedding")(pixels)
        patches = patches.reshape(b, -1, self.cfg.hidden)
        cls = self.param("embeddings.class_embedding",
                         nn.initializers.normal(0.02), (self.cfg.hidden,))
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.cfg.hidden))
        x = jnp.concatenate([cls, patches], axis=1)
        n = x.shape[1]
        pos = nn.Embed(n, self.cfg.hidden, dtype=self.dtype,
                       name="embeddings.position_embedding")(jnp.arange(n)[None])
        x = x + pos
        if token_mask is not None:
            # functional replacement for the reference's monkey-patched
            # embeddings forward (clip.py:124-141)
            x = x * token_mask.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="pre_layrnorm")(x).astype(self.dtype)
        for i in range(self.cfg.layers):
            x = CLIPEncoderLayer(self.cfg, self.dtype,
                                 name=f"encoder.layers.{i}")(x)
        return x


class CLIPTextContextEncoder(nn.Module):
    """VD text context: projected token embeddings / ||projected pooled||.

    Pooled = hidden state at the EOT position (argmax of input_ids, the CLIP
    convention). Ref clip.py:30-62. Defaults are ViT-L/14; the tower is
    configurable for scaled deployments/tests.
    """
    dtype: Dtype = jnp.float32
    tower: CLIPTowerConfig = TEXT_L14
    vocab_size: int = VOCAB_SIZE
    max_len: int = MAX_TEXT_LEN
    projection_dim: int = PROJECTION_DIM

    def setup(self):
        self.text_model = CLIPTextTower(
            cfg=self.tower, vocab_size=self.vocab_size, max_len=self.max_len,
            dtype=self.dtype, name="text_model")
        self.text_projection = dense(self.projection_dim, "text_projection",
                                     self.dtype, use_bias=False)

    def __call__(self, input_ids):
        hidden = self.text_model(input_ids)
        z = self.text_projection(hidden)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = jnp.take_along_axis(hidden, eot[:, None, None], axis=1)[:, 0]
        z_pooled = self.text_projection(pooled)
        norm = jnp.linalg.norm(z_pooled.astype(jnp.float32), axis=-1, keepdims=True)
        return z / norm[:, None, :].astype(z.dtype)

    encode = __call__


class CLIPImageContextEncoder(nn.Module):
    """VD image context: post_layernorm -> visual_projection, / ||CLS||.

    Ref clip.py:66-149 including the masked variant.
    """
    dtype: Dtype = jnp.float32
    tower: CLIPTowerConfig = VISION_L14
    image_size: int = IMAGE_SIZE
    patch: int = PATCH
    projection_dim: int = PROJECTION_DIM

    def setup(self):
        self.vision_model = CLIPVisionTower(
            cfg=self.tower, image_size=self.image_size, patch=self.patch,
            dtype=self.dtype, name="vision_model")
        self.post_layernorm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                           name="vision_model.post_layernorm")
        self.visual_projection = dense(self.projection_dim, "visual_projection",
                                       self.dtype, use_bias=False)

    def __call__(self, pixels, token_mask=None):
        hidden = self.vision_model(pixels, token_mask=token_mask)
        z = self.post_layernorm(hidden).astype(self.dtype)
        z = self.visual_projection(z)
        z_pooled = z[:, 0:1]
        norm = jnp.linalg.norm(z_pooled.astype(jnp.float32), axis=-1, keepdims=True)
        z = z / norm.astype(z.dtype)
        if token_mask is not None:
            z = z * token_mask.astype(z.dtype)  # ref clip.py:142
        return z

    encode = __call__


def vision_token_mask(masks: jnp.ndarray, patch: int = PATCH) -> jnp.ndarray:
    """Pixel mask [B, 224, 224, 1] -> per-token mask [B, 1+P, 1].

    Patch-average pooling of the mask plus a global-scale CLS entry
    (ref clip.py:115-122).
    """
    masks = jnp.clip(masks.astype(jnp.float32), 0.0, 1.0)
    gscale = masks.mean(axis=(1, 2, 3)).reshape(-1, 1, 1)
    b, h, w, _ = masks.shape
    pooled = masks.reshape(b, h // patch, patch, w // patch, patch, 1).mean(axis=(2, 4))
    pooled = pooled.reshape(b, -1, 1)
    return jnp.concatenate([gscale, pooled], axis=1)


def preprocess_images(images: np.ndarray, size: int = IMAGE_SIZE) -> np.ndarray:
    """[B,H,W,3] float [0,1] -> CLIP-normalized [B,224,224,3] (CLIPProcessor
    semantics: bicubic shortest-side resize + center crop + normalize)."""
    import jax.image as jimage
    x = jnp.asarray(images, jnp.float32)
    b, h, w, _ = x.shape
    scale = size / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    x = jimage.resize(x, (b, nh, nw, 3), method="bicubic")
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[:, top:top + size, left:left + size, :]
    return (x - CLIP_PIXEL_MEAN) / CLIP_PIXEL_STD


def _tower(cfg) -> CLIPTowerConfig:
    return cfg if isinstance(cfg, CLIPTowerConfig) else CLIPTowerConfig(**cfg)


@register("clip_text_context_encoder")
def build_clip_text(dtype=jnp.float32, tower=TEXT_L14, **kw):
    return CLIPTextContextEncoder(dtype=dtype, tower=_tower(tower), **kw)


@register("clip_image_context_encoder")
def build_clip_image(dtype=jnp.float32, tower=VISION_L14, **kw):
    return CLIPImageContextEncoder(dtype=dtype, tower=_tower(tower), **kw)
