"""VAE adversarial training loss: LPIPS + PatchGAN + adaptive weight.

Capability parity with `/root/reference/lib/model_zoo/autokl_utils.py`
(LPIPS :228-271, vgg16 :178-220, NLayerDiscriminator :101-151,
adopt_weight :277, hinge/vanilla d-losses :282-293,
LPIPSWithDiscriminator :294-400). Instantiated only when a VAE is trained
with ``lossconfig`` (the published VD config sets it null).

TPU-first notes:
- The discriminator's BatchNorm runs with batch statistics in both passes
  (torch default train-mode behavior of the reference); running averages are
  flax ``batch_stats`` collections.
- The reference's adaptive weight uses per-parameter autograd grads of the
  decoder's last layer; here it is `jax.grad` w.r.t. that kernel inside the
  jitted loss — no retain_graph gymnastics.
- LPIPS' VGG16 backbone is defined here with torchvision-compatible names;
  ImageNet/LPIPS weights are user-supplied files run through the standard
  converter (no network in TPU pods).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vdtpu.models.layers import Dtype

LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision vgg16.features indices of the conv layers per LPIPS slice
_VGG_SLICES = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
_VGG_CHANNELS = ((64, 64), (128, 128), (256, 256, 256),
                 (512, 512, 512), (512, 512, 512))


class VGG16Features(nn.Module):
    """VGG16 feature slices relu1_2..relu5_3 (torchvision layer names)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> list[jnp.ndarray]:
        outs = []
        for s, (idxs, chans) in enumerate(zip(_VGG_SLICES, _VGG_CHANNELS)):
            if s > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for i, ch in zip(idxs, chans):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"features.{i}")(x)
                x = nn.relu(x)
            outs.append(x)
        return outs


class LPIPS(nn.Module):
    """Learned perceptual metric (ref :228-271). Input NHWC in [-1, 1]."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        scale = lambda t: (t - LPIPS_SHIFT) / LPIPS_SCALE
        net = VGG16Features(self.dtype, name="net")
        fx = net(scale(x.astype(self.dtype)))
        fy = net(scale(y.astype(self.dtype)))
        val = 0.0
        for k, (a, b) in enumerate(zip(fx, fy)):
            norm = lambda t: t / (jnp.sqrt(jnp.sum(t**2, -1, keepdims=True)) + 1e-10)
            d = (norm(a) - norm(b)) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"lin{k}.model.1")(d)
            val = val + w.mean(axis=(1, 2), keepdims=True)
        return val  # [B,1,1,1]


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (ref :101-151), NHWC, BatchNorm."""
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        lrelu = lambda t: nn.leaky_relu(t, 0.2)
        conv = lambda ch, stride, name, bias=True: nn.Conv(
            ch, (4, 4), strides=(stride, stride), padding=((1, 1), (1, 1)),
            use_bias=bias, dtype=self.dtype, name=name)
        # torch Sequential indices: conv,lrelu, then per layer conv,bn,lrelu
        x = lrelu(conv(self.ndf, 2, "main.0")(x))
        idx = 2
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = conv(self.ndf * nf, 2, f"main.{idx}", bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name=f"main.{idx + 1}")(x).astype(self.dtype)
            x = lrelu(x)
            idx += 3
        nf = min(2 ** self.n_layers, 8)
        x = conv(self.ndf * nf, 1, f"main.{idx}", bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name=f"main.{idx + 1}")(x).astype(self.dtype)
        x = lrelu(x)
        return nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name=f"main.{idx + 3}")(x)


def adopt_weight(weight, global_step, threshold=0, value=0.0):
    return jnp.where(global_step < threshold, value, weight)


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(nn.relu(1.0 - logits_real))
                  + jnp.mean(nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(nn.softplus(-logits_real))
                  + jnp.mean(nn.softplus(logits_fake)))


class LPIPSWithDiscriminator:
    """Two-pass VAE GAN loss (ref :294-400).

    generator_loss / discriminator_loss are the two optimizer branches the
    reference multiplexes through optimizer_idx.
    """

    def __init__(self, disc_start: int, logvar_init: float = 0.0,
                 kl_weight: float = 1.0, pixelloss_weight: float = 1.0,
                 disc_num_layers: int = 3, disc_in_channels: int = 3,
                 disc_factor: float = 1.0, disc_weight: float = 1.0,
                 perceptual_weight: float = 1.0, disc_loss: str = "hinge",
                 dtype=jnp.float32):
        assert disc_loss in ("hinge", "vanilla")
        self.disc_start = disc_start
        self.logvar_init = logvar_init
        self.kl_weight = kl_weight
        self.pixel_weight = pixelloss_weight
        self.perceptual_weight = perceptual_weight
        self.disc_factor = disc_factor
        self.discriminator_weight = disc_weight
        self.disc_loss = hinge_d_loss if disc_loss == "hinge" else vanilla_d_loss
        self.lpips = LPIPS(dtype)
        self.discriminator = NLayerDiscriminator(
            input_nc=disc_in_channels, n_layers=disc_num_layers, dtype=dtype)

    def init_params(self, rng, image_size: int = 64):
        k1, k2 = jax.random.split(rng)
        x = jnp.zeros((1, image_size, image_size, 3))
        lp = self.lpips.init(k1, x, x)["params"]
        dvars = self.discriminator.init(k2, x)
        return {"lpips": lp, "discriminator": dvars["params"],
                "disc_stats": dvars.get("batch_stats", {}),
                "logvar": jnp.asarray(self.logvar_init)}

    def nll_and_rec(self, loss_params, inputs, reconstructions):
        rec = jnp.abs(inputs - reconstructions)
        if self.perceptual_weight > 0:
            p = self.lpips.apply({"params": loss_params["lpips"]},
                                 inputs, reconstructions)
            rec = rec + self.perceptual_weight * p
        logvar = loss_params["logvar"]
        nll = rec / jnp.exp(logvar) + logvar
        bsz = inputs.shape[0]
        return jnp.sum(nll) / bsz, jnp.sum(rec) / bsz

    def calculate_adaptive_weight(self, loss_params, inputs, decode_fn,
                                  last_kernel, z):
        """d_weight = ||d nll / d last_layer|| / ||d g_loss / d last_layer||
        (ref :320-331). `decode_fn(kernel, z)` re-runs the decoder with the
        given last-layer kernel so jax.grad sees it as an input."""
        def nll_of(k):
            return self.nll_and_rec(loss_params, inputs, decode_fn(k, z))[0]

        def g_of(k):
            logits, _ = self.discriminator.apply(
                {"params": loss_params["discriminator"],
                 "batch_stats": loss_params["disc_stats"]},
                decode_fn(k, z), mutable=["batch_stats"])
            return -jnp.mean(logits)

        nll_g = jax.grad(nll_of)(last_kernel)
        adv_g = jax.grad(g_of)(last_kernel)
        d_weight = jnp.linalg.norm(nll_g) / (jnp.linalg.norm(adv_g) + 1e-4)
        return jnp.clip(d_weight, 0.0, 1e4) * self.discriminator_weight

    def generator_loss(self, loss_params, inputs, reconstructions, posterior,
                       global_step, d_weight=None):
        """optimizer_idx == 0 branch (ref :349-377). Pass d_weight from
        `calculate_adaptive_weight` (or None to use the static weight)."""
        nll_loss, rec_loss = self.nll_and_rec(loss_params, inputs, reconstructions)
        kl_loss = jnp.sum(posterior.kl()) / inputs.shape[0]
        logits_fake, _ = self.discriminator.apply(
            {"params": loss_params["discriminator"],
             "batch_stats": loss_params["disc_stats"]},
            reconstructions, mutable=["batch_stats"])
        g_loss = -jnp.mean(logits_fake)
        if d_weight is None:
            d_weight = jnp.asarray(0.0 if self.disc_factor == 0 else
                                   self.discriminator_weight)
        disc_factor = adopt_weight(self.disc_factor, global_step, self.disc_start)
        loss = nll_loss + self.kl_weight * kl_loss + d_weight * disc_factor * g_loss
        return loss, {"Loss": loss, "loss_kl": kl_loss, "loss_nll": nll_loss,
                      "loss_rec": rec_loss, "d_weight": d_weight,
                      "loss_g": g_loss, "logvar": loss_params["logvar"]}

    def discriminator_loss(self, loss_params, inputs, reconstructions,
                           global_step):
        """optimizer_idx == 1 branch (ref :383-400); inputs/recs detached by
        the caller (just don't differentiate through them)."""
        apply = lambda x: self.discriminator.apply(
            {"params": loss_params["discriminator"],
             "batch_stats": loss_params["disc_stats"]}, x,
            mutable=["batch_stats"])
        logits_real, st = apply(inputs)
        logits_fake, _ = apply(reconstructions)
        disc_factor = adopt_weight(self.disc_factor, global_step, self.disc_start)
        d_loss = disc_factor * self.disc_loss(logits_real, logits_fake)
        return d_loss, {"Loss": d_loss, "loss_disc": d_loss,
                        "logits_real": jnp.mean(logits_real),
                        "logits_fake": jnp.mean(logits_fake)}, st
