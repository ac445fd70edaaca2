"""Diagonal Gaussian posterior (ref `/root/reference/lib/model_zoo/distributions.py:24-92`).

Functional version: randomness comes in as an explicit PRNG key (the
reference draws ambient torch noise), everything else is pure jnp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class DiagonalGaussian:
    """Moments tensor [..., 2*C] split into mean / logvar (clamped [-30, 20])."""

    def __init__(self, moments, deterministic: bool = False, channel_axis: int = -1):
        self.mean, logvar = jnp.split(moments, 2, axis=channel_axis)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, key):
        if self.deterministic:
            return self.mean
        return self.mean + self.std * jax.random.normal(key, self.mean.shape, self.mean.dtype)

    def mode(self):
        return self.mean

    def kl(self, other: "DiagonalGaussian | None" = None):
        if self.deterministic:
            return jnp.zeros(self.mean.shape[:1])
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(self.mean**2 + self.var - 1.0 - self.logvar, axis=axes)
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var - 1.0 - self.logvar + other.logvar,
            axis=axes)

    def nll(self, sample, axes=None):
        if self.deterministic:
            return jnp.zeros(sample.shape[:1])
        if axes is None:
            axes = tuple(range(1, sample.ndim))
        logtwopi = float(np.log(2.0 * np.pi))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var, axis=axes)


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two gaussians, broadcasting (ref distributions.py:65-92)."""
    return 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))
