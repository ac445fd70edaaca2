"""Diffusion schedule math — pure numpy (host, f64) + jnp (device) helpers.

Capability parity with the reference schedule code
(`/root/reference/lib/model_zoo/diffusion_utils.py:8-59` and the buffer
registration in `/root/reference/lib/model_zoo/vd.py:127-185`), re-designed for
XLA: every per-timestep quantity is a host-side numpy table computed once in
float64 and handed to the compiled graph as a constant f32 array, so samplers
can `lax.scan` over precomputed (alpha, alpha_prev, sigma) rows with zero
host↔device traffic inside the loop.
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

__all__ = [
    "make_beta_schedule",
    "DiffusionSchedule",
    "make_ddim_timesteps",
    "make_ddim_sampling_parameters",
    "timestep_embedding",
    "extract",
]


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule table, float64 on host.

    Supported: ``linear`` (sqrt-space linspace squared, the SD/VD default),
    ``cosine``, ``sqrt_linear``, ``sqrt``.
    """
    if schedule == "linear":
        betas = np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64) ** 2
    elif schedule == "cosine":
        t = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(t / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0.0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"unknown beta schedule {schedule!r}")
    return betas


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All per-timestep diffusion tables (f32 numpy, length ``num_timesteps``).

    Mirrors the buffer set registered by the reference model
    (`/root/reference/lib/model_zoo/vd.py:127-185`) so training losses,
    q-sampling, and DDIM derivations agree bit-for-bit at f32.
    """

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    log_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    lvlb_weights: np.ndarray
    num_timesteps: int
    linear_start: float
    linear_end: float

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        beta_schedule: str = "linear",
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        given_betas: np.ndarray | None = None,
        v_posterior: float = 0.0,
        parameterization: str = "eps",
    ) -> "DiffusionSchedule":
        betas = (
            np.asarray(given_betas, dtype=np.float64)
            if given_betas is not None
            else make_beta_schedule(
                beta_schedule, timesteps, linear_start=linear_start,
                linear_end=linear_end, cosine_s=cosine_s)
        )
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

        posterior_variance = (
            (1 - v_posterior) * betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            + v_posterior * betas
        )

        f32 = lambda a: np.asarray(a, dtype=np.float32)
        if parameterization == "eps":
            # posterior_variance[0] == 0; row 0 is overwritten below
            with np.errstate(divide="ignore"):
                lvlb = f32(betas) ** 2 / (
                    2 * f32(posterior_variance) * f32(alphas) * (1 - f32(alphas_cumprod))
                )
        elif parameterization == "x0":
            lvlb = 0.5 * np.sqrt(f32(alphas_cumprod)) / (2.0 * 1 - f32(alphas_cumprod))
        else:
            raise NotImplementedError(parameterization)
        lvlb = lvlb.copy()
        lvlb[0] = lvlb[1]

        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
            posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
            posterior_mean_coef2=f32(
                (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
            lvlb_weights=f32(lvlb),
            num_timesteps=int(betas.shape[0]),
            linear_start=linear_start,
            linear_end=linear_end,
        )

    def q_sample(self, x_start, t, noise):
        """Forward-process sample x_t ~ q(x_t | x_0); pure jnp, jit-safe."""
        return (
            extract(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + extract(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def predict_start_from_noise(self, x_t, t, noise):
        return (
            extract(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
        )


def make_ddim_timesteps(
    num_ddim_timesteps: int,
    num_ddpm_timesteps: int,
    method: str = "uniform",
) -> np.ndarray:
    """DDIM timestep subsequence (reference `diffusion_utils.py:32-46`)."""
    if method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        steps = np.arange(0, num_ddpm_timesteps, c)
    elif method == "quad":
        steps = (np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2).astype(int)
    else:
        raise NotImplementedError(f"ddim discretization {method!r}")
    # +1 so the final alpha scales back to data; clamped because the raw +1
    # indexes past the schedule when num_ddim doesn't divide num_ddpm (a
    # latent reference bug its published configs never hit)
    return np.minimum(steps + 1, num_ddpm_timesteps - 1)


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-step (sigma, alpha, alpha_prev) tables (ref `diffusion_utils.py:48-59`)."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.concatenate([alphacums[:1], alphacums[ddim_timesteps[:-1]]])
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return sigmas, alphas, alphas_prev


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [cos | sin] layout.

    Matches the reference layout (`diffusion_utils.py:131-151`: cos first,
    then sin) so converted checkpoints see identical features.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def extract(table, t, ndim: int):
    """Gather per-batch scalars from a timestep table and broadcast to ndim."""
    out = jnp.asarray(table)[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))
