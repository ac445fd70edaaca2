"""DPM-Solver++(2M) compiled to a single `lax.scan`.

Beyond-parity serving lever (the reference ships DDIM only,
`/root/reference/lib/model_zoo/ddim.py`): a second-order multistep
exponential-integrator solver in x0-prediction space (Lu et al.,
arXiv 2211.01095, the "dpmsolver++ / midpoint / multistep" variant that
is the de-facto few-step sampler in k-diffusion and diffusers). At equal
step count its trajectory error is one order better than DDIM's, so
serving can run ~20 steps where DDIM needs ~50 — the step count is the
single biggest e2e latency multiplier (PERF.md: the UNet scan is >95% of
the request).

TPU design mirrors sampling/ddim.py: every per-step scalar — the model
timestep, the (alpha, sigma) pair of the current grid point, the
sigma-ratio / alpha*(e^{-h}-1) update coefficients, and the folded
0.5/r_i second-order weight — is a host-side float64 numpy table scanned
on device, so the whole S-step loop plus the model is one compiled
function with no host round-trips. The two-step history (the previous
x0 prediction) rides the scan carry; the first step and, for short
ladders, the final step degrade to first order via a zeroed weight
rather than control flow.

Deterministic only (the ODE solver; eta/temperature/noise paths stay on
the DDIM sampler).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vdtpu.ops.schedules import DiffusionSchedule, make_ddim_timesteps

__all__ = ["DPMppTables", "dpmpp_scan", "dpmpp_scan_encreuse",
           "slice_tables"]


@dataclasses.dataclass(frozen=True)
class DPMppTables:
    """Per-step scan inputs, ordered as sampled (t descending).

    Grid: the S model-eval points (the DDIM timestep ladder, descending)
    plus the terminal point at alphas_cumprod[0] — the same endpoint the
    DDIM tables use for their final alpha_prev, so both samplers solve
    the identical boundary-value problem and their outputs are directly
    comparable.
    """
    timesteps: np.ndarray     # int32 [S] model-eval timesteps (create's
                              # `timesteps=` overrides the uniform ladder —
                              # ascending, for custom spacings)
    alphas: np.ndarray        # f32 [S] alpha (=sqrt(abar)) at the eval point
    sigmas: np.ndarray        # f32 [S] sigma (=sqrt(1-abar)) at the eval point
    sigma_ratio: np.ndarray   # f32 [S] sigma_{i+1}/sigma_i
    alpha_phi: np.ndarray     # f32 [S] alpha_{i+1} * (exp(-h_i) - 1)
    w2: np.ndarray            # f32 [S] 0.5/r_i gated by second-order use

    @classmethod
    def create(cls, schedule: DiffusionSchedule, steps: int,
               discretize: str = "uniform", truncate: int | None = None,
               lower_order_final: bool | None = None,
               timesteps=None) -> "DPMppTables":
        ts = (np.asarray(timesteps, np.int64) if timesteps is not None
              else make_ddim_timesteps(steps, schedule.num_timesteps, discretize))
        if truncate is not None:  # img2img: only the first `truncate` steps
            ts = ts[:truncate]
        abar = np.asarray(schedule.alphas_cumprod, np.float64)
        # descending eval points + terminal (ddim.py's final alpha_prev)
        grid = np.concatenate([abar[ts[::-1]], abar[:1]])
        alpha = np.sqrt(grid)
        sigma = np.sqrt(1.0 - grid)
        lam = np.log(alpha / sigma)
        h = lam[1:] - lam[:-1]                      # [S], > 0
        s = len(ts)
        # second-order weight 0.5/r_i with r_i = h_{i-1}/h_i; off for the
        # first step (no history) and — diffusers' lower_order_final, which
        # stabilises very short ladders — for the final step when S < 15.
        w2 = np.zeros((s,), np.float64)
        if s > 1:
            w2[1:] = 0.5 * h[1:] / h[:-1]
        if lower_order_final is None:
            lower_order_final = s < 15
        if lower_order_final and s > 1:
            w2[-1] = 0.0
        f32 = lambda a: np.ascontiguousarray(np.asarray(a, np.float32))
        return cls(
            timesteps=np.ascontiguousarray(ts[::-1].astype(np.int32)),
            alphas=f32(alpha[:-1]), sigmas=f32(sigma[:-1]),
            sigma_ratio=f32(sigma[1:] / sigma[:-1]),
            alpha_phi=f32(alpha[1:] * np.expm1(-h)),
            w2=f32(w2))

    def stacked(self):
        return (jnp.asarray(self.timesteps), jnp.asarray(self.alphas),
                jnp.asarray(self.sigmas), jnp.asarray(self.sigma_ratio),
                jnp.asarray(self.alpha_phi), jnp.asarray(self.w2))


def slice_tables(tables: DPMppTables, a: int, b: int) -> DPMppTables:
    """Rows [a, b) of the descending-ordered tables (static host slice).

    All per-step coefficients were derived from the FULL grid at create()
    time, so a slice keeps the global ladder's step ratios — including a
    non-zero w2 at the segment head, which expects the previous segment's
    x0 prediction to arrive via dpmpp_scan's m_prev carry."""
    cut = lambda arr: arr[a:b]
    return dataclasses.replace(
        tables, timesteps=cut(tables.timesteps), alphas=cut(tables.alphas),
        sigmas=cut(tables.sigmas), sigma_ratio=cut(tables.sigma_ratio),
        alpha_phi=cut(tables.alpha_phi), w2=cut(tables.w2))


def dpmpp_scan(eps_fn, x_init, tables: DPMppTables, m_prev=None,
               return_carry: bool = False):
    """Run the full solver as one lax.scan.

    eps_fn: (x, t[B], step_index) -> eps — the same contract as ddim_scan,
    so every cfg_eps_fn* wrapper composes unchanged.

    Per step i (diffusers DPMSolverMultistepScheduler, algorithm
    "dpmsolver++", solver_type "midpoint", order 2):
        m_i   = (x - sigma_i * eps) / alpha_i          # x0 prediction
        x_+   = (sigma_{i+1}/sigma_i) x
                - alpha_{i+1} (e^{-h_i} - 1) [m_i + (0.5/r_i)(m_i - m_{i-1})]
    with the previous prediction m_{i-1} carried through the scan.

    m_prev / return_carry support segmented runs over slice_tables
    pieces (the cfg_interval mode): the multistep history crosses the
    segment boundary through the carry, so a segmented run with the same
    eps_fn is bit-identical to one whole scan. m_prev=None (the global
    first step) pairs with w2[0]=0, where the history term is inert.
    """
    ts, al, sg, ratio, aphi, w2 = tables.stacked()
    n = ts.shape[0]
    bsz = x_init.shape[0]

    def step(carry, inp):
        x, m_prev = carry
        i, t, a, s, rt, ap, w = inp
        t_b = jnp.full((bsz,), t, jnp.int32)
        eps = eps_fn(x, t_b, i)
        cast = lambda v: v.reshape(()).astype(x.dtype)
        a, s, rt, ap, w = cast(a), cast(s), cast(rt), cast(ap), cast(w)
        m = (x - s * eps) / a
        x_next = rt * x - ap * (m + w * (m - m_prev))
        return (x_next, m), None

    xs = (jnp.arange(n), ts, al, sg, ratio, aphi, w2)
    init = (x_init, jnp.zeros_like(x_init) if m_prev is None else m_prev)
    (x, m), _ = jax.lax.scan(step, init, xs)
    return (x, m) if return_carry else x


def dpmpp_scan_encreuse(eps_fn, x_init, tables: DPMppTables, key_mask,
                        cache_init):
    """dpmpp_scan with an encoder-feature cache threaded through the carry.

    Composition of the two approximate serving levers (both opt-in): the
    few-step solver supplies the short ladder; on steps where key_mask is
    False, eps_fn reuses the cached UNet encoder state and only the
    decoder runs (Faster Diffusion, arXiv 2312.09608 — same stateful
    contract as ddim_scan_encreuse: (x, t[B], use_cache, cache) ->
    (eps, cache))."""
    ts, al, sg, ratio, aphi, w2 = tables.stacked()
    n = ts.shape[0]
    bsz = x_init.shape[0]

    def step(carry, inp):
        x, m_prev, cache = carry
        i, t, a, s, rt, ap, w, is_key = inp
        t_b = jnp.full((bsz,), t, jnp.int32)
        eps, cache = eps_fn(x, t_b, jnp.logical_not(is_key), cache)
        cast = lambda v: v.reshape(()).astype(x.dtype)
        a, s, rt, ap, w = cast(a), cast(s), cast(rt), cast(ap), cast(w)
        m = (x - s * eps) / a
        x_next = rt * x - ap * (m + w * (m - m_prev))
        return (x_next, m, cache), None

    xs = (jnp.arange(n), ts, al, sg, ratio, aphi, w2,
          jnp.asarray(np.asarray(key_mask, bool)))
    (x, _, _), _ = jax.lax.scan(
        step, (x_init, jnp.zeros_like(x_init), cache_init), xs)
    return x
