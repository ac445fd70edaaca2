"""DDIM sampler compiled to a single `lax.scan`.

Capability parity with `/root/reference/lib/model_zoo/ddim.py` (schedule
construction :23-56, sampling loop :81-171, multi-context :173-298) —
re-designed for XLA: the per-step (alpha, alpha_prev, sigma) values are
precomputed host-side tables scanned on device, classifier-free guidance is
one 2x-batched UNet call (ref :144-150), and the whole 50-step loop plus the
model is one compiled function. Noise is driven by an explicit PRNG key
split inside the scan (eta > 0 / temperature paths).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vdtpu.ops.schedules import (
    DiffusionSchedule, make_ddim_sampling_parameters, make_ddim_timesteps)


@dataclasses.dataclass(frozen=True)
class DDIMTables:
    """Per-step scan inputs, ordered as sampled (t descending)."""
    timesteps: np.ndarray     # int32 [S]
    alphas: np.ndarray        # f32 [S]
    alphas_prev: np.ndarray
    sigmas: np.ndarray
    sqrt_one_minus_alphas: np.ndarray

    @classmethod
    def create(cls, schedule: DiffusionSchedule, steps: int, eta: float = 0.0,
               discretize: str = "uniform", truncate: int | None = None,
               timesteps=None) -> "DDIMTables":
        """timesteps: optional explicit ascending ladder (overrides the
        `steps`/`discretize` construction — custom spacings)."""
        ts = (np.asarray(timesteps, np.int64) if timesteps is not None
              else make_ddim_timesteps(steps, schedule.num_timesteps, discretize))
        sig, al, alp = make_ddim_sampling_parameters(schedule.alphas_cumprod, ts, eta)
        if truncate is not None:  # img2img: only the first `truncate` steps are used
            ts, sig, al, alp = ts[:truncate], sig[:truncate], al[:truncate], alp[:truncate]
        rev = lambda a: np.ascontiguousarray(np.asarray(a, np.float32)[::-1])
        return cls(
            timesteps=np.ascontiguousarray(ts[::-1].astype(np.int32)),
            alphas=rev(al), alphas_prev=rev(alp), sigmas=rev(sig),
            sqrt_one_minus_alphas=rev(np.sqrt(1.0 - np.asarray(al, np.float64))))

    def stacked(self):
        return (jnp.asarray(self.timesteps), jnp.asarray(self.alphas),
                jnp.asarray(self.alphas_prev), jnp.asarray(self.sigmas),
                jnp.asarray(self.sqrt_one_minus_alphas))


def _ddim_update(x, eps, a_t, a_prev, sigma, som, key, temperature,
                 noise_dropout: float = 0.0, noise_unit=None):
    """One x_t -> x_{t-1} DDIM update (ref ddim.py:158-171).

    noise_unit: optional pre-drawn standard normal (torch-noise injection
    for bit-comparability, vdtpu/interop/noise.py) used instead of the
    PRNG-key draw."""
    a_t = a_t.reshape(()).astype(x.dtype)
    a_prev = a_prev.reshape(()).astype(x.dtype)
    sigma = sigma.reshape(()).astype(x.dtype)
    som = som.reshape(()).astype(x.dtype)
    pred_x0 = (x - som * eps) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev - sigma**2, 0.0, None)) * eps
    key, kd = jax.random.split(key)
    unit = jax.random.normal(key, x.shape, x.dtype) if noise_unit is None \
        else noise_unit.astype(x.dtype)
    noise = sigma * unit * temperature
    if noise_dropout > 0.0:  # ref ddim.py:168-169
        keep = jax.random.bernoulli(kd, 1.0 - noise_dropout, x.shape)
        noise = jnp.where(keep, noise / (1.0 - noise_dropout), 0.0)
    return jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise, pred_x0


def ddim_scan(
    eps_fn: Callable,          # (x, t[B], step_index) -> eps
    x_init, key, tables: DDIMTables, temperature: float = 1.0,
    noise_dropout: float = 0.0, return_intermediates: bool = False,
    noise_table=None,          # [S, *x.shape] pre-drawn unit normals
    return_final_key: bool = False,
):
    """Run the full reversed-timestep loop as one lax.scan.

    return_intermediates stacks (pred_xt, pred_x0) per step (the reference's
    intermediates log, ddim.py:107-125) — callers subsample as needed.
    noise_table replaces the in-scan PRNG draws with captured torch noise
    (interop/noise.py) for bit-comparability runs.
    return_final_key additionally returns the scan's carry key, so segmented
    callers (the cfg_interval mode) reproduce the exact key stream of one
    long scan."""
    ts, al, alp, sig, som = tables.stacked()
    n = ts.shape[0]
    bsz = x_init.shape[0]

    def step(carry, inp):
        x, key = carry
        if noise_table is None:
            i, t, a_t, a_prev, sigma, s1m = inp
            unit = None
        else:
            (i, t, a_t, a_prev, sigma, s1m), unit = inp
        key, sub = jax.random.split(key)
        t_b = jnp.full((bsz,), t, jnp.int32)
        eps = eps_fn(x, t_b, i)
        x_next, pred_x0 = _ddim_update(x, eps, a_t, a_prev, sigma, s1m, sub,
                                       temperature, noise_dropout, unit)
        out = (x_next, pred_x0) if return_intermediates else None
        return (x_next, key), out

    idx = jnp.arange(n)
    xs = (idx, ts, al, alp, sig, som)
    if noise_table is not None:
        xs = (xs, noise_table)
    (x, key_out), inter = jax.lax.scan(step, (x_init, key), xs)
    if return_intermediates:
        return x, {"pred_xt": inter[0], "pred_x0": inter[1]}
    if return_final_key:
        return x, key_out
    return x


def slice_tables(tables: DDIMTables, a: int, b: int) -> DDIMTables:
    """Rows [a, b) of the descending-ordered tables (static host-side slice)."""
    cut = lambda arr: arr[a:b]
    return dataclasses.replace(
        tables, timesteps=cut(tables.timesteps), alphas=cut(tables.alphas),
        alphas_prev=cut(tables.alphas_prev), sigmas=cut(tables.sigmas),
        sqrt_one_minus_alphas=cut(tables.sqrt_one_minus_alphas))


def encoder_reuse_schedule(steps: int, interval: int = 2,
                           warmup: int = 5) -> np.ndarray:
    """Key-step mask for the encoder-reuse serving mode (arXiv 2312.09608).

    True = recompute the encoder. Early steps stay dense (encoder features
    drift fastest at high noise — the paper's non-uniform key set), then
    every `interval`-th step is a key step. interval=1 degenerates to the
    exact path (every step computes)."""
    mask = np.zeros((steps,), bool)
    mask[:warmup] = True
    mask[warmup::interval] = True
    return mask


def ddim_scan_encreuse(
    eps_fn: Callable,          # (x, t[B], use_cache, cache) -> (eps, cache)
    x_init, key, tables: DDIMTables, key_mask, cache_init,
    temperature: float = 1.0, noise_dropout: float = 0.0,
):
    """ddim_scan with an encoder-feature cache threaded through the carry.

    Approximate serving mode (opt-in; NEVER the exact-DDIM default): on
    steps where key_mask is False, eps_fn reuses the cached encoder state
    and only the UNet decoder runs (lax.cond skips the encoder compute).
    """
    ts, al, alp, sig, som = tables.stacked()
    n = ts.shape[0]
    bsz = x_init.shape[0]

    def step(carry, inp):
        x, key, cache = carry
        i, t, a_t, a_prev, sigma, s1m, is_key = inp
        key, sub = jax.random.split(key)
        t_b = jnp.full((bsz,), t, jnp.int32)
        eps, cache = eps_fn(x, t_b, jnp.logical_not(is_key), cache)
        x_next, _ = _ddim_update(x, eps, a_t, a_prev, sigma, s1m, sub,
                                 temperature, noise_dropout)
        return (x_next, key, cache), None

    xs = (jnp.arange(n), ts, al, alp, sig, som,
          jnp.asarray(np.asarray(key_mask, bool)))
    (x, _, _), _ = jax.lax.scan(step, (x_init, key, cache_init), xs)
    return x


def cfg_eps_fn_stateful(apply_model: Callable, cond, uncond,
                        scale: float) -> Callable:
    """cfg_eps_fn for stateful (encoder-reuse) model applies:
    apply_model(x2, t2, c2, use_cache, cache) -> (eps2, cache)."""
    if scale == 1.0 or uncond is None:
        def eps_nocfg(x, t, use_cache, cache):
            return apply_model(x, t, cond, use_cache, cache)
        return eps_nocfg

    c_in = jnp.concatenate([uncond, cond], axis=0)

    def eps(x, t, use_cache, cache):
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.concatenate([t, t], axis=0)
        e, cache = apply_model(x_in, t_in, c_in, use_cache, cache)
        e_u, e_c = jnp.split(e, 2, axis=0)
        return e_u + scale * (e_c - e_u), cache

    return eps


def cfg_eps_fn(apply_model: Callable, cond, uncond, scale: float) -> Callable:
    """Classifier-free-guided epsilon: one 2x-batched model call (ref :144-150)."""
    if scale == 1.0 or uncond is None:
        return lambda x, t, i: apply_model(x, t, cond)

    c_in = jnp.concatenate([uncond, cond], axis=0)

    def eps(x, t, i):
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.concatenate([t, t], axis=0)
        e = apply_model(x_in, t_in, c_in)
        e_u, e_c = jnp.split(e, 2, axis=0)
        return e_u + scale * (e_c - e_u)

    return eps


def cfg_eps_fn_multicontext(apply_multi: Callable, c_infos: Sequence[Mapping[str, Any]],
                            scale: float) -> Callable:
    """Multi-context CFG (ref ddim.py:244-277): each context contributes its
    [uncond, cond] pair; a single guidance scale is shared (asserted by the
    reference at :256-261)."""
    if scale == 1.0:
        ctxs = [ci["conditioning"] for ci in c_infos]
        return lambda x, t, i: apply_multi(x, t, ctxs)

    ctxs = [jnp.concatenate([ci["unconditional_conditioning"], ci["conditioning"]], axis=0)
            for ci in c_infos]

    def eps(x, t, i):
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.concatenate([t, t], axis=0)
        e = apply_multi(x_in, t_in, ctxs)
        e_u, e_c = jnp.split(e, 2, axis=0)
        return e_u + scale * (e_c - e_u)

    return eps


def cfg_eps_fn_multicontext_stateful(
        apply_multi: Callable, c_infos: Sequence[Mapping[str, Any]],
        scale: float) -> Callable:
    """cfg_eps_fn_multicontext for stateful (encoder-reuse) applies:
    apply_multi(x2, t2, ctxs, use_cache, cache) -> (eps2, cache)."""
    if scale == 1.0:
        ctxs = [ci["conditioning"] for ci in c_infos]

        def eps_nocfg(x, t, use_cache, cache):
            return apply_multi(x, t, ctxs, use_cache, cache)
        return eps_nocfg

    ctxs = [jnp.concatenate([ci["unconditional_conditioning"],
                             ci["conditioning"]], axis=0)
            for ci in c_infos]

    def eps(x, t, use_cache, cache):
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.concatenate([t, t], axis=0)
        e, cache = apply_multi(x_in, t_in, ctxs, use_cache, cache)
        e_u, e_c = jnp.split(e, 2, axis=0)
        return e_u + scale * (e_c - e_u), cache

    return eps


class DDIMSampler:
    """API-level sampler bound to a VDModel (mirrors ref DDIMSampler surface)."""

    def __init__(self, model):
        self.model = model  # vdtpu.models.vd.VDModel

    def _x_init(self, key, shape, x_info, tables, dtype):
        """Initial x_T: given xt, or q-sampled x0 (img2img), or pure noise
        (ref ddim.py:94-105). Returns (x, possibly-truncated tables)."""
        if x_info.get("xt") is not None:
            return jnp.asarray(x_info["xt"], dtype), tables
        if x_info.get("x0") is not None:
            k = int(x_info["x0_forward_timesteps"])
            ts_full = tables.timesteps[::-1]  # ascending
            t0 = jnp.full((shape[0],), int(ts_full[k]), jnp.int32)
            key, sub = jax.random.split(key)
            if x_info.get("noise") is not None:  # torch-noise injection
                noise = jnp.asarray(x_info["noise"], dtype)
            else:
                noise = jax.random.normal(sub, shape, dtype)
            x0 = jnp.asarray(x_info["x0"], dtype)
            x = self.model.schedule.q_sample(x0, t0, noise)
            # keep only the k lowest timesteps (ref ddim.py:99-101); tables
            # are stored descending, so that is the trailing k rows.
            tail = lambda a: a[len(a) - k:]
            trunc = dataclasses.replace(
                tables,
                timesteps=tail(tables.timesteps), alphas=tail(tables.alphas),
                alphas_prev=tail(tables.alphas_prev), sigmas=tail(tables.sigmas),
                sqrt_one_minus_alphas=tail(tables.sqrt_one_minus_alphas))
            return x, trunc
        return jax.random.normal(key, shape, dtype), tables

    def _jitted(self, cache_key, build):
        """Per-signature jit cache: un-jitted sampling re-traces the whole
        50-step scan on EVERY request (seconds of host time; same failure
        mode fixed for Optimus decode — PERF.md).

        With $VDTPU_AOT_CACHE set, compiled executables additionally persist
        to disk (vdtpu/serving/aot.py): a warm boot deserializes the 50-step
        scan in seconds instead of the 2-5 minute jit (serving cold start,
        VERDICT r1 item 9)."""
        if not hasattr(self, "_jit_cache"):
            self._jit_cache = {}
        from vdtpu.ops.quant import get_policy, site_filter_key
        from vdtpu.ops.tome import get_tome
        # the active quant policy, per-site filter and token-merging spec
        # are read at TRACE time by the conv/dense/attention sites, so they
        # must be part of the cache identity: a process that warms a flow in
        # bf16 and then calls VDSystem.enable_int8() / set_site_filter() /
        # set_tome() must re-trace, not silently reuse the stale executable
        cache_key = (cache_key, get_policy(), site_filter_key(), get_tome())
        fn = self._jit_cache.get(cache_key)
        if fn is None:
            from vdtpu.serving.aot import CachedCompile, cache_dir
            if cache_dir() is not None:
                fn = CachedCompile(build(), key=f"{cache_key!r}")
            else:
                fn = jax.jit(build())
            self._jit_cache[cache_key] = fn
        return fn

    def sample(self, params, key, steps, shape, x_info, c_info,
               eta=0.0, temperature=1.0, noise_dropout=0.0,
               return_intermediates=False, dtype=jnp.float32,
               noise_table=None, encoder_reuse=None, method="ddim",
               cfg_interval=None):
        """Single-context sampling with CFG (ref ddim.py:58-127).

        noise_table (and x_info['noise'] in x0 mode) inject captured torch
        noise for bit-comparability (interop/noise.py).

        encoder_reuse: opt-in APPROXIMATE serving mode (off by default —
        the exact DDIM path is the headline): int reuse interval or
        {"interval": k, "warmup": w}; non-key steps skip the UNet encoder
        and reuse cached features (Faster Diffusion, arXiv 2312.09608).
        Quality gate: tests/test_encreuse.py + PERF.md.

        method: "ddim" (default, the reference algorithm) or "dpmpp2m"
        (DPM-Solver++(2M), sampling/dpmpp.py): second-order deterministic
        solver over the same timestep ladder and terminal point — DDIM-50
        -class trajectories at ~20 steps. Requires eta=0 and is exclusive
        with the noise-injection/intermediates options; composes with
        encoder_reuse and cfg_interval (each still opt-in).

        cfg_interval: opt-in APPROXIMATE serving mode (off by default) —
        (lo, hi) fractions of the sampling trajectory (0 = x_T): CFG runs
        only on steps in that band; outside it the conditional model runs
        alone at HALF the UNet batch (limited-interval guidance,
        Kynkäänniemi et al., arXiv 2404.07724). Compiled as three
        statically-sliced scan segments with the PRNG key threaded
        through, so (0, 1) is bit-identical to the plain CFG path."""
        x_type = x_info["type"]
        c_type = c_info["type"]
        scale = float(c_info.get("unconditional_guidance_scale", 1.0))
        mode = "xt" if x_info.get("xt") is not None else \
            "x0" if x_info.get("x0") is not None else "noise"
        k = int(x_info.get("x0_forward_timesteps", 0)) if mode == "x0" else 0
        uncond = c_info.get("unconditional_conditioning")
        uncond_is_none = uncond is None  # no-CFG semantics (ref ddim.py:140-142)
        shape = tuple(int(s) for s in shape)
        has_ntab = noise_table is not None
        has_qn = mode == "x0" and x_info.get("noise") is not None
        enc_spec = None
        if encoder_reuse:
            enc_spec = dict(encoder_reuse) if isinstance(encoder_reuse, Mapping) \
                else {"interval": int(encoder_reuse)}
            if has_ntab or return_intermediates:
                raise ValueError("encoder_reuse is incompatible with "
                                 "noise_table / return_intermediates")
        if method not in ("ddim", "dpmpp2m"):
            raise ValueError(f"unknown sampling method {method!r}")
        if method == "dpmpp2m" and (
                float(eta) != 0.0 or has_ntab or return_intermediates):
            raise ValueError("dpmpp2m is deterministic: requires eta=0 and is "
                             "exclusive with noise_table / "
                             "return_intermediates")
        cfg_itv = None
        if cfg_interval is not None:
            cfg_itv = (float(cfg_interval[0]), float(cfg_interval[1]))
            if not (0.0 <= cfg_itv[0] <= cfg_itv[1] <= 1.0):
                raise ValueError("cfg_interval must satisfy 0 <= lo <= hi <= 1")
            if scale == 1.0 or uncond_is_none:
                raise ValueError("cfg_interval requires active CFG "
                                 "(scale != 1 with an unconditional context)")
            if enc_spec is not None or has_ntab or return_intermediates:
                raise ValueError("cfg_interval composes with ddim or dpmpp2m "
                                 "only (no encoder_reuse / noise_table / "
                                 "return_intermediates)")
        cache_key = ("single", steps, float(eta), shape, x_type, c_type, scale,
                     mode, k, float(temperature), float(noise_dropout),
                     bool(return_intermediates), uncond_is_none, str(dtype),
                     has_ntab, has_qn,
                     None if enc_spec is None else tuple(sorted(enc_spec.items())),
                     method, cfg_itv)

        def build():
            tables = DDIMTables.create(self.model.schedule, steps, eta)

            def run(params, key, cond, uncond, xin, ntab, qn):
                key, sub = jax.random.split(jax.random.fold_in(key, 0))
                xi = {"type": x_type}
                if mode == "xt":
                    xi["xt"] = xin
                elif mode == "x0":
                    xi["x0"] = xin
                    xi["x0_forward_timesteps"] = k
                    if has_qn:
                        xi["noise"] = qn
                x, tbl = self._x_init(sub, shape, xi, tables, dtype)
                if enc_spec is not None:
                    cfg_on = not (scale == 1.0 or uncond_is_none)
                    bsz_eff = shape[0] * (2 if cfg_on else 1)
                    ctx_dim = cond.shape[1:]
                    mask = encoder_reuse_schedule(len(tbl.timesteps), **enc_spec)
                    cache_shapes = jax.eval_shape(
                        lambda p: self.model.apply_model_encoder(
                            p, jnp.zeros((bsz_eff,) + shape[1:], dtype),
                            jnp.zeros((bsz_eff,), jnp.int32),
                            jnp.zeros((bsz_eff,) + ctx_dim, dtype),
                            x_type, c_type), params)
                    cache0 = jax.tree_util.tree_map(
                        lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes)
                    eps = cfg_eps_fn_stateful(
                        lambda xx, tt, cc, uc, cache: self.model.apply_model_encreuse(
                            params, xx, tt, cc, x_type, c_type, cache, uc),
                        cond, None if uncond_is_none else uncond, scale)
                    if method == "dpmpp2m":
                        from vdtpu.sampling.dpmpp import (
                            DPMppTables, dpmpp_scan_encreuse)
                        dtbl = DPMppTables.create(
                            self.model.schedule, steps,
                            truncate=k if mode == "x0" else None)
                        return dpmpp_scan_encreuse(eps, x, dtbl, mask, cache0)
                    return ddim_scan_encreuse(eps, x, key, tbl, mask, cache0,
                                              temperature, noise_dropout)
                apply = lambda xx, tt, cc: self.model.apply_model(
                    params, xx, tt, cc, x_type, c_type)
                eps = cfg_eps_fn(apply, cond,
                                 None if uncond_is_none else uncond, scale)
                if method == "dpmpp2m":
                    from vdtpu.sampling.dpmpp import DPMppTables, dpmpp_scan
                    from vdtpu.sampling.dpmpp import slice_tables as dslice
                    dtbl = DPMppTables.create(
                        self.model.schedule, steps,
                        truncate=k if mode == "x0" else None)
                    if cfg_itv is not None:
                        # same three statically-sliced segments as the ddim
                        # branch below; the solver's two-step history rides
                        # the (x, m_prev) carry across segment boundaries.
                        s_eff = len(dtbl.timesteps)
                        a = int(round(cfg_itv[0] * s_eff))
                        b = int(round(cfg_itv[1] * s_eff))
                        eps_c = cfg_eps_fn(apply, cond, None, 1.0)
                        m = None
                        for lo, hi, fn in ((0, a, eps_c), (a, b, eps),
                                           (b, s_eff, eps_c)):
                            if hi > lo:
                                x, m = dpmpp_scan(fn, x, dslice(dtbl, lo, hi),
                                                  m_prev=m, return_carry=True)
                        return x
                    return dpmpp_scan(eps, x, dtbl)
                if cfg_itv is not None:
                    s_eff = len(tbl.timesteps)  # static (x0 mode truncates)
                    a = int(round(cfg_itv[0] * s_eff))
                    b = int(round(cfg_itv[1] * s_eff))
                    eps_c = cfg_eps_fn(apply, cond, None, 1.0)  # cond-only
                    for lo, hi, fn in ((0, a, eps_c), (a, b, eps),
                                       (b, s_eff, eps_c)):
                        if hi > lo:
                            x, key = ddim_scan(
                                fn, x, key, slice_tables(tbl, lo, hi),
                                temperature, noise_dropout,
                                return_final_key=True)
                    return x
                return ddim_scan(eps, x, key, tbl, temperature, noise_dropout,
                                 return_intermediates,
                                 noise_table=ntab if has_ntab else None)
            return run

        fn = self._jitted(cache_key, build)
        cond = jnp.asarray(c_info["conditioning"], dtype)
        unc = jnp.zeros_like(cond) if uncond is None else jnp.asarray(uncond, dtype)
        xin = jnp.asarray(x_info.get("xt") if mode == "xt" else
                          x_info.get("x0") if mode == "x0" else
                          jnp.zeros(shape), dtype)
        zero = jnp.zeros((0,), dtype)
        ntab = jnp.asarray(noise_table, dtype) if has_ntab else zero
        qn = jnp.asarray(x_info["noise"], dtype) if has_qn else zero
        return fn(params, key, cond, unc, xin, ntab, qn)

    def sample_multicontext(self, params, key, steps, shape, x_info, c_info_list,
                            eta=0.0, temperature=1.0, noise_dropout=0.0,
                            mixing_type="attention", layer_choices=None,
                            return_intermediates=False, dtype=jnp.float32,
                            method="ddim", encoder_reuse=None,
                            cfg_interval=None):
        """Multi-context sampling (ref ddim.py:173-242). `method`,
        `encoder_reuse` and `cfg_interval` as in sample() — the opt-in
        approximate modes apply to the blend flows (dcg/tcg/mcg) with the
        same composition rules (cfg_interval excludes encoder_reuse)."""
        if method not in ("ddim", "dpmpp2m"):
            raise ValueError(f"unknown sampling method {method!r}")
        if method == "dpmpp2m" and (float(eta) != 0.0 or return_intermediates):
            raise ValueError("dpmpp2m is deterministic: requires eta=0 and is "
                             "exclusive with return_intermediates")
        scales = {float(ci.get("unconditional_guidance_scale", 1.0)) for ci in c_info_list}
        if len(scales) != 1:
            raise ValueError("all contexts must share one guidance scale "
                             "(ref ddim.py:256-261)")
        scale = scales.pop()
        x_type = x_info["type"]
        c_types = tuple(ci["type"] for ci in c_info_list)
        ratios = tuple(float(ci.get("ratio", 1.0)) for ci in c_info_list)
        mode = "xt" if x_info.get("xt") is not None else \
            "x0" if x_info.get("x0") is not None else "noise"
        k = int(x_info.get("x0_forward_timesteps", 0)) if mode == "x0" else 0
        shape = tuple(int(s) for s in shape)
        ctx_shapes = tuple(tuple(np.shape(ci["conditioning"])) for ci in c_info_list)
        enc_spec = None
        if encoder_reuse:
            enc_spec = dict(encoder_reuse) if isinstance(encoder_reuse, Mapping) \
                else {"interval": int(encoder_reuse)}
            if return_intermediates:
                raise ValueError("encoder_reuse is incompatible with "
                                 "return_intermediates")
        cfg_itv = None
        if cfg_interval is not None:
            cfg_itv = (float(cfg_interval[0]), float(cfg_interval[1]))
            if not (0.0 <= cfg_itv[0] <= cfg_itv[1] <= 1.0):
                raise ValueError("cfg_interval must satisfy 0 <= lo <= hi <= 1")
            if scale == 1.0:
                raise ValueError("cfg_interval requires active CFG "
                                 "(scale != 1)")
            if enc_spec is not None or return_intermediates:
                raise ValueError("cfg_interval composes with ddim or dpmpp2m "
                                 "only (no encoder_reuse / "
                                 "return_intermediates)")
        cache_key = ("multi", steps, float(eta), shape, x_type, c_types, scale,
                     ratios, mode, k, float(temperature), float(noise_dropout),
                     mixing_type, layer_choices is None,
                     bool(return_intermediates), ctx_shapes, str(dtype), method,
                     None if enc_spec is None else tuple(sorted(enc_spec.items())),
                     cfg_itv)

        def build():
            tables = DDIMTables.create(self.model.schedule, steps, eta)

            def run(params, key, conds, unconds, xin, choices):
                key, sub = jax.random.split(jax.random.fold_in(key, 0))
                xi = {"type": x_type}
                if mode == "xt":
                    xi["xt"] = xin
                elif mode == "x0":
                    xi["x0"] = xin
                    xi["x0_forward_timesteps"] = k
                x, tbl = self._x_init(sub, shape, xi, tables, dtype)

                def apply_multi(xx, tt, ctxs):
                    return self.model.apply_model_multicontext(
                        params, xx, tt, ctxs, list(ratios), x_type,
                        list(c_types), mixing_type=mixing_type,
                        layer_choices=choices)

                c_infos = [
                    {"conditioning": c, "unconditional_conditioning": u}
                    for c, u in zip(conds, unconds)]
                if enc_spec is not None:
                    cfg_on = scale != 1.0
                    bsz_eff = shape[0] * (2 if cfg_on else 1)
                    mask = encoder_reuse_schedule(len(tbl.timesteps), **enc_spec)
                    cache_shapes = jax.eval_shape(
                        lambda p: self.model.apply_model_multicontext_encoder(
                            p, jnp.zeros((bsz_eff,) + shape[1:], dtype),
                            jnp.zeros((bsz_eff,), jnp.int32),
                            [jnp.zeros((bsz_eff,) + cs[1:], dtype)
                             for cs in ctx_shapes],
                            list(ratios), x_type, list(c_types),
                            mixing_type=mixing_type, layer_choices=choices),
                        params)
                    cache0 = jax.tree_util.tree_map(
                        lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes)
                    eps = cfg_eps_fn_multicontext_stateful(
                        lambda xx, tt, ctxs, uc, cache:
                            self.model.apply_model_multicontext_encreuse(
                                params, xx, tt, ctxs, list(ratios), x_type,
                                list(c_types), cache, uc,
                                mixing_type=mixing_type,
                                layer_choices=choices),
                        c_infos, scale)
                    if method == "dpmpp2m":
                        from vdtpu.sampling.dpmpp import (
                            DPMppTables, dpmpp_scan_encreuse)
                        dtbl = DPMppTables.create(
                            self.model.schedule, steps,
                            truncate=k if mode == "x0" else None)
                        return dpmpp_scan_encreuse(eps, x, dtbl, mask, cache0)
                    return ddim_scan_encreuse(eps, x, key, tbl, mask, cache0,
                                              temperature, noise_dropout)
                eps = cfg_eps_fn_multicontext(apply_multi, c_infos, scale)
                if method == "dpmpp2m":
                    from vdtpu.sampling.dpmpp import DPMppTables, dpmpp_scan
                    from vdtpu.sampling.dpmpp import slice_tables as dslice
                    dtbl = DPMppTables.create(
                        self.model.schedule, steps,
                        truncate=k if mode == "x0" else None)
                    if cfg_itv is not None:
                        s_eff = len(dtbl.timesteps)
                        a = int(round(cfg_itv[0] * s_eff))
                        b = int(round(cfg_itv[1] * s_eff))
                        eps_c = cfg_eps_fn_multicontext(apply_multi, [
                            {"conditioning": ci["conditioning"]}
                            for ci in c_infos], 1.0)
                        m = None
                        for lo, hi, fn in ((0, a, eps_c), (a, b, eps),
                                           (b, s_eff, eps_c)):
                            if hi > lo:
                                x, m = dpmpp_scan(fn, x, dslice(dtbl, lo, hi),
                                                  m_prev=m, return_carry=True)
                        return x
                    return dpmpp_scan(eps, x, dtbl)
                if cfg_itv is not None:
                    s_eff = len(tbl.timesteps)
                    a = int(round(cfg_itv[0] * s_eff))
                    b = int(round(cfg_itv[1] * s_eff))
                    eps_c = cfg_eps_fn_multicontext(apply_multi, [
                        {"conditioning": ci["conditioning"]}
                        for ci in c_infos], 1.0)
                    for lo, hi, fn in ((0, a, eps_c), (a, b, eps),
                                       (b, s_eff, eps_c)):
                        if hi > lo:
                            x, key = ddim_scan(
                                fn, x, key, slice_tables(tbl, lo, hi),
                                temperature, noise_dropout,
                                return_final_key=True)
                    return x
                return ddim_scan(eps, x, key, tbl, temperature, noise_dropout,
                                 return_intermediates)
            return run

        fn = self._jitted(cache_key, build)
        conds = tuple(jnp.asarray(ci["conditioning"], dtype) for ci in c_info_list)
        unconds = tuple(
            jnp.zeros_like(c) if ci.get("unconditional_conditioning") is None
            else jnp.asarray(ci["unconditional_conditioning"], dtype)
            for c, ci in zip(conds, c_info_list))
        xin = jnp.asarray(x_info.get("xt") if mode == "xt" else
                          x_info.get("x0") if mode == "x0" else
                          jnp.zeros(shape), dtype)
        choices = jnp.zeros((0,), jnp.int32) if layer_choices is None else \
            jnp.asarray(layer_choices)
        if layer_choices is None and mixing_type == "layer":
            raise ValueError("mixing_type='layer' requires layer_choices")
        return fn(params, key, conds, unconds, xin, choices)
