"""Micro-batching request queue for production serving.

The reference serves one Gradio request at a time (`app.py:244-579`); on
TPU the UNet scan saturates the MXU only at batch >= 8 (PERF.md "Batch
scaling"), so concurrent single-image requests waste most of the chip.
`BatchingQueue` coalesces concurrent text-to-image requests into one
CFG-batched sampler call:

- Requests arriving within `max_wait_ms` of each other (up to the largest
  bucket) run as one batch.
- `deadline_ms` (optional) bounds coalescing latency: once the OLDEST
  queued request has waited that long since `submit`, the worker stops
  waiting for more arrivals and dispatches the partial bucket (already
  queued requests still ride along for free). Without it, a steady
  trickle of arrivals can hold the first request for up to
  (largest_bucket - 1) x max_wait_ms before its batch even starts.
- Batch sizes are padded up to fixed `buckets` so every composition reuses
  a compiled executable — XLA recompiles on any new shape, and a fresh
  batch size costs minutes on the full model (PERF.md cold-start table).
- Each request's initial latent x_T is drawn from its OWN PRNGKey(seed)
  and passed via the sampler's `x_info["xt"]` path. With eta=0 DDIM every
  batch row is computed independently (conv/GN/attention are all
  per-sample; int8 activation scales are static post-calibration), so at
  a FIXED bucket size a request's image is bit-identical regardless of
  which co-riders or padding share its batch. Across DIFFERENT bucket
  sizes the bf16/f32 path matches to ~1e-5; the int8 path is
  quality-equivalent but not bit-equal (different batch shapes compile
  to different reduction orders, and ulp-level differences at a quantize
  boundary flip whole s8 levels). Both asserted by
  tests/test_serving_queue.py.

All JAX work happens on the single worker thread; `submit` is thread-safe
and returns a `concurrent.futures.Future` resolving to one [H,W,3] image.

ALL SEVEN flows batch (ref signatures app.py:300-579):

- `submit_t2t` / `submit_i2t` → Future[str]: requests gathered in one
  sweep are grouped by flow and each group runs as its own padded bucket
  (flows can't share a diffuser batch — different latent spaces and
  context towers). The DDIM latents batch exactly like t2i; the Optimus
  GPT-2 decode batches too, with PER-ROW key streams
  (models/optimus.py generate's [B,2] rng form) so a request's sampled
  tokens depend only on its own key — not on co-riders — by construction.
- `submit_i2i` → Future[image]: grouped by the derived
  ``x0_forward_timesteps`` count (fid_lvl quantizes to DDIM-step
  granularity anyway — int(steps*(1-fid)) — so each distinct scan LENGTH
  is its own bucket family and reuses one executable; mixing levels in a
  batch is impossible because the truncation changes the scan). The
  q-sample noise is per-row from each request's seed (the sampler's
  x_info["noise"] path). fcs_lvl / clr_adj are per-request pre/post
  steps and batch freely.
- `submit_dcg` / `submit_tcg` / `submit_mcg` → Future[image]: grouped by
  (image-context count, has-text, textstrength) — the multicontext
  conditioning shape [B, n_img*257, C] and the batch-level guidance
  scale/ratio must match across rows; per-request strengths, focus
  levels and masks ride in the conditioning VALUES, which are per-row.
  Conditioning rows come from VDInference._mcg_context at n=1 and stack.

Image inputs of ANY size are accepted: submit_* regularizes them to
``inference.output_dim`` at enqueue time (bicubic, the reference's
app.py:329-330 behavior, via serving.api.regularize_image), so every row
in a group shares H,W and one odd-sized upload can never fail its group.
VDInference regularizes again internally (idempotent) — batched == solo
holds by construction.
"""
from __future__ import annotations

import queue as _queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class _Request:
    text: str                 # prompt (t2i/t2t/dcg/mcg); unused for i2t/i2i
    seed: int
    flow: str = "t2i"         # "t2i" | "t2t" | "i2t" | "i2i" | "mcg"
    image: np.ndarray | None = None  # [1,H,W,3] float conditioning (i2t/i2i)
    fid_lvl: float = 0.0      # i2i
    fcs_lvl: float = 0.5      # i2i
    clr_adj: str | None = None  # i2i
    image_ctxs: tuple | None = None  # mcg family (dcg=1 img, tcg<=2)
    textstrength: float = 0.0  # mcg family
    future: Future = field(default_factory=Future)
    t_enq: float = field(default_factory=time.monotonic)

    def group(self, ddim_steps: int) -> tuple:
        """Batchability key: rows in one diffuser batch must share latent
        shape, scan length (i2i truncation), conditioning shape (mcg image
        count) and batch-level guidance scale/ratio (mcg textstrength)."""
        if self.flow == "i2i":
            k = int(ddim_steps * (1 - self.fid_lvl)) if self.fid_lvl else None
            return ("i2i", k)
        if self.flow == "mcg":
            has_text = bool(self.text) and self.textstrength != 0
            return ("mcg", len(self.image_ctxs), has_text,
                    round(float(self.textstrength), 6) if has_text else 0.0)
        return (self.flow,)


class BatchingQueue:
    """Batches concurrent t2i / t2t / i2t requests through shared
    VDInference sampler calls, grouped per flow."""

    def __init__(self, inference, buckets=(1, 2, 4, 8), max_wait_ms: float = 20.0,
                 deadline_ms: float | None = None):
        if float(inference.ddim_eta) != 0.0:
            raise ValueError("BatchingQueue requires eta=0 (deterministic DDIM): "
                             "eta>0 draws batch-shaped noise, which would make "
                             "results depend on batch composition")
        self.inf = inference
        self.buckets = tuple(sorted(int(b) for b in buckets))
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.deadline_s = None if deadline_ms is None else float(deadline_ms) / 1e3
        self._q: _queue.Queue[_Request | None] = _queue.Queue()
        self._uncond1 = None  # [1, 77, ctx] encoding of "", computed once
        self._uncond_img1 = None  # [1, 257, ctx] zeros-image encoding (i2t)
        self._closed = False
        # serializes the closed-check+put pair against close(): without it a
        # submit could pass the check, lose the CPU, and enqueue behind the
        # close sentinel — a future nobody would ever resolve
        self._submit_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ---- client side ----

    def submit(self, text: str, seed: int) -> Future:
        """Text-to-image; Future resolves to one [H,W,3] image."""
        return self._submit(_Request(text, int(seed)))

    def submit_t2t(self, text: str, seed: int) -> Future:
        """Text variation; Future resolves to one string."""
        return self._submit(_Request(text, int(seed), flow="t2t"))

    def _reg(self, image, method: str = "bicubic") -> np.ndarray:
        """Regularize an input image/mask to output_dim at enqueue time
        (module docstring: group rows must share H,W)."""
        from vdtpu.serving.api import regularize_image
        return np.asarray(regularize_image(
            np.asarray(image, np.float32), self.inf.output_dim, method))

    def submit_i2t(self, image, seed: int) -> Future:
        """Image-to-text; `image` is [1,H,W,3] float in [0,1], any H,W (the
        `inference_i2t` contract); Future resolves to one string."""
        return self._submit(_Request("", int(seed), flow="i2t",
                                     image=self._reg(image)))

    def submit_i2i(self, image, fid_lvl: float, fcs_lvl: float,
                   clr_adj: str | None, seed: int) -> Future:
        """Image variation (inference_i2i contract, any input H,W); Future
        resolves to one [H,W,3] image at output_dim. fid_lvl=1 short-circuits
        to the REGULARIZED input (resize precedes the check, app.py:326-330)."""
        img = self._reg(image)
        if float(fid_lvl) == 1.0:
            f = Future()
            f.set_result(img[0])
            return f
        return self._submit(_Request("", int(seed), flow="i2i", image=img,
                                     fid_lvl=float(fid_lvl),
                                     fcs_lvl=float(fcs_lvl), clr_adj=clr_adj))

    def submit_dcg(self, image, fcs_lvl: float, text: str,
                   textstrength: float, seed: int) -> Future:
        """Dual-context guidance (inference_dcg contract)."""
        return self.submit_mcg(
            [{"image": np.asarray(image, np.float32), "strength": 1.0,
              "fcs_lvl": fcs_lvl}],
            text=text, textstrength=textstrength, seed=seed)

    def submit_tcg(self, image_ctxs, text, textstrength, seed: int) -> Future:
        """Triple-context = mcg limited to two images (inference_tcg)."""
        return self.submit_mcg(list(image_ctxs)[:2], text, textstrength, seed)

    def submit_mcg(self, image_ctxs, text: str | None, textstrength: float,
                   seed: int) -> Future:
        """Multi-context blend; Future resolves to one [H,W,3] image
        (inference_mcg semantics minus the echoed inputs_shown)."""
        ctxs = tuple(dict(c) for c in image_ctxs
                     if c is not None and c.get("image") is not None)
        if not ctxs:
            raise ValueError("mcg needs at least one image context")
        for c in ctxs:  # uniform H,W across the group (module docstring)
            c["image"] = self._reg(c["image"])
            if c.get("mask") is not None:
                c["mask"] = self._reg(c["mask"], "bilinear")
        return self._submit(_Request(text or "", int(seed), flow="mcg",
                                     image_ctxs=ctxs,
                                     textstrength=float(textstrength)))

    def _submit(self, r: _Request) -> Future:
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("queue is closed")
            self._q.put(r)
        return r.future

    def close(self):
        """Drain remaining requests, then stop the worker."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)  # under the lock: nothing can enqueue after it
        self._worker.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- worker side ----

    def _gather(self) -> list[_Request] | None:
        """Block for the first request, then coalesce arrivals up to the
        largest bucket, until max_wait_ms passes with an empty queue, or —
        with deadline_ms set — until the oldest request's latency budget
        for coalescing is spent (measured from its `submit`, so time spent
        queued behind a previous in-flight batch counts)."""
        first = self._q.get()
        if first is None:
            return None
        batch = [first]
        deadline = (None if self.deadline_s is None
                    else first.t_enq + self.deadline_s)
        while len(batch) < self.buckets[-1]:
            timeout = self.max_wait_s
            if deadline is not None:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    # budget spent: sweep whatever is already queued
                    # (free riders), but don't wait for new arrivals
                    timeout = None
                else:
                    timeout = min(timeout, remaining)
            try:
                r = (self._q.get_nowait() if timeout is None
                     else self._q.get(timeout=timeout))
            except _queue.Empty:
                break
            if r is None:  # close(): process what we have, then stop
                self._q.put(None)
                break
            batch.append(r)
        return batch

    def _run(self):
        while True:
            batch = self._gather()
            if batch is None:
                return
            # one sweep may mix flows and batchability classes; each group
            # key is its own bucket (_Request.group). Sorted processing
            # order keeps the worker deterministic.
            procs = {"t2i": self._process_t2i, "t2t": self._process_text,
                     "i2t": self._process_text, "i2i": self._process_i2i,
                     "mcg": self._process_mcg}
            groups: dict[tuple, list[_Request]] = {}
            for r in batch:
                groups.setdefault(r.group(self.inf.ddim_steps), []).append(r)
            for gkey in sorted(groups, key=str):
                group = groups[gkey]
                try:
                    procs[group[0].flow](group)
                except Exception as e:  # noqa: BLE001 — fail the whole group
                    for r in group:
                        if not r.future.done():
                            r.future.set_exception(e)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _process_t2i(self, batch: list[_Request]):
        inf, n = self.inf, len(batch)
        b = self._bucket(n)
        if self._uncond1 is None:
            self._uncond1 = inf._encode_text([""])
        # batched CLIP encode of the request texts; padding rows replicate
        # request 0 (cheap, NaN-free; their outputs are discarded)
        texts = [r.text for r in batch] + [batch[0].text] * (b - n)
        c = inf._encode_text(texts)
        u = jnp.tile(self._uncond1, (b, 1, 1))
        shape = inf._image_shape(b)
        row = (1,) + shape[1:]
        xt = jnp.concatenate(
            [jax.random.normal(jax.random.PRNGKey(r.seed), row, inf.sys.dtype)
             for r in batch]
            + [jnp.zeros(row, inf.sys.dtype)] * (b - n), axis=0)
        x = inf._sample(
            jax.random.PRNGKey(0), shape, {"type": "image", "xt": xt},
            {"type": "text", "conditioning": c,
             "unconditional_conditioning": u,
             "unconditional_guidance_scale": inf.scale_textto})
        imgs = np.asarray(inf.sys.vae_decode(x, "image"))
        for i, r in enumerate(batch):
            r.future.set_result(imgs[i])

    def _process_text(self, batch: list[_Request]):
        """One DDIM pass over the text-latent rows of a t2t OR i2t group,
        then ONE batched GPT-2 decode with per-row key streams (see module
        docstring)."""
        inf, n = self.inf, len(batch)
        b = self._bucket(n)
        flow = batch[0].flow
        if flow == "t2t":
            if self._uncond1 is None:
                self._uncond1 = inf._encode_text([""])
            texts = [r.text for r in batch] + [batch[0].text] * (b - n)
            c = inf._encode_text(texts)
            u = jnp.tile(self._uncond1, (b, 1, 1))
            scale = inf.scale_textto
        else:  # i2t: batched CLIP-vision encode of the request images
            # (all images in a group must share H,W; ctx_encode resizes to
            # the CLIP grid afterwards, so pre-resize varied inputs)
            imgs = np.concatenate([r.image for r in batch]
                                  + [batch[0].image] * (b - n), axis=0)
            c = inf.sys.ctx_encode(jnp.asarray(imgs), "image")
            if self._uncond_img1 is None:
                # zeros-image rows encode identically → encode once, tile
                self._uncond_img1 = inf.sys.ctx_encode(
                    jnp.zeros_like(jnp.asarray(batch[0].image)), "image")
            u = jnp.tile(self._uncond_img1, (b, 1, 1))
            scale = inf.scale_imgto
        shape = (b, inf.text_latent_dim)
        xt = jnp.concatenate(
            [jax.random.normal(jax.random.PRNGKey(r.seed), (1,) + shape[1:],
                               inf.sys.dtype) for r in batch]
            + [jnp.zeros((1,) + shape[1:], inf.sys.dtype)] * (b - n), axis=0)
        x = inf._sample(
            jax.random.PRNGKey(0), shape, {"type": "text", "xt": xt},
            {"type": "text" if flow == "t2t" else "image", "conditioning": c,
             "unconditional_conditioning": u,
             "unconditional_guidance_scale": scale})
        # one batched GPT-2 decode: row i samples from request i's own key
        # stream (padding rows burn a dummy key; their text is discarded)
        keys = jnp.stack(
            [jax.random.fold_in(jax.random.PRNGKey(r.seed), 1) for r in batch]
            + [jax.random.PRNGKey(0)] * (b - n), axis=0)
        texts_out = inf._decode_texts(x, keys)
        for i, r in enumerate(batch):
            r.future.set_result(texts_out[i])

    def _process_i2i(self, batch: list[_Request]):
        """Batched image variation: every request in the group shares the
        same x0_forward_timesteps (the _Request.group key), so the
        truncated scan compiles once per (bucket, level) pair. Each row's
        conditioning/x0 comes from its own input; the q-sample noise is
        per-row from the request's seed (composition-independent)."""
        inf, n = self.inf, len(batch)
        b = self._bucket(n)
        fwd = batch[0].group(inf.ddim_steps)[1]
        cis = []
        for r in batch:
            ci = inf.sys.ctx_encode(jnp.asarray(r.image), "image")
            cis.append(inf._focus_filter(ci, r.fcs_lvl))
        c = jnp.concatenate(cis + [cis[0]] * (b - n), axis=0)
        u = jnp.zeros_like(c)
        shape = inf._image_shape(b)
        row = (1,) + shape[1:]
        x_info = {"type": "image"}
        if fwd is not None:
            x0s = [inf.sys.vae_encode(jnp.asarray(r.image), "image")
                   for r in batch]
            x0 = jnp.concatenate(x0s + [x0s[0]] * (b - n), axis=0)
            noise = jnp.concatenate(
                [jax.random.normal(jax.random.PRNGKey(r.seed), row,
                                   inf.sys.dtype) for r in batch]
                + [jnp.zeros(row, inf.sys.dtype)] * (b - n), axis=0)
            x_info = {"type": "image", "x0": x0,
                      "x0_forward_timesteps": fwd, "noise": noise}
        else:
            xt = jnp.concatenate(
                [jax.random.normal(jax.random.PRNGKey(r.seed), row,
                                   inf.sys.dtype) for r in batch]
                + [jnp.zeros(row, inf.sys.dtype)] * (b - n), axis=0)
            x_info = {"type": "image", "xt": xt}
        x = inf._sample(
            jax.random.PRNGKey(0), shape, x_info,
            {"type": "image", "conditioning": c,
             "unconditional_conditioning": u,
             "unconditional_guidance_scale": inf.scale_imgto})
        imgs = np.asarray(inf.sys.vae_decode(x, "image"))
        from vdtpu.serving.postprocess import color_adjust_simple
        for i, r in enumerate(batch):
            out = imgs[i]
            if r.clr_adj == "Simple":
                out = np.asarray(color_adjust_simple(
                    out[None], jnp.asarray(r.image))[0])
            r.future.set_result(out)

    def _process_mcg(self, batch: list[_Request]):
        """Batched multi-context guidance (covers dcg/tcg/mcg): every
        request in the group shares (image count, has-text, textstrength)
        — the conditioning SHAPE and the batch-level scale/ratio — while
        per-request strengths/focus/masks live in the conditioning rows.
        Rows are built by _mcg_context at n=1 and stacked."""
        inf, n = self.inf, len(batch)
        b = self._bucket(n)
        row_infos = [inf._mcg_context(list(r.image_ctxs), r.text,
                                      r.textstrength, n=1)[1] for r in batch]
        c_info_list = []
        for e in range(len(row_infos[0])):
            rows = [ri[e]["conditioning"] for ri in row_infos]
            urows = [ri[e]["unconditional_conditioning"] for ri in row_infos]
            c_info_list.append(dict(
                row_infos[0][e],
                conditioning=jnp.concatenate(
                    rows + [rows[0]] * (b - n), axis=0),
                unconditional_conditioning=jnp.concatenate(
                    urows + [urows[0]] * (b - n), axis=0)))
        shape = inf._image_shape(b)
        row = (1,) + shape[1:]
        xt = jnp.concatenate(
            [jax.random.normal(jax.random.PRNGKey(r.seed), row, inf.sys.dtype)
             for r in batch]
            + [jnp.zeros(row, inf.sys.dtype)] * (b - n), axis=0)
        x = inf._sample_multi(jax.random.PRNGKey(0), shape,
                              {"type": "image", "xt": xt}, c_info_list)
        imgs = np.asarray(inf.sys.vae_decode(x, "image"))
        for i, r in enumerate(batch):
            r.future.set_result(imgs[i])
