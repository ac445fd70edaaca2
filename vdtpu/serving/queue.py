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

Beyond t2i, the text-output flows batch too (`submit_t2t` / `submit_i2t`
→ Future[str]): requests gathered in one sweep are grouped by flow and
each group runs as its own padded bucket (flows can't share a diffuser
batch — different latent spaces and context towers). The DDIM latents
batch exactly like t2i; the Optimus GPT-2 decode then runs per request at
batch 1 with the request's own key, because decode sampling draws
batch-shaped noise — decoding rows together would make a request's text
depend on its co-riders. The decode is a single ~30-token GPT-2 scan,
negligible next to the 50-step UNet, and batch-1 keeps one compiled
executable. i2i stays per-request (`VDInference.inference_i2i`): its
fid_lvl changes the scan length, so coalescing would recompile per
distinct level — the opposite of what the queue is for.
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
    text: str                 # prompt (t2i/t2t); unused for i2t
    seed: int
    flow: str = "t2i"         # "t2i" | "t2t" | "i2t"
    image: np.ndarray | None = None  # [1,H,W,3] float conditioning (i2t)
    future: Future = field(default_factory=Future)
    t_enq: float = field(default_factory=time.monotonic)


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

    def submit_i2t(self, image, seed: int) -> Future:
        """Image-to-text; `image` is [1,H,W,3] float in [0,1] (the
        `inference_i2t` contract); Future resolves to one string."""
        img = np.asarray(image, np.float32)
        return self._submit(_Request("", int(seed), flow="i2t", image=img))

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
            # one sweep may mix flows; each flow is its own bucket (they
            # can't share a diffuser batch). Fixed processing order keeps
            # the worker deterministic.
            for flow, proc in (("t2i", self._process_t2i),
                               ("t2t", self._process_text),
                               ("i2t", self._process_text)):
                group = [r for r in batch if r.flow == flow]
                if not group:
                    continue
                try:
                    proc(group)
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
        then per-request batch-1 GPT-2 decodes (see module docstring)."""
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
        for i, r in enumerate(batch):
            key = jax.random.fold_in(jax.random.PRNGKey(r.seed), 1)
            r.future.set_result(inf._decode_texts(x[i:i + 1], key)[0])
