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
    text: str
    seed: int
    future: Future = field(default_factory=Future)
    t_enq: float = field(default_factory=time.monotonic)


class BatchingQueue:
    """Batches concurrent `t2i` requests through one VDInference sampler call."""

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
        self._closed = False
        # serializes the closed-check+put pair against close(): without it a
        # submit could pass the check, lose the CPU, and enqueue behind the
        # close sentinel — a future nobody would ever resolve
        self._submit_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ---- client side ----

    def submit(self, text: str, seed: int) -> Future:
        r = _Request(text, int(seed))
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
            try:
                self._process(batch)
            except Exception as e:  # noqa: BLE001 — fail the whole batch
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _process(self, batch: list[_Request]):
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
