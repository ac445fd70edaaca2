"""Webdataset-style input pipeline for Laion-class training data.

The reference documents its training data as img2dataset-produced webdataset
tar shards of Laion2B-en (`/root/reference/README.md:50-65`) but ships no
loader at all (`lib/data_factory` is absent — SURVEY.md section 1). This is
the designed-fresh equivalent:

- `ShardIndex`: deterministic shard list with per-process (host) and
  per-epoch shuffling — multi-host sharding replaces the reference's
  DistributedSampler world (`lib/utils.py:504-535`).
- `tar_samples`: streaming tar reader grouping files by key
  ({key}.jpg + {key}.txt + {key}.json per webdataset convention).
- `ImageTextPipeline`: decode -> resize/center-crop -> [0,1] NHWC float,
  background-threaded prefetch, fixed-size batches ready for
  `Trainer.run` (drop-last semantics like the reference's partial-batch
  skip, utils.py:114-115).

Host-side decode is PIL; the C++ `vdtpu/data/native` extension accelerates
the JPEG->tensor hot path when built.
"""
from __future__ import annotations

import dataclasses
import io
import itertools
import os
import queue
import tarfile
import threading
from typing import Any, Callable, Iterator, Sequence

import numpy as np


@dataclasses.dataclass
class ShardIndex:
    shards: Sequence[str]
    process_index: int = 0
    process_count: int = 1
    seed: int = 0

    @classmethod
    def from_dir(cls, root: str, pattern: str = ".tar", **kw) -> "ShardIndex":
        shards = sorted(
            os.path.join(root, f) for f in os.listdir(root) if f.endswith(pattern))
        return cls(shards, **kw)

    def epoch_shards(self, epoch: int) -> list[str]:
        rng = np.random.RandomState(self.seed + epoch)
        order = rng.permutation(len(self.shards))
        mine = order[self.process_index::self.process_count]
        return [self.shards[i] for i in mine]


def tar_samples(path: str, use_native: bool = True) -> Iterator[dict[str, bytes]]:
    """Group tar members by basename key (webdataset convention).

    Uses the C++ indexed reader (vdtpu/data/native) when available; falls
    back to the stdlib streaming reader."""
    if use_native:
        try:
            from vdtpu.data.native import NativeTarReader, available
            if available():
                yield from _tar_samples_native(path)
                return
        except Exception:
            pass
    with tarfile.open(path, "r|*") as tf:
        cur_key: str | None = None
        cur: dict[str, bytes] = {}
        for member in tf:
            if not member.isfile():
                continue
            base = os.path.basename(member.name)
            key, _, ext = base.partition(".")
            data = tf.extractfile(member).read()
            if cur_key is None:
                cur_key = key
            if key != cur_key:
                if cur:
                    yield cur
                cur_key, cur = key, {}
            cur[ext.lower()] = data
        if cur:
            yield cur


def _tar_samples_native(path: str) -> Iterator[dict[str, bytes]]:
    from vdtpu.data.native import NativeTarReader
    with NativeTarReader(path) as rd:
        cur_key: str | None = None
        cur: dict[str, bytes] = {}
        for i in range(len(rd)):
            base = os.path.basename(rd.name(i))
            key, _, ext = base.partition(".")
            if cur_key is None:
                cur_key = key
            if key != cur_key:
                if cur:
                    yield cur
                cur_key, cur = key, {}
            cur[ext.lower()] = rd.read(i)
        if cur:
            yield cur


def decode_image(data: bytes, size: int = 512) -> np.ndarray | None:
    """JPEG/PNG bytes -> [size, size, 3] float32 in [0,1] (resize shortest
    side + center crop)."""
    try:
        from PIL import Image
        im = Image.open(io.BytesIO(data)).convert("RGB")
    except Exception:
        return None
    w, h = im.size
    scale = size / min(w, h)
    im = im.resize((max(size, round(w * scale)), max(size, round(h * scale))),
                   Image.Resampling.BICUBIC)
    w, h = im.size
    left, top = (w - size) // 2, (h - size) // 2
    im = im.crop((left, top, left + size, top + size))
    return np.asarray(im, np.float32) / 255.0


class ImageTextPipeline:
    """Shards -> decoded (image, caption) batches with threaded prefetch."""

    def __init__(
        self,
        index: ShardIndex,
        batch_size: int,
        image_size: int = 512,
        shuffle_buffer: int = 1000,
        prefetch: int = 4,
        num_threads: int = 4,
        transform: Callable[[np.ndarray, str], Any] | None = None,
    ):
        self.index = index
        self.batch_size = batch_size
        self.image_size = image_size
        self.shuffle_buffer = shuffle_buffer
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.transform = transform

    def _byte_samples(self, epoch: int) -> Iterator[tuple[bytes, str]]:
        for shard in self.index.epoch_shards(epoch):
            for sample in tar_samples(shard):
                img_bytes = sample.get("jpg") or sample.get("jpeg") or sample.get("png")
                if img_bytes is None:
                    continue
                caption = (sample.get("txt") or b"").decode("utf-8", "replace")
                yield img_bytes, caption

    def _raw_samples(self, epoch: int) -> Iterator[tuple[np.ndarray, str]]:
        """Decode in a num_threads pool (PIL releases the GIL in decode/
        resize, so threads scale); results are consumed in submission order,
        so the sample stream is bit-identical to single-threaded decode."""
        if self.num_threads <= 1:
            for data, cap in self._byte_samples(epoch):
                img = decode_image(data, self.image_size)
                if img is not None:
                    yield img, cap
            return
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        max_inflight = self.num_threads * 4
        with ThreadPoolExecutor(self.num_threads) as ex:
            pending: deque = deque()
            for data, cap in self._byte_samples(epoch):
                pending.append(
                    (ex.submit(decode_image, data, self.image_size), cap))
                if len(pending) >= max_inflight:
                    fut, c = pending.popleft()
                    img = fut.result()
                    if img is not None:
                        yield img, c
            while pending:
                fut, c = pending.popleft()
                img = fut.result()
                if img is not None:
                    yield img, c

    def _shuffled(self, epoch: int) -> Iterator[tuple[np.ndarray, str]]:
        rng = np.random.RandomState(self.index.seed + 97 * epoch)
        buf: list = []
        for item in self._raw_samples(epoch):
            if len(buf) < self.shuffle_buffer:
                buf.append(item)
                continue
            j = rng.randint(len(buf))
            yield buf[j]
            buf[j] = item
        rng.shuffle(buf)
        yield from buf

    def batches(self, epoch: int = 0) -> Iterator[dict[str, Any]]:
        """Fixed-size batches; partial trailing batch is dropped."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            imgs, caps = [], []
            for img, cap in self._shuffled(epoch):
                if self.transform is not None:
                    img, cap = self.transform(img, cap)
                imgs.append(img)
                caps.append(cap)
                if len(imgs) == self.batch_size:
                    q.put({"image": np.stack(imgs), "caption": caps})
                    imgs, caps = [], []
            q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                return
            yield item

    def __iter__(self):
        for epoch in itertools.count():
            yield from self.batches(epoch)
