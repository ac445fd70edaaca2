"""Input-pipeline throughput benchmark.

Measures decoded images/s of `ImageTextPipeline` at a given resolution and
thread count so the pipeline can be sized against the training step's
consumption rate (PERF.md). With no --shards dir it synthesizes JPEG tar
shards in a temp dir first (512^2 photographs-equivalent entropy).

Usage:
  python -m vdtpu.data.benchmark [--shards DIR] [--image-size 512]
      [--batch-size 64] [--threads 1 4 8] [--max-batches 20]
"""
from __future__ import annotations

import argparse
import io
import os
import tarfile
import tempfile
import time


def synthesize_shards(root: str, n_shards: int = 2, per_shard: int = 128,
                      size: int = 512) -> str:
    import numpy as np
    from PIL import Image
    os.makedirs(root, exist_ok=True)
    rs = np.random.RandomState(0)
    for s in range(n_shards):
        path = os.path.join(root, f"shard-{s:04d}.tar")
        if os.path.exists(path):
            continue
        with tarfile.open(path, "w") as tf:
            for i in range(per_shard):
                key = f"{s * 100000 + i:09d}"
                # low-frequency noise compresses like a photo, not like static
                small = rs.rand(size // 8, size // 8, 3) * 255
                im = Image.fromarray(small.astype("uint8")).resize(
                    (size, size), Image.Resampling.BICUBIC)
                buf = io.BytesIO()
                im.save(buf, format="JPEG", quality=90)
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{key}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cap = f"synthetic caption {key}".encode()
                info = tarfile.TarInfo(f"{key}.txt")
                info.size = len(cap)
                tf.addfile(info, io.BytesIO(cap))
    return root


def run(shards: str, image_size: int, batch_size: int, threads: int,
        max_batches: int) -> float:
    from vdtpu.data.webdataset import ImageTextPipeline, ShardIndex
    index = ShardIndex.from_dir(shards)
    pipe = ImageTextPipeline(index, batch_size=batch_size,
                             image_size=image_size, shuffle_buffer=64,
                             num_threads=threads)
    it = iter(pipe)
    next(it)  # warm (thread pool up, first shard open)
    t0 = time.perf_counter()
    n = 0
    for _ in range(max_batches):
        try:
            batch = next(it)
        except StopIteration:
            break
        n += batch["image"].shape[0]
    dt = time.perf_counter() - t0
    return n / dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--shards", default=None)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--threads", type=int, nargs="+", default=[1, 4, 8])
    p.add_argument("--max-batches", type=int, default=8)
    args = p.parse_args(argv)
    shards = args.shards
    if shards is None:
        shards = synthesize_shards(
            os.path.join(tempfile.gettempdir(), f"vdtpu-bench-shards-{args.image_size}"),
            size=args.image_size)
    for t in args.threads:
        rate = run(shards, args.image_size, args.batch_size, t, args.max_batches)
        print(f"threads={t}: {rate:.1f} images/s @ {args.image_size}^2")


if __name__ == "__main__":
    main()
