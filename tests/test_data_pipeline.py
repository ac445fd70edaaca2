"""Webdataset pipeline: shard sharding, tar grouping, batching."""
import io
import os
import tarfile

import numpy as np
import pytest

from vdtpu.data.webdataset import ImageTextPipeline, ShardIndex, tar_samples
from _tiny import make_shard as _make_shard


@pytest.fixture()
def shards(tmp_path):
    paths = []
    for s in range(4):
        p = tmp_path / f"shard-{s:04d}.tar"
        _make_shard(str(p), 6, offset=s * 100)
        paths.append(str(p))
    return tmp_path


def test_tar_grouping(shards):
    idx = ShardIndex.from_dir(str(shards))
    samples = list(tar_samples(idx.shards[0]))
    assert len(samples) == 6
    assert set(samples[0]) == {"jpg", "txt"}


def test_process_sharding_partitions(shards):
    a = ShardIndex.from_dir(str(shards), process_index=0, process_count=2)
    b = ShardIndex.from_dir(str(shards), process_index=1, process_count=2)
    sa, sb = set(a.epoch_shards(0)), set(b.epoch_shards(0))
    assert not (sa & sb)
    assert len(sa | sb) == 4
    # reshuffled across epochs
    assert a.epoch_shards(0) != a.epoch_shards(1) or \
        b.epoch_shards(0) != b.epoch_shards(1)


def test_batches(shards):
    idx = ShardIndex.from_dir(str(shards))
    pipe = ImageTextPipeline(idx, batch_size=8, image_size=32, shuffle_buffer=4)
    batches = list(pipe.batches(0))
    assert len(batches) == 3  # 24 samples / 8, drop-last
    b = batches[0]
    assert b["image"].shape == (8, 32, 32, 3)
    assert b["image"].dtype == np.float32
    assert 0.0 <= b["image"].min() and b["image"].max() <= 1.0
    assert len(b["caption"]) == 8


def test_threaded_decode_matches_single_thread(shards):
    """num_threads>1 must produce the bit-identical batch stream (decode
    results are consumed in submission order) — round 1 ignored the arg."""
    mk = lambda t: ImageTextPipeline(
        ShardIndex.from_dir(str(shards)), batch_size=4, image_size=32,
        shuffle_buffer=8, num_threads=t)
    b1 = list(mk(1).batches(epoch=0))
    b4 = list(mk(4).batches(epoch=0))
    assert len(b1) == len(b4) > 0
    for a, b in zip(b1, b4):
        np.testing.assert_array_equal(a["image"], b["image"])
        assert a["caption"] == b["caption"]


def test_pipeline_benchmark_runs(tmp_path):
    """The throughput benchmark module end-to-end on tiny synthetic shards."""
    from vdtpu.data.benchmark import run, synthesize_shards
    root = synthesize_shards(str(tmp_path / "shards"), n_shards=1,
                             per_shard=24, size=64)
    rate = run(root, image_size=64, batch_size=8, threads=4, max_batches=2)
    assert rate > 0


def test_native_tar_reader(shards):
    native = pytest.importorskip("vdtpu.data.native")
    if not native.available():
        pytest.skip("g++ build unavailable")
    idx = ShardIndex.from_dir(str(shards))
    with native.NativeTarReader(idx.shards[0]) as rd:
        assert len(rd) == 12  # 6 samples x (jpg + txt)
        names = [rd.name(i) for i in range(len(rd))]
        assert any(n.endswith(".jpg") for n in names)
        data = rd.read(0)
        assert len(data) > 0
    # native and stdlib paths agree
    nat = list(tar_samples(idx.shards[0], use_native=True))
    std = list(tar_samples(idx.shards[0], use_native=False))
    assert len(nat) == len(std) == 6
    for a, b in zip(nat, std):
        assert a.keys() == b.keys()
        for k in a:
            assert a[k] == b[k]
