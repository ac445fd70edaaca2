"""Two-process (simulated DCN) integration test (VERDICT r2 task 7).

Spawns two REAL jax.distributed CPU processes (gloo collectives) and runs
tests/_mp_worker.py in each: multihost metric means through
MetricAccumulator, ShardIndex process partitioning, and orbax
save-on-all/restore-on-all. This is the cross-node path the reference
exercises via torch.distributed + DDP (lib/utils.py:448-452), re-designed
for the multi-controller `jax.distributed.initialize` world
(vdtpu.training.launch --multihost).
"""
import json
import os
import socket
import subprocess
import sys

import pytest

from _tiny import make_shard

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(600)
def test_two_process_distributed(tmp_path):
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    for s in range(4):
        make_shard(str(shard_dir / f"shard-{s:04d}.tar"), 3, offset=s * 10)

    env = dict(os.environ)
    # a clean single-backend env: the axon sitecustomize initializes its PJRT
    # plugin at interpreter start, which pins backend config before the
    # worker can choose cpu+gloo
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + HERE
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    port = _free_port()

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_mp_worker.py"),
             str(pid), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for pid in (0, 1):
        with open(tmp_path / f"result_{pid}.json") as f:
            results[pid] = json.load(f)
    # cross-host mean agreed on both processes: (1.0 + 2.0) / 2
    assert results[0]["loss_mean"] == pytest.approx(1.5)
    assert results[1]["loss_mean"] == pytest.approx(1.5)
    # shard partition: disjoint, complete
    s0, s1 = set(results[0]["shards"]), set(results[1]["shards"])
    assert not (s0 & s1)
    assert len(s0 | s1) == 4
    # both processes restored the checkpoint written cooperatively
    assert results[0]["restored_step"] == results[1]["restored_step"] == 7
