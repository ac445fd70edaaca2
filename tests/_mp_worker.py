"""Worker for tests/test_multiprocess.py — one simulated host.

Run in a subprocess with a clean env (JAX_PLATFORMS=cpu, no axon site):
  python _mp_worker.py <pid> <nproc> <port> <workdir>
Exercises the cross-process (DCN) paths the reference runs through
torch.distributed (lib/utils.py:448-452): multihost metric means, shard
partitioning, and orbax save/restore with every process participating.
Writes results to <workdir>/result_<pid>.json; exit code 0 = all asserts ok.
"""
import json
import os
import sys


def main():
    pid, nproc, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    import jax
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    import numpy as np
    from jax.experimental import multihost_utils

    # 1. cross-host metric mean (ref distributed_log_manager all_reduce)
    from vdtpu.utils.logging import MetricAccumulator
    acc = MetricAccumulator()
    acc.accumulate({"loss": 1.0 + pid}, weight=1.0)
    means = acc.means()
    expect = sum(1.0 + i for i in range(nproc)) / nproc
    assert abs(means["loss"] - expect) < 1e-6, means

    # 2. ShardIndex process partitioning over the synthetic shards
    from vdtpu.data.webdataset import ShardIndex
    idx = ShardIndex.from_dir(os.path.join(workdir, "shards"),
                              process_index=jax.process_index(),
                              process_count=jax.process_count())
    mine = sorted(os.path.basename(s) for s in idx.epoch_shards(0))

    # 3. orbax checkpoint: all processes participate in save + restore
    from vdtpu.training.checkpoints import restore_checkpoint, save_checkpoint

    class State:
        params = {"w": np.arange(8, dtype=np.float32) * (1.0),
                  "b": np.full((3,), 2.5, np.float32)}
        opt_state = {"mu": np.zeros((8,), np.float32)}
        ema = None
        step = 7

    ckpt_dir = os.path.join(workdir, "ckpt")
    save_checkpoint(ckpt_dir, "iter_7", State())
    multihost_utils.sync_global_devices("saved")
    payload = restore_checkpoint(ckpt_dir, "iter_7")
    assert int(payload["step"]) == 7
    np.testing.assert_array_equal(np.asarray(payload["params"]["w"]),
                                  State.params["w"])

    with open(os.path.join(workdir, f"result_{pid}.json"), "w") as f:
        json.dump({"pid": pid, "loss_mean": means["loss"], "shards": mine,
                   "restored_step": int(payload["step"])}, f)
    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
