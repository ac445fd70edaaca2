"""End-to-end launcher execution (VERDICT r2 missing #2).

Runs ``vdtpu.training.launch.main`` — the ``main.py`` equivalent composing
config -> Experiment -> VDSystem -> mesh -> Trainer -> data — exactly as the
CLI would, on synthetic webdataset shards and the tiny four-flow system:

  1. train to completion (checkpoints written, steps logged),
  2. resume from the run dir after raising the iteration budget
     (step counter continues, no restart from 0),
  3. ``--eval`` (writes ``summary.yaml`` with a finite metric).

Ref: /root/reference/main.py:17-46, lib/utils.py:79-85,567-601.
"""
import glob
import os
import re

import pytest
import yaml

from _tiny import make_shard, write_tiny_clip_vocab


@pytest.fixture()
def launch_env(tmp_path, monkeypatch):
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    for s in range(4):
        make_shard(str(shard_dir / f"shard-{s:04d}.tar"), 6, offset=s * 100)
    vocab, merges = tmp_path / "vocab.json", tmp_path / "merges.txt"
    write_tiny_clip_vocab(str(vocab), str(merges))
    import jax
    dp = jax.device_count()  # data.batch_size must divide by dp
    ecfg = {
        "name": "launch_tiny",
        "model": "vd_test_tiny",
        "bf16": False,
        "pretrained": None,
        "clip_vocab": str(vocab),
        "clip_merges": str(merges),
        "clip_max_length": 16,
        "data": {"shards": str(shard_dir), "batch_size": dp,
                 "image_size": 64, "shuffle_buffer": 4},
        "train": {"x_type": "image", "c_type": "text", "num_iters": 2,
                  "batch_size": dp, "gradacc_every": 1, "tp": 1,
                  "optimizer": "adamw", "optimizer_args": {},
                  "scheduler": {"type": "constant", "lr": 1.0e-4},
                  "ema_decay": 0.999, "log_every": 1, "ckpt_every": 2},
        "eval": {"ddim_steps": 2, "scale": 7.5, "latent_size": 32,
                 "latent_dim": 4, "evaluator": "clip_similarity",
                 "sampler": "dpmpp2m",  # eval-throughput knob (launch.py)
                 "max_batches": 1, "seed": 0},
    }
    cfg_path = tmp_path / "exp.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(ecfg, f)
    monkeypatch.chdir(tmp_path)  # Experiment's log tree goes under cwd/log
    return cfg_path


def test_launch_train_resume_eval(launch_env, capsys):
    from vdtpu.training.launch import main

    # ---- 1. fresh training run to num_iters=2 ----
    main(["--config", str(launch_env)])
    runs = glob.glob("log/launch_tiny/*")
    assert len(runs) == 1, runs
    run_dir = runs[0]
    assert os.path.exists(os.path.join(run_dir, "config.yaml"))
    weight = os.path.join(run_dir, "weight")
    assert os.path.isdir(os.path.join(weight, "iter_2"))
    assert os.path.isdir(os.path.join(weight, "last"))
    log_text = open(os.path.join(run_dir, "train.log")).read()
    assert re.search(r"Iter 1 \|", log_text) and re.search(r"Iter 2 \|", log_text)

    # ---- 2. operator raises the budget and resumes the same run dir ----
    cfg_file = os.path.join(run_dir, "config.yaml")
    with open(cfg_file) as f:
        cfg = yaml.safe_load(f)
    cfg["train"]["num_iters"] = 4
    with open(cfg_file, "w") as f:
        yaml.safe_dump(cfg, f)
    main(["--config", str(launch_env), "--resume_dir", run_dir])
    # the resumed run continued from step 2 (no fresh iter-1/2 checkpoints,
    # a versioned config copy recorded, step counter advanced to 4)
    assert os.path.isdir(os.path.join(weight, "iter_4"))
    assert os.path.exists(cfg_file + ".version0")
    log_text = open(os.path.join(run_dir, "train.log")).read()
    assert log_text.count("Iter 2 |") == 1  # steps 1-2 not re-run
    assert re.search(r"Iter 3 \|", log_text) and re.search(r"Iter 4 \|", log_text)
    loss_vals = [float(m) for m in re.findall(r"loss[^0-9-]*([0-9.eE+-]+)", log_text)]
    assert loss_vals and all(v == v and abs(v) < 1e6 for v in loss_vals)

    # ---- 3. eval-only container ----
    summary = main(["--config", str(launch_env), "--eval"])
    assert summary, "run_eval returned nothing"
    eval_runs = sorted(glob.glob("log/launch_tiny/*"))
    eval_dir = [r for r in eval_runs if r != run_dir][-1]
    spath = os.path.join(eval_dir, "eval", "summary.yaml")
    assert os.path.exists(spath)
    with open(spath) as f:
        written = yaml.safe_load(f)
    for k, v in written.items():
        assert v == v, f"{k} is NaN"

    # ---- 4. eval of the trained run's own weights (EMA shadow) ----
    capsys.readouterr()
    summary2 = main(["--config", str(launch_env), "--eval",
                     "--resume_dir", run_dir, "--eval_subdir", "eval_ema"])
    assert summary2
    out = capsys.readouterr().out
    assert "loaded trained checkpoint 'last'" in out
    spath2 = os.path.join(run_dir, "eval_ema", "summary.yaml")
    assert os.path.exists(spath2)


def test_encode_batches_chunked_equals_full():
    """encode_chunk bounds the device-side ingest peak (the 512^2 VAE
    encode OOMs a 16 GB chip at batch 16 alongside resident training
    state) — chunked and full-batch encoding must produce identical
    training batches, including a ragged final chunk."""
    import numpy as np

    from vdtpu.training.launch import encode_batches

    class StubSystem:
        def vae_encode(self, img, x_type):
            assert x_type == "image"
            return np.asarray(img) * 2.0

        def ctx_encode(self, ids, c_type):
            assert c_type == "text"
            return np.asarray(ids, np.float32)[:, :, None] + 1.0

    def tok(texts):
        return np.array([[len(t), ord(t[-1])] for t in texts], np.int64)

    rng = np.random.RandomState(0)
    raw = [{"image": rng.rand(6, 4, 4, 3).astype(np.float32),
            "caption": [f"cap {i}" for i in range(6)]} for _ in range(2)]

    full = list(encode_batches(iter(raw), StubSystem(), tokenizer=tok))
    for chunk in (4, 2, 1, 99):  # 4 exercises the ragged 6 = 4 + 2 split
        chunked = list(encode_batches(iter(raw), StubSystem(),
                                      tokenizer=tok, encode_chunk=chunk))
        assert len(chunked) == len(full)
        for a, b in zip(full, chunked):
            np.testing.assert_array_equal(a["x"], b["x"])
            np.testing.assert_array_equal(a["ctx"], b["ctx"])


def test_cached_latent_batches_frees_towers_and_cycles():
    """data.cache_latents (launch.cached_latent_batches): encodes exactly N
    batches eagerly, frees the frozen VAE/CLIP tower params, then replays
    the cache forever as per-epoch shuffles of the SAME batch set — the
    single-chip full-size memory contract (PERF.md round 5)."""
    import itertools

    import numpy as np

    from vdtpu.training.launch import cached_latent_batches

    class StubSystem:
        def __init__(self):
            self.params = {"diffuser": {"w": np.ones(3)},
                           "vae": {"image": {"w": np.ones(2)}},
                           "ctx": {"text": {"w": np.ones(2)}}}
            self.encodes = 0

        def vae_encode(self, img, x_type):
            self.encodes += 1
            return np.asarray(img) * 2.0

        def ctx_encode(self, ids, c_type):
            return np.asarray(ids, np.float32)[:, :, None] + 1.0

    def tok(texts):
        return np.array([[len(t), ord(t[-1])] for t in texts], np.int64)

    rng = np.random.RandomState(0)
    raw = [{"image": rng.rand(2, 4, 4, 3).astype(np.float32),
            "caption": [f"cap {b}{i}" for i in range(2)]}
           for b in range(5)]
    sys_ = StubSystem()
    it = cached_latent_batches(itertools.cycle(raw), sys_, tokenizer=tok,
                               num_batches=3, seed=0)
    # encode ran eagerly, bounded at num_batches, and the towers are freed
    assert sys_.encodes == 3
    assert sys_.params["vae"]["image"] is None
    assert sys_.params["ctx"]["text"] is None
    assert sys_.params["diffuser"] is not None  # the trainable tree stays

    def keyset(batches):
        return sorted(b["x"].tobytes() for b in batches)

    epoch1 = [next(it) for _ in range(3)]
    epoch2 = [next(it) for _ in range(3)]
    assert keyset(epoch1) == keyset(epoch2)  # same cache, reshuffled
    assert sys_.encodes == 3                 # replay never re-encodes


def test_launch_cache_latents_end_to_end(launch_env):
    """launch.main with data.cache_latents trains through the cached-ingest
    path (integration: cache built before the Trainer, run completes)."""
    import yaml

    from vdtpu.training.launch import main

    with open(launch_env) as f:
        cfg = yaml.safe_load(f)
    cfg["name"] = "launch_cached"
    cfg["data"]["cache_latents"] = 2
    with open(launch_env, "w") as f:
        yaml.safe_dump(cfg, f)
    main(["--config", str(launch_env)])
    runs = glob.glob("log/launch_cached/*")
    assert len(runs) == 1, runs
    log_text = open(os.path.join(runs[0], "train.log")).read()
    assert re.search(r"Iter 2 \|", log_text)
