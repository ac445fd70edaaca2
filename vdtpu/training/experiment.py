"""Experiment bootstrap: CLI flags, log-dir tree, cfg dump, code snapshot,
seeding, resume.

Capability parity with `/root/reference/lib/cfg_helper.py:255-586`
(`get_command_line_args` / `cfg_initiates`) and the resume plumbing — minus
everything the single-controller JAX runtime makes obsolete (MASTER_ADDR/
PORT, NCCL socket env, CUDA_VISIBLE_DEVICES, per-GPU spawn):

- experiment id = unix-time x 100 (:255-270), ``--debug`` pins
  999999999999/"debug" so runs are overwritable (:339-355),
- log tree ``log/<model>/<expid>_<signature>/`` with ``weight/`` and
  ``tensorboard/`` (:478-534),
- resolved cfg dumped as yaml + full source snapshot copied into the log dir
  (:554-574),
- resume: ``--resume_dir`` reloads the logged config and appends versioned
  copies (:272-279, 391-416).
"""
from __future__ import annotations

import argparse
import os
import shutil
import time
from typing import Any

import numpy as np
import yaml


def get_experiment_id(ref_time: float | None = None) -> int:
    return int((time.time() if ref_time is None else ref_time) * 100)


def get_command_line_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--signature", type=str, nargs="+", default=[])
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--eval", type=int, default=None)
    p.add_argument("--eval_subdir", type=str, default=None)
    p.add_argument("--pretrained", type=str, default=None)
    p.add_argument("--resume_dir", type=str, default=None)
    p.add_argument("--resume_step", type=int, default=None)
    p.add_argument("--resume_weight", type=str, default=None)
    p.add_argument("--debug", action="store_true")
    return p.parse_args(argv)


class Experiment:
    """Owns the run directory + config/code snapshot + resume state."""

    def __init__(self, cfg: dict[str, Any], log_root: str = "log",
                 signature: list[str] | None = None, debug: bool = False,
                 seed: int | None = None):
        self.cfg = cfg
        self.debug = debug
        self.seed = seed
        if debug:
            self.experiment_id = 999999999999
            signature = ["debug"]
        else:
            self.experiment_id = get_experiment_id()
        sig = "_".join(str(s) for s in (signature or []))
        model_name = cfg.get("name", cfg.get("model", "experiment"))
        self.log_dir = os.path.join(
            log_root, str(model_name),
            f"{self.experiment_id}" + (f"_{sig}" if sig else ""))
        self.weight_dir = os.path.join(self.log_dir, "weight")
        self.tb_dir = os.path.join(self.log_dir, "tensorboard")

    def initiate(self, snapshot_code_from: str | None = None) -> "Experiment":
        os.makedirs(self.weight_dir, exist_ok=True)
        os.makedirs(self.tb_dir, exist_ok=True)
        self.dump_cfg()
        if snapshot_code_from:
            self.save_code(snapshot_code_from)
        from vdtpu.utils.logging import set_log_file
        set_log_file(os.path.join(self.log_dir, "train.log"))
        if self.seed is not None:
            np.random.seed(self.seed)
        return self

    def dump_cfg(self, name: str = "config.yaml"):
        """Versioned like the reference's record_resume_cfg (:272-279)."""
        path = os.path.join(self.log_dir, name)
        if os.path.exists(path):
            n = 0
            while os.path.exists(f"{path}.version{n}"):
                n += 1
            shutil.move(path, f"{path}.version{n}")
        with open(path, "w") as f:
            yaml.safe_dump(self.cfg, f, sort_keys=False)

    def save_code(self, src_root: str):
        """Snapshot the source tree into the log dir (ref save_code :554-574)."""
        dst = os.path.join(self.log_dir, "code")
        pkg = os.path.join(src_root, "vdtpu")
        if os.path.isdir(pkg):
            shutil.copytree(
                pkg, os.path.join(dst, "vdtpu"), dirs_exist_ok=True,
                ignore=shutil.ignore_patterns("__pycache__", "*.so", "*.pyc"))
        for f in ("bench.py", "pyproject.toml"):
            p = os.path.join(src_root, f)
            if os.path.exists(p):
                os.makedirs(dst, exist_ok=True)
                shutil.copy2(p, dst)

    @classmethod
    def resume(cls, resume_dir: str) -> "Experiment":
        with open(os.path.join(resume_dir, "config.yaml")) as f:
            cfg = yaml.safe_load(f)
        exp = cls.__new__(cls)
        exp.cfg = cfg
        exp.debug = False
        exp.seed = None
        exp.log_dir = resume_dir
        exp.weight_dir = os.path.join(resume_dir, "weight")
        exp.tb_dir = os.path.join(resume_dir, "tensorboard")
        exp.experiment_id = cfg.get("experiment_id", 0)
        exp.dump_cfg()  # append a versioned copy for the resumed run
        # the resumed run logs into the same train.log (initiate() is not
        # called on resume; without this the resumed steps went only to
        # stdout — masked before launch.main cleaned up its registration)
        from vdtpu.utils.logging import set_log_file
        set_log_file(os.path.join(exp.log_dir, "train.log"))
        return exp
