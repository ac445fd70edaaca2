"""Experiment bootstrap, logging, profiling, and NaN-guard utilities."""
import os

import numpy as np
import pytest

import jax.numpy as jnp


def test_experiment_tree_and_resume(tmp_path):
    from vdtpu.training.experiment import Experiment
    cfg = {"name": "vd_test", "args": {"lr": 1e-4}}
    exp = Experiment(cfg, log_root=str(tmp_path), signature=["s1"], seed=3)
    exp.initiate(snapshot_code_from=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    assert os.path.isdir(exp.weight_dir)
    assert os.path.isfile(os.path.join(exp.log_dir, "config.yaml"))
    assert os.path.isfile(os.path.join(exp.log_dir, "code", "vdtpu",
                                       "models", "vd.py"))
    # resume appends a versioned cfg copy
    exp2 = Experiment.resume(exp.log_dir)
    assert exp2.cfg["args"]["lr"] == 1e-4
    assert os.path.isfile(os.path.join(exp.log_dir, "config.yaml.version0"))


def test_debug_experiment_is_overwritable(tmp_path):
    from vdtpu.training.experiment import Experiment
    a = Experiment({"name": "m"}, log_root=str(tmp_path), debug=True)
    b = Experiment({"name": "m"}, log_root=str(tmp_path), debug=True)
    assert a.log_dir == b.log_dir
    assert a.experiment_id == 999999999999


def test_metric_accumulator_weighted_mean():
    from vdtpu.utils.logging import MetricAccumulator
    m = MetricAccumulator()
    m.accumulate({"loss": 1.0}, weight=1)
    m.accumulate({"loss": 3.0}, weight=3)
    assert abs(m.means()["loss"] - 2.5) < 1e-9
    m.reset()
    assert m.means() == {}


def test_assert_all_finite_and_checked():
    from vdtpu.utils.debug import assert_all_finite, checked
    assert_all_finite({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError):
        assert_all_finite({"a": jnp.array([1.0, np.nan])}, "bad")

    f = checked(lambda x: jnp.log(x))
    assert np.isfinite(float(f(jnp.asarray(2.0))))
    with pytest.raises(Exception):
        f(jnp.asarray(-1.0))  # NaN from log of negative


def test_throughput_meter():
    from vdtpu.utils.profiling import ThroughputMeter
    t = ThroughputMeter()
    t.update(4)
    t.update(4)
    r = t.rates()
    assert r["units_per_sec"] > 0 and r["steps_per_sec"] > 0


def test_get_unit_registry():
    from vdtpu.utils.units import get_total_param, get_unit
    assert get_unit("relu")(jnp.asarray(-1.0)) == 0.0
    assert abs(float(get_unit("lrelu0.2")(jnp.asarray(-1.0))) + 0.2) < 1e-6
    assert float(get_unit("sine")(jnp.asarray(0.0))) == 0.0
    assert get_unit(None)(5) == 5
    with pytest.raises(KeyError):
        get_unit("nope")
    assert get_total_param({"a": jnp.zeros((2, 3)), "b": jnp.zeros(4)}) == 10
