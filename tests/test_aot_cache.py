"""Serving cold start: persisted executables (vdtpu/serving/aot.py).

The t2i scan compiles for minutes on the tunneled TPU backend and the stock
persistent cache misses it (PERF.md); CachedCompile serializes the compiled
executable so a warm boot deserializes in seconds (VERDICT r1 item 9).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_cached_compile_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("VDTPU_AOT_CACHE", str(tmp_path))
    from vdtpu.serving import aot

    calls = {"compiles": 0}

    def make(key):
        cc = aot.CachedCompile(lambda x: (x * 2 + 1).sum(), key=key)
        orig = cc._compile

        def counting(args):
            calls["compiles"] += 1
            return orig(args)
        cc._compile = counting
        return cc

    x = jnp.ones((8, 8))
    f1 = make("k1")
    np.testing.assert_allclose(float(f1(x)), 192.0)
    assert calls["compiles"] == 1
    assert any(p.name.startswith("exe-") for p in tmp_path.iterdir())

    # a fresh instance (fresh process stand-in) loads from disk, no compile
    f2 = make("k1")
    np.testing.assert_allclose(float(f2(x)), 192.0)
    assert calls["compiles"] == 1

    # shape drift falls back to a recompile instead of failing
    y = jnp.ones((4, 4))
    np.testing.assert_allclose(float(f2(y)), 48.0)
    assert calls["compiles"] == 2


def test_runtime_error_propagates_without_recompile(tmp_path, monkeypatch):
    """ADVICE r2: a genuine runtime failure must surface, not disappear
    behind a silent minutes-long recompile-and-retry."""
    monkeypatch.setenv("VDTPU_AOT_CACHE", str(tmp_path))
    from vdtpu.serving import aot

    cc = aot.CachedCompile(lambda x: x + 1, key="kboom")
    x = jnp.ones((4,))
    np.testing.assert_allclose(np.asarray(cc(x)), 2.0)

    compiles = {"n": 0}
    orig = cc._compile

    def counting(args):
        compiles["n"] += 1
        return orig(args)
    cc._compile = counting

    class Exploding:  # stands in for an executable hitting an OOM/transfer error
        def __call__(self, *a):
            raise RuntimeError("boom")

    cc._compiled = Exploding()
    with pytest.raises(RuntimeError, match="boom"):
        cc(x)
    assert compiles["n"] == 0  # no silent recompile cycle


@pytest.fixture
def fresh_hlo_cache(tmp_path):
    """Isolate the persistent HLO cache for serialize-roundtrip tests.

    XLA:CPU quirk (virtual-CPU suite only): serializing an executable that
    was itself LOADED from the persistent compilation cache produces a
    payload whose deserialized program can fail at readback ("Buffer
    Definition Event: Function ... not found") when bound to a device
    subset. A fresh cache dir makes every compile genuine, so the
    serialize source is always a real compile. The chip backend (1
    device, TPU loader) does not have this path."""
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path / "hlo"))
    yield
    jax.config.update("jax_compilation_cache_dir", old)


def test_sampler_uses_aot_cache(tmp_path, monkeypatch, fresh_hlo_cache):
    monkeypatch.setenv("VDTPU_AOT_CACHE", str(tmp_path))
    from vdtpu.ops.schedules import DiffusionSchedule
    from vdtpu.sampling.ddim import DDIMSampler

    class Stub:
        schedule = DiffusionSchedule.create(timesteps=100)

        def apply_model(self, params, x, t, c, x_type, c_type):
            return 0.1 * x

    cond = np.zeros((1, 2, 3), np.float32)
    ci = {"type": "text", "conditioning": cond,
          "unconditional_guidance_scale": 1.0}
    xi = {"type": "image"}
    s1 = DDIMSampler(Stub())
    out1 = s1.sample({}, jax.random.PRNGKey(0), 4, (1, 4, 4, 4), xi, ci)
    files = [p for p in tmp_path.iterdir() if p.name.startswith("exe-")]
    assert files, "sampler executable not persisted"

    s2 = DDIMSampler(Stub())  # fresh sampler: must hit the disk cache
    out2 = s2.sample({}, jax.random.PRNGKey(0), 4, (1, 4, 4, 4), xi, ci)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    from vdtpu.serving.aot import CachedCompile
    fn = next(iter(s2._jit_cache.values()))
    assert isinstance(fn, CachedCompile)


def test_warm_loads_and_executes_without_real_args(tmp_path, monkeypatch,
                                                   fresh_hlo_cache):
    """warm() pays the program-load tax from the cached artifact alone:
    it builds zero args from the executable's own args_info (no real
    params needed), so a serving boot can warm in a background thread
    while param fill / calibration run (VERDICT r4 task 2)."""
    monkeypatch.setenv("VDTPU_AOT_CACHE", str(tmp_path))
    from vdtpu.serving import aot

    # populate the cache
    f = lambda p, x: (p["w"] * x).sum() + p["b"]
    cc = aot.CachedCompile(f, key="kwarm")
    args = ({"w": jnp.full((4, 4), 2.0), "b": jnp.float32(1.0)},
            jnp.ones((4, 4)))
    np.testing.assert_allclose(float(cc(*args)), 33.0)

    # fresh instance with NO compile fn: warm() must load + execute
    cc2 = aot.CachedCompile(None, key="kwarm")
    assert cc2.warm() is True
    assert cc2._compiled is not None
    # real call afterwards works and needs no compile
    compiles = {"n": 0}
    cc2._compile = lambda a: compiles.update(n=compiles["n"] + 1)
    np.testing.assert_allclose(float(cc2(*args)), 33.0)
    assert compiles["n"] == 0

    # cache miss: warm() is a harmless no-op returning False
    cc3 = aot.CachedCompile(None, key="knever-compiled")
    assert cc3.warm() is False
