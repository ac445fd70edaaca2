"""End-to-end integration: every inference flow on the tiny four-flow system.

This is the framework-level smoke suite the reference only has via its
cached Gradio examples (SURVEY.md section 4): all seven entry points run on
an architecturally faithful miniature with random weights.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vdtpu.serving.api import VDInference, VDSystem


@pytest.fixture(scope="module")
def vdi():
    from _tiny import make_tiny_vdi
    return make_tiny_vdi()


def test_t2i(vdi):
    out = vdi.inference_t2i("a red cat", seed=0)
    assert out.shape == (2, 64, 64, 3)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0
    # determinism: same seed -> same image
    out2 = vdi.inference_t2i("a red cat", seed=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)
    out3 = vdi.inference_t2i("a red cat", seed=1)
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 1e-4


def test_i2i_fidelity_and_color(vdi):
    im = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    out = vdi.inference_i2i(im, fid_lvl=0.5, fcs_lvl=0.5, clr_adj="Simple", seed=3)
    assert out.shape == (2, 64, 64, 3)
    # fid_lvl=1 short-circuits to the input (app.py:332-333)
    same = vdi.inference_i2i(im, fid_lvl=1, fcs_lvl=0.5, clr_adj=None, seed=3)
    np.testing.assert_allclose(np.asarray(same[0]), im[0], atol=1e-6)


def test_i2t_and_t2t(vdi):
    im = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    txts = vdi.inference_i2t(im, seed=5)
    assert isinstance(txts, list) and len(txts) == 2
    assert all(isinstance(t, str) for t in txts)
    txts2 = vdi.inference_t2t("some caption", seed=6)
    assert isinstance(txts2, list) and len(txts2) == 2


def test_dcg_and_mcg(vdi):
    im = np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32)
    out = vdi.inference_dcg(im, fcs_lvl=0.5, text="blend text",
                            textstrength=0.4, seed=7)
    assert out.shape == (2, 64, 64, 3)

    mask = np.zeros((1, 64, 64, 1), np.float32)
    mask[:, :32] = 1.0
    shown, out = vdi.inference_mcg(
        [{"image": im, "strength": 0.8, "fcs_lvl": 0.5},
         {"image": im[:, ::-1], "strength": 0.5, "fcs_lvl": 0.5, "mask": mask}],
        text=None, textstrength=0.0, seed=8)
    assert len(shown) == 2
    assert out.shape == (2, 64, 64, 3)


def test_focus_filter_noop_at_half(vdi):
    ci = jnp.asarray(np.random.RandomState(3).randn(1, 17, 96).astype(np.float32))
    out = vdi._focus_filter(ci, 0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ci))


def test_serving_paths_reuse_jit_cache(vdi):
    """Repeat requests must hit the sampler's jit cache (PERF.md: un-jitted
    sampling re-traced the whole scan per request)."""
    vdi.inference_t2i("warm", seed=0)
    cache = vdi.sys.sampler._jit_cache
    n_entries = len(cache)
    n_traces = {k: f._cache_size() for k, f in cache.items()}
    vdi.inference_t2i("again", seed=1)
    vdi.inference_t2i("and again", seed=2)
    assert len(vdi.sys.sampler._jit_cache) == n_entries
    for k, f in vdi.sys.sampler._jit_cache.items():
        assert f._cache_size() == n_traces[k], "sampler retraced on repeat call"
