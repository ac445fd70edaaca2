"""Limited-interval classifier-free guidance (sampling/ddim.py cfg_interval).

Opt-in approximate serving mode (Kynkäänniemi et al., arXiv 2404.07724):
CFG runs only on a (lo, hi) band of the sampling trajectory; outside it the
conditional model runs alone at half the UNet batch. Implementation under
test: three statically-sliced scan segments with the PRNG key threaded
through, which must reproduce the single-scan key stream exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vdtpu.ops.schedules import DiffusionSchedule
from vdtpu.sampling.ddim import DDIMSampler


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule.create(1000, "linear", 0.00085, 0.012)


class _Toy:
    """eps depends on both x and the context, so CFG vs cond-only differ."""
    def __init__(self, sched):
        self.schedule = sched

    def apply_model(self, params, x, t, c, x_type, c_type):
        bias = jnp.tanh(c.mean(axis=(1, 2)))[:, None, None, None]
        return 0.1 * x + 0.05 * bias


def _c_info(scale, uncond_equals_cond=False):
    rs = np.random.RandomState(1)
    cond = rs.randn(2, 3, 8).astype(np.float32)
    uncond = cond if uncond_equals_cond else rs.randn(2, 3, 8).astype(np.float32)
    return {"type": "text", "conditioning": cond,
            "unconditional_conditioning": uncond,
            "unconditional_guidance_scale": scale}


def _run(sampler, c_info, **kw):
    return np.asarray(sampler.sample(
        None, jax.random.PRNGKey(0), 8, (2, 4, 4, 3),
        {"type": "image"}, c_info, **kw))


def test_full_interval_bitwise_equals_plain(sched):
    s = DDIMSampler(_Toy(sched))
    ci = _c_info(5.0)
    np.testing.assert_array_equal(
        _run(s, ci, cfg_interval=(0.0, 1.0)), _run(s, ci))


def test_key_stream_threads_across_segments(sched):
    """With uncond == cond the CFG eps collapses to the cond-only eps, so a
    segmented run differs from the plain run ONLY through the noise draws —
    eta=1 equality proves the carry key crosses segment boundaries exactly
    as one long scan."""
    s = DDIMSampler(_Toy(sched))
    ci = _c_info(5.0, uncond_equals_cond=True)
    a = _run(s, ci, eta=1.0, cfg_interval=(0.25, 0.75))
    b = _run(s, ci, eta=1.0)
    np.testing.assert_array_equal(a, b)


def test_empty_interval_equals_cond_only(sched):
    s = DDIMSampler(_Toy(sched))
    got = _run(s, _c_info(5.0), cfg_interval=(0.0, 0.0))
    want = _run(s, _c_info(1.0))  # scale 1 -> plain cond-only path
    np.testing.assert_array_equal(got, want)


def test_middle_interval_differs_and_is_finite(sched):
    s = DDIMSampler(_Toy(sched))
    ci = _c_info(5.0)
    part = _run(s, ci, cfg_interval=(0.2, 0.8))
    full = _run(s, ci)
    assert np.isfinite(part).all()
    assert np.abs(part - full).max() > 1e-6  # approximation is real
    # the interval run tracks the full-CFG result more closely than
    # dropping guidance entirely does
    none = _run(s, _c_info(1.0))
    assert np.abs(part - full).mean() < np.abs(none - full).mean()


def test_validation(sched):
    s = DDIMSampler(_Toy(sched))
    ci = _c_info(5.0)
    with pytest.raises(ValueError, match="lo <= hi"):
        _run(s, ci, cfg_interval=(0.7, 0.2))
    with pytest.raises(ValueError, match="active CFG"):
        _run(s, _c_info(1.0), cfg_interval=(0.2, 0.8))
    with pytest.raises(ValueError, match="composes with"):
        _run(s, ci, cfg_interval=(0.2, 0.8), encoder_reuse=2)
    no_uncond = dict(_c_info(5.0), unconditional_conditioning=None)
    with pytest.raises(ValueError, match="active CFG"):
        _run(s, no_uncond, cfg_interval=(0.2, 0.8))


def test_vdinference_cfg_interval_flow():
    from _tiny import make_tiny_vdi
    vdi = make_tiny_vdi()
    vdi.cfg_interval = (0.0, 0.75)
    imgs = np.asarray(vdi.inference_t2i("a red cat", seed=1), np.float32)
    assert np.isfinite(imgs).all()
