"""Input-image regularization parity (VERDICT r4 missing #2 / task 3).

The reference bicubic-resizes every uploaded image to output_dim at the top
of each image flow (app.py:329-330 i2i, :392 i2t, :460 dcg, :534-536 mcg —
masks bilinear) BEFORE anything else, including the i2i fid_lvl=1
short-circuit. These tests feed non-output_dim inputs through the API, the
webui callbacks, and a mixed-size queue sweep.
"""
import numpy as np
import pytest

from _tiny import make_tiny_vdi
from vdtpu.serving.api import regularize_image
from vdtpu.serving.queue import BatchingQueue


@pytest.fixture(scope="module")
def vdi():
    return make_tiny_vdi()  # output_dim (64, 64), latent_downsample 2


def _img(h, w, seed=0):
    return np.random.RandomState(seed).rand(1, h, w, 3).astype(np.float32)


def test_regularize_image_noop_and_clamp():
    x = _img(64, 64)
    assert regularize_image(x, (64, 64)) is not None
    np.testing.assert_array_equal(np.asarray(regularize_image(x, (64, 64))), x)
    # bicubic overshoot is clamped to [0,1] (PIL uint8 saturation parity)
    y = np.asarray(regularize_image(_img(17, 23, 3), (64, 64)))
    assert y.shape == (1, 64, 64, 3)
    assert y.min() >= 0.0 and y.max() <= 1.0


def test_i2i_nonsquare_input_matches_preresized(vdi):
    raw = _img(40, 56, 1)
    pre = np.asarray(regularize_image(raw, vdi.output_dim))
    out_raw = np.asarray(vdi.inference_i2i(raw, 0.5, 0.5, None, seed=3))
    out_pre = np.asarray(vdi.inference_i2i(pre, 0.5, 0.5, None, seed=3))
    assert out_raw.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(out_raw, out_pre, atol=1e-6)


def test_i2i_fid1_returns_resized(vdi):
    raw = _img(33, 80, 2)
    out = np.asarray(vdi.inference_i2i(raw, 1.0, 0.5, None, seed=0))
    assert out.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(
        out[0], np.asarray(regularize_image(raw, vdi.output_dim))[0], atol=1e-6)


def test_i2t_nonsquare_input(vdi):
    texts = vdi.inference_i2t(_img(48, 32, 4), seed=1)
    assert len(texts) == vdi.n_sample_text
    assert all(isinstance(t, str) for t in texts)


def test_mcg_mixed_sizes_and_mask(vdi):
    ctxs = [
        {"image": _img(40, 40, 5), "strength": 1.0, "fcs_lvl": 0.5},
        {"image": _img(72, 24, 6), "strength": 0.7, "fcs_lvl": 0.5,
         "mask": np.ones((1, 30, 50, 1), np.float32)},
    ]
    shown, out = vdi.inference_mcg(ctxs, "a boat", 0.4, seed=2)
    assert np.asarray(out).shape == (2, 64, 64, 3)
    # inputs_shown echo the regularized (output_dim) images
    assert all(np.asarray(s).shape == (1, 64, 64, 3) for s in shown)


def test_webui_to_batch_resizes():
    from PIL import Image
    from vdtpu.serving.webui import _to_batch
    im = Image.fromarray((_img(30, 40)[0] * 255).astype(np.uint8))
    b = _to_batch(im, (64, 64))
    assert b.shape == (1, 64, 64, 3)
    assert b.min() >= 0.0 and b.max() <= 1.0
    # array input (no PIL .resize) takes the API-helper path
    b2 = _to_batch(_img(30, 40)[0], (64, 64))
    assert b2.shape == (1, 64, 64, 3)
    # already-at-size PIL input is untouched
    im64 = Image.fromarray((_img(64, 64)[0] * 255).astype(np.uint8))
    np.testing.assert_array_equal(_to_batch(im64, (64, 64)), _to_batch(im64))


def test_webui_i2i_handler_nonsquare(vdi):
    from PIL import Image
    from vdtpu.serving.webui import make_handlers
    h = make_handlers(vdi)
    im = Image.fromarray((_img(40, 56, 7)[0] * 255).astype(np.uint8))
    out = h["i2i"](im, 0.5, 0.5, False, 3)
    assert len(out) == 2 and out[0].size == (64, 64)


def test_queue_mixed_size_group(vdi):
    """One odd-sized upload must not fail its group: mixed-size i2i
    requests coalesce into ONE dispatch and each equals its solo run."""
    raw_a, raw_b, raw_c = _img(64, 64, 8), _img(40, 56, 9), _img(80, 28, 10)
    with BatchingQueue(vdi, buckets=(4,), max_wait_ms=100.0) as q:
        solo = q.submit_i2i(raw_b, 0.5, 0.5, None, seed=4).result(timeout=600)
    sizes = []
    orig = vdi._sample

    def rec(key, shape, xinfo, cinfo):
        sizes.append(shape[0])
        return orig(key, shape, xinfo, cinfo)

    vdi._sample = rec
    try:
        # wide window: the first-ever bicubic resize compile happens at
        # submit time and must not race the coalescing sweep
        with BatchingQueue(vdi, buckets=(4,), max_wait_ms=4000.0) as q:
            fa = q.submit_i2i(raw_a, 0.5, 0.5, None, seed=3)
            fb = q.submit_i2i(raw_b, 0.5, 0.5, None, seed=4)
            fc = q.submit_i2i(raw_c, 0.5, 0.5, None, seed=5)
            outs = [f.result(timeout=600) for f in (fa, fb, fc)]
    finally:
        vdi._sample = orig
    assert sizes == [4]
    assert all(o.shape == (64, 64, 3) for o in outs)
    np.testing.assert_allclose(outs[1], solo, atol=1e-5)
    # fid_lvl=1 short-circuit returns the REGULARIZED input
    with BatchingQueue(vdi, buckets=(4,), max_wait_ms=1.0) as q:
        ident = q.submit_i2i(raw_c, 1.0, 0.5, None, seed=9).result(timeout=60)
    assert ident.shape == (64, 64, 3)
    np.testing.assert_allclose(
        ident, np.asarray(regularize_image(raw_c, vdi.output_dim))[0], atol=1e-6)


def test_queue_mixed_size_i2t_and_mcg(vdi):
    with BatchingQueue(vdi, buckets=(2,), max_wait_ms=250.0) as q:
        ft = q.submit_i2t(_img(48, 32, 11), seed=1)
        fm = q.submit_mcg(
            [{"image": _img(40, 40, 12), "strength": 1.0, "fcs_lvl": 0.5,
              "mask": np.ones((1, 30, 50, 1), np.float32)}],
            text="a boat", textstrength=0.4, seed=2)
        t = ft.result(timeout=600)
        m = fm.result(timeout=600)
    assert isinstance(t, str)
    assert m.shape == (64, 64, 3)
