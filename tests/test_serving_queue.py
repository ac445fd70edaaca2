"""BatchingQueue: batch-composition independence + bucket padding.

The production claim under test (vdtpu/serving/queue.py): a request's
image is identical whether it was served alone or coalesced into a larger
padded batch — because each request carries its own x_T and eta=0 DDIM
rows are computed independently.
"""
import numpy as np
import pytest

from vdtpu.serving.queue import BatchingQueue


@pytest.fixture(scope="module")
def vdi():
    from _tiny import make_tiny_vdi
    return make_tiny_vdi()


def test_batched_equals_solo(vdi):
    reqs = [("a red cat", 0), ("a blue dog", 1), ("a green bird", 2)]

    # solo: each request in its own batch-of-1 (bucket 1)
    solo = {}
    with BatchingQueue(vdi, buckets=(1,), max_wait_ms=1.0) as q:
        for text, seed in reqs:
            solo[(text, seed)] = q.submit(text, seed).result(timeout=600)

    # coalesced: all three land in one padded batch-of-4
    with BatchingQueue(vdi, buckets=(4,), max_wait_ms=250.0) as q:
        futs = [q.submit(t, s) for t, s in reqs]
        packed = [f.result(timeout=600) for f in futs]

    for (text, seed), img in zip(reqs, packed):
        assert img.shape == solo[(text, seed)].shape
        np.testing.assert_allclose(img, solo[(text, seed)], atol=1e-5)

    # different requests did produce different images
    assert np.abs(packed[0] - packed[1]).max() > 1e-4


def test_batched_equals_solo_dpmpp(vdi):
    """Batch-composition independence holds under the few-step solver too:
    dpmpp2m is fully deterministic (no per-step noise draws), so the queue
    accepts it and padded-batch results match batch-of-1 results."""
    vdi.sampler = "dpmpp2m"
    try:
        reqs = [("a red cat", 0), ("a blue dog", 1)]
        solo = {}
        with BatchingQueue(vdi, buckets=(1,), max_wait_ms=1.0) as q:
            for text, seed in reqs:
                solo[(text, seed)] = q.submit(text, seed).result(timeout=600)
        with BatchingQueue(vdi, buckets=(4,), max_wait_ms=250.0) as q:
            futs = [q.submit(t, s) for t, s in reqs]
            packed = [f.result(timeout=600) for f in futs]
        for (text, seed), img in zip(reqs, packed):
            np.testing.assert_allclose(img, solo[(text, seed)], atol=1e-5)
    finally:
        vdi.sampler = "ddim"


def test_same_seed_same_text_identical(vdi):
    with BatchingQueue(vdi, buckets=(2,), max_wait_ms=250.0) as q:
        a = q.submit("twin", 7)
        b = q.submit("twin", 7)
        np.testing.assert_allclose(a.result(600), b.result(600), atol=1e-6)


def test_eta_nonzero_rejected(vdi):
    import copy
    bad = copy.copy(vdi)
    bad.ddim_eta = 0.3
    with pytest.raises(ValueError, match="eta=0"):
        BatchingQueue(bad)


def _recording(vdi, sizes):
    """copy of vdi whose _sample records the dispatched batch size."""
    import copy
    probe = copy.copy(vdi)
    orig = vdi._sample

    def rec(key, shape, xinfo, cinfo):
        sizes.append(shape[0])
        return orig(key, shape, xinfo, cinfo)

    probe._sample = rec
    return probe


def test_deadline_dispatches_partial_bucket(vdi):
    import time
    # warm the bucket-4 executable so the timed section measures gather only
    with BatchingQueue(vdi, buckets=(4,), max_wait_ms=1.0) as q:
        warm = q.submit("warm", 5).result(timeout=600)
    sizes = []
    probe = _recording(vdi, sizes)
    # per-gap wait is 30 s: without the deadline a lone request would sit in
    # _gather for 90 s before its batch even started
    with BatchingQueue(probe, buckets=(4,), max_wait_ms=30_000.0,
                       deadline_ms=250.0) as q:
        t0 = time.monotonic()
        img = q.submit("warm", 5).result(timeout=600)
        dt = time.monotonic() - t0
    assert sizes == [4]  # still padded to the compiled bucket
    assert dt < 20.0, f"deadline did not cut the coalescing wait ({dt:.1f}s)"
    # same image as the fully-waited path (composition independence)
    np.testing.assert_allclose(img, warm, atol=1e-5)


def test_deadline_still_coalesces_within_budget(vdi):
    sizes = []
    probe = _recording(vdi, sizes)
    with BatchingQueue(probe, buckets=(2,), max_wait_ms=250.0,
                       deadline_ms=10_000.0) as q:
        a = q.submit("twin", 7)
        b = q.submit("twin", 7)
        np.testing.assert_allclose(a.result(600), b.result(600), atol=1e-6)
    assert sizes == [2]  # one coalesced dispatch, not two


def test_close_drains_pending(vdi):
    q = BatchingQueue(vdi, buckets=(2,), max_wait_ms=50.0)
    f = q.submit("drain me", 3)
    q.close()
    assert f.result(timeout=600).shape[-1] == 3
    with pytest.raises(RuntimeError):
        q.submit("too late", 4)


def test_multiflow_grouping_and_text_independence(vdi):
    """One sweep may mix t2i/t2t/i2t — groups dispatch per flow; and the
    text flows inherit the fixed-bucket composition guarantee (the GPT-2
    decode batches with PER-ROW key streams — optimus.generate's [B,2] rng
    form — so a co-rider can't perturb another request's sampled tokens)."""
    im = np.random.RandomState(3).rand(1, 64, 64, 3).astype(np.float32)
    with BatchingQueue(vdi, buckets=(1, 4), max_wait_ms=250.0) as q:
        fi = q.submit("a red cat", 0)
        ft = q.submit_t2t("some caption", 1)
        fv = q.submit_i2t(im, 2)
        img, t1, t2 = (fi.result(timeout=600), ft.result(timeout=600),
                       fv.result(timeout=600))
    assert img.shape == (64, 64, 3)
    assert isinstance(t1, str) and isinstance(t2, str)

    # t2t: same request, same bucket, different co-riders -> same string
    def run_t2t(rider):
        with BatchingQueue(vdi, buckets=(4,), max_wait_ms=250.0) as q:
            f = q.submit_t2t("some caption", 1)
            _ = q.submit_t2t(rider, 7)
            return f.result(timeout=600)
    assert run_t2t("other words") == run_t2t("a different rider")

    # i2t: likewise (also exercises the cached zeros-image uncond tile)
    def run_i2t(rider_seed):
        with BatchingQueue(vdi, buckets=(4,), max_wait_ms=250.0) as q:
            f = q.submit_i2t(im, 2)
            _ = q.submit_i2t(np.random.RandomState(rider_seed)
                             .rand(1, 64, 64, 3).astype(np.float32), 11)
            return f.result(timeout=600)
    assert run_i2t(4) == run_i2t(5)


def test_composition_independence_int8():
    """The calibrated-int8 path's composition guarantee, precisely:

    1. At a FIXED bucket size, a request's image is BIT-identical no matter
       which co-riders (or padding) share its batch — activation scales are
       static post-calibration, so every s8 row stays per-sample. This is
       the production claim: the queue pads to fixed buckets.
    2. Across DIFFERENT bucket sizes the guarantee is only near-exact:
       different batch shapes compile to different XLA reduction orders,
       and an ulp-level activation difference at a quantize boundary flips
       a whole int8 level (~1/127), compounding over the scan. The bf16/f32
       path is composition-independent across buckets to 1e-5
       (test_batched_equals_solo); int8 is quality-equivalent, not
       bit-equal. Measured delta here is ~5e-3 in [0,1] pixel space.

    Own system + policy reset — enable_int8 flips a process-wide policy
    the other tests must not see."""
    import jax
    import jax.numpy as jnp

    from _tiny import make_tiny_vdi
    from vdtpu.ops import quant

    vdi = make_tiny_vdi()
    # random-fill the zero-init output convs (a fresh-init UNet outputs
    # identically zero, which would make the comparison vacuous)
    p = vdi.sys.params["diffuser"]
    leaves, treedef = jax.tree_util.tree_flatten(p)
    key = jax.random.PRNGKey(7)
    vdi.sys.params["diffuser"] = treedef.unflatten([
        jax.random.normal(jax.random.fold_in(key, i), l.shape, l.dtype) * 0.02
        if float(jnp.abs(l).max()) == 0.0 else l
        for i, l in enumerate(leaves)])
    vdi.sys.enable_int8(image_size=64, latent_downsample=2,
                        flows=(("image", "text"),))
    try:
        # 1. fixed bucket, different co-riders: bit-identical
        with BatchingQueue(vdi, buckets=(4,), max_wait_ms=250.0) as q:
            a1 = q.submit("a red cat", 0)
            _ = [q.submit(t, s) for t, s in
                 [("a blue dog", 1), ("a green bird", 2)]]
            a1 = a1.result(timeout=600)
        with BatchingQueue(vdi, buckets=(4,), max_wait_ms=250.0) as q:
            a2 = q.submit("a red cat", 0)
            _ = [q.submit(t, s) for t, s in
                 [("purple mountains", 5), ("an empty room", 6)]]
            a2 = a2.result(timeout=600)
        np.testing.assert_array_equal(a1, a2)

        # 2. across bucket sizes: quality-equivalent, not bit-equal
        with BatchingQueue(vdi, buckets=(1,), max_wait_ms=1.0) as q:
            solo = q.submit("a red cat", 0).result(timeout=600)
        delta = np.abs(np.asarray(a1) - np.asarray(solo)).max()
        assert delta < 0.05, f"cross-bucket int8 delta too large: {delta}"
    finally:
        quant.set_policy(None)


def test_i2i_batched_equals_solo(vdi):
    """i2i batches by derived x0_forward_timesteps: same-level requests
    share one truncated-scan executable; a request's image is independent
    of its co-riders (per-row q-sample noise from its own seed)."""
    rs = np.random.RandomState(0)
    ims = [rs.rand(1, 64, 64, 3).astype(np.float32) for _ in range(3)]

    # solo: alone in a padded bucket-of-4
    with BatchingQueue(vdi, buckets=(4,), max_wait_ms=100.0) as q:
        solo = q.submit_i2i(ims[0], 0.5, 0.5, None, seed=3).result(timeout=600)

    # coalesced with same-level co-riders (one shared dispatch)
    sizes = []
    probe = _recording(vdi, sizes)
    with BatchingQueue(probe, buckets=(4,), max_wait_ms=250.0) as q:
        f = q.submit_i2i(ims[0], 0.5, 0.5, None, seed=3)
        _ = q.submit_i2i(ims[1], 0.5, 0.2, "Simple", seed=4)
        _ = q.submit_i2i(ims[2], 0.5, 0.8, None, seed=5)
        packed = f.result(timeout=600)
    assert sizes == [4]
    np.testing.assert_allclose(packed, solo, atol=1e-5)

    # different fid levels cannot share a scan: two dispatches
    sizes.clear()
    with BatchingQueue(probe, buckets=(4,), max_wait_ms=250.0) as q:
        a = q.submit_i2i(ims[0], 0.5, 0.5, None, seed=3)
        b = q.submit_i2i(ims[1], 0.0, 0.5, None, seed=4)  # full scan
        a.result(timeout=600), b.result(timeout=600)
    assert sorted(sizes) == [4, 4] and len(sizes) == 2

    # fid_lvl=1 short-circuits to the input (app.py:326)
    with BatchingQueue(vdi, buckets=(4,), max_wait_ms=1.0) as q:
        ident = q.submit_i2i(ims[0], 1.0, 0.5, None, seed=9).result(timeout=60)
    np.testing.assert_array_equal(ident, ims[0][0])


def test_mcg_batched_equals_solo(vdi):
    """The multicontext family (dcg/tcg/mcg) batches by (image count,
    textstrength): conditioning rows stack, batch-level scale/ratio match,
    and a request's image is co-rider independent."""
    rs = np.random.RandomState(1)
    ims = [rs.rand(1, 64, 64, 3).astype(np.float32) for _ in range(4)]

    with BatchingQueue(vdi, buckets=(4,), max_wait_ms=100.0) as q:
        solo = q.submit_dcg(ims[0], 0.5, "a boat", 0.4, seed=2).result(timeout=600)

    sizes = []
    probe = _recording(vdi, sizes)
    probe._sample_multi = vdi._sample_multi  # records only _sample; patch multi
    def rec_multi(key, shape, xinfo, cinfos, _orig=vdi._sample_multi):
        sizes.append(shape[0])
        return _orig(key, shape, xinfo, cinfos)
    probe._sample_multi = rec_multi
    with BatchingQueue(probe, buckets=(4,), max_wait_ms=250.0) as q:
        f = q.submit_dcg(ims[0], 0.5, "a boat", 0.4, seed=2)
        _ = q.submit_dcg(ims[1], 0.2, "a plane", 0.4, seed=7)
        packed = f.result(timeout=600)
    assert sizes == [4]
    np.testing.assert_allclose(packed, solo, atol=1e-5)

    # different textstrength => different guidance scale => separate groups
    sizes.clear()
    with BatchingQueue(probe, buckets=(4,), max_wait_ms=250.0) as q:
        a = q.submit_dcg(ims[0], 0.5, "a boat", 0.4, seed=2)
        b = q.submit_dcg(ims[1], 0.5, "a plane", 0.8, seed=7)
        a.result(timeout=600), b.result(timeout=600)
    assert len(sizes) == 2

    # tcg (two image contexts) groups separately from dcg (one)
    sizes.clear()
    with BatchingQueue(probe, buckets=(4,), max_wait_ms=250.0) as q:
        a = q.submit_tcg([{"image": ims[0], "strength": 1.0, "fcs_lvl": 0.5},
                          {"image": ims[2], "strength": 0.7, "fcs_lvl": 0.5}],
                         "a boat", 0.4, seed=2)
        b = q.submit_dcg(ims[1], 0.5, "a plane", 0.4, seed=7)
        ta, tb = a.result(timeout=600), b.result(timeout=600)
    assert len(sizes) == 2
    assert ta.shape == tb.shape == (64, 64, 3)
