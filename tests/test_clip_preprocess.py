"""CLIP image preprocessing parity vs the HF CLIPImageProcessor config."""
import numpy as np
import pytest

tfm = pytest.importorskip("transformers")

from vdtpu.models.clip import preprocess_images


def test_preprocess_matches_hf_processor():
    proc = tfm.CLIPImageProcessor(
        size={"shortest_edge": 224}, crop_size={"height": 224, "width": 224},
        do_resize=True, do_center_crop=True, do_rescale=False,
        do_normalize=True, resample=3)  # 3 = PIL BICUBIC
    # smooth image: resampler comparisons on white noise diverge by
    # construction (uncorrelated neighbors), a gradient field is the fair test
    yy, xx = np.mgrid[0:288, 0:352].astype(np.float32)
    img = np.stack([yy / 288, xx / 352, (yy + xx) / 640], axis=-1)
    img = (0.5 + 0.4 * np.sin(6 * img)).astype(np.float32)

    ref = proc(images=[img], return_tensors="np")["pixel_values"][0]
    ref = ref.transpose(1, 2, 0)

    ours = np.asarray(preprocess_images(img[None]))[0]
    assert ours.shape == ref.shape == (224, 224, 3)
    # PIL bicubic vs jax.image bicubic differ slightly at edges; interior
    # and overall stats must agree closely
    assert np.abs(ours - ref).mean() < 0.03
    np.testing.assert_allclose(ours.mean(axis=(0, 1)), ref.mean(axis=(0, 1)),
                               atol=0.02)
