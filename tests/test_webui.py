"""WebUI layer: tab handlers (gradio-free), example registry, mask plumbing.

Covers the reference's WebUI surface (app.py:1051-1113 + example bank
:942-1007 + ImageMask inputs) at the handler level — gradio itself is an
optional dependency absent from TPU serving images.
"""
import numpy as np
import pytest

from _tiny import make_tiny_vdi
from vdtpu.serving.webui import (
    _mask_batch, get_example, get_instruction, make_handlers)


@pytest.fixture(scope="module")
def handlers():
    return make_handlers(make_tiny_vdi())


def _pil(arr):
    from PIL import Image
    return Image.fromarray((arr * 255).astype(np.uint8))


@pytest.fixture(scope="module")
def im():
    g = (np.mgrid[0:64, 0:64][0] / 64.0).astype(np.float32)
    return _pil(np.stack([g, g.T, 0.5 * np.ones_like(g)], -1))


def test_instructions_cover_all_seven_tabs():
    for mode in ("Text-to-Image", "Image-Variation", "Image-to-Text",
                 "Text-Variation", "Dual-Context", "Triple-Context",
                 "Multi-Context"):
        assert get_instruction(mode)


def test_examples_registry():
    # text tabs always have seeded examples (the reference's golden surface)
    assert len(get_example("Text-to-Image")) == 2
    assert get_example("Text-Variation") == [["heavy arms gundam penguin mech", 20]]
    # image tabs need an assets dir
    assert get_example("Image-Variation") == []
    rows = get_example("Triple-Context", assets_dir="/assets")
    assert rows and rows[0][0].startswith("/assets/")
    assert len(get_example("Multi-Context", "/a")[0]) == 4 * 5 + 3


def test_mask_batch_shapes():
    from PIL import Image
    m = Image.fromarray((np.eye(8) * 255).astype(np.uint8))
    out = _mask_batch(m)
    assert out.shape == (1, 8, 8, 1) and out.max() == 1.0
    # gradio sketch dict form
    out2 = _mask_batch({"image": None, "mask": m})
    np.testing.assert_array_equal(out, out2)
    assert _mask_batch(None) is None
    assert _mask_batch({"mask": None}) is None


def test_t2i_and_i2i_handlers(handlers, im):
    outs = handlers["t2i"]("a red cat", 3)
    assert len(outs) == 2 and outs[0].size == (64, 64)
    outs = handlers["i2i"](im, 0.5, 0.5, True, 3)
    assert len(outs) == 2


def test_text_handlers(handlers, im):
    assert isinstance(handlers["i2t"](im, 5), str)
    assert isinstance(handlers["t2t"]("some caption", 5), str)


def test_tcg_handler_with_mask(handlers, im):
    from PIL import Image
    mask = Image.fromarray(
        (np.concatenate([np.ones((32, 64)), np.zeros((32, 64))]) * 255
         ).astype(np.uint8))
    outs = handlers["tcg"](im, mask, 1.0, 0.5, True,
                           im, None, 0.94, 0.5, False,
                           "snowy street", 0.4, 28)
    assert len(outs) == 2 and outs[0].size == (64, 64)
    # empty second slot tolerated
    outs = handlers["tcg"](im, None, 1.0, 0.5, False,
                           None, None, 1.0, 0.5, False,
                           "", 0.0, 28)
    assert len(outs) == 2


def test_mcg_handler(handlers, im):
    rows = [im, None, 1.0, 0.5, False,
            im, None, 0.8, 0.5, False,
            None, None, 1.0, 0.5, False,
            None, None, 1.0, 0.5, False]
    outs = handlers["mcg"]("blend", 0.3, 9, *rows)
    assert len(outs) == 2
