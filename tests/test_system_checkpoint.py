"""System-level checkpoint round trip: VDSystem export -> flat torch-scheme
state_dict (diffuser./vae./ctx.*.model. prefixes) -> load back == identity."""
import numpy as np
import pytest

import jax

from vdtpu.serving.api import VDSystem


@pytest.fixture(scope="module")
def system():
    return VDSystem("vd_test_tiny").init_random(0, image_size=64)


def test_export_key_scheme(system):
    sd = system.export_torch_checkpoint()
    prefixes = {k.split(".")[0] for k in sd}
    assert prefixes == {"diffuser", "vae", "ctx"}
    assert any(k.startswith("diffuser.image.data_blocks.0.0.") for k in sd)
    assert any(k.startswith("diffuser.text.context_blocks.") for k in sd)
    assert any(k.startswith("vae.image.encoder.down.0.block.0.") for k in sd)
    assert any(k.startswith("vae.text.encoder.encoder.layer.0.") for k in sd)
    assert any(k.startswith("vae.text.decoder.transformer.h.0.") for k in sd)
    assert any(k.startswith("ctx.image.model.vision_model.") for k in sd)
    assert any(k.startswith("ctx.text.model.text_model.") for k in sd)
    # 0-D FC blocks export as [O, I, 1, 1] 1x1 convs like the reference
    fc = next(k for k in sd if "diffuser.text." in k and
              k.endswith("in_layers.2.weight") and "data_blocks" in k)
    assert sd[fc].ndim == 4 and sd[fc].shape[2:] == (1, 1)
    # context-transformer projections likewise
    pj = next(k for k in sd if k.endswith("proj_in.weight"))
    assert sd[pj].ndim == 4


def test_load_export_roundtrip_identity(system):
    sd = system.export_torch_checkpoint()
    before = jax.tree_util.tree_map(np.asarray, system.params)
    missing = system.load_torch_checkpoint(sd, strict=True)
    assert missing == []
    after = system.params
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
