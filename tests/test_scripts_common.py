"""scripts/_common.py: the shared measurement-script methodology.

The perf scripts (scripts/perf_e2e.py, trace_step.py, int8_quality.py,
train_bench.py) reproduce bench.py's headline setup through these helpers;
nothing else in the suite imports them, and the r3 dedup surfaced a real
bug (hardcoded ViT-L token geometry NaN-filled tiny towers through
jnp.take). This locks the pipeline on the tiny config: config-driven CLIP
geometry, finite conditioning, calibration output structure, and a finite
int8 CFG step.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vdtpu.config.bank import model_cfg_bank
from vdtpu.models.vd import VDModel
from vdtpu.ops import quant

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
from _common import calibrate_int8, clip_conditioning, fill_params  # noqa: E402


@pytest.mark.slow
def test_common_pipeline_tiny_int8():
    cfgm = model_cfg_bank()("vd_test_tiny")
    dtype = jnp.bfloat16

    cond1, uncond1 = clip_conditioning(cfgm, dtype)
    # geometry comes from the config (max_len 16, proj 96), not ViT-L's 77/768
    assert cond1.shape == uncond1.shape == (1, 16, 96)
    for a in (cond1, uncond1):
        assert np.isfinite(np.asarray(a, np.float32)).all()
    # cond (random ids) and uncond (end-token rows) must actually differ
    assert float(jnp.abs((cond1 - uncond1).astype(jnp.float32)).max()) > 1e-3
    # the helper restores whatever policy was active before the encode
    assert quant.get_policy() is None

    quant.set_policy("int8")
    try:
        model = VDModel.from_config(cfgm, dtype=dtype, use_checkpoint=False)
        params = fill_params(model)
        n = 2
        full = calibrate_int8(model, params, n, dtype, cond1, uncond1)
        assert set(full) == {"params", "quant"}
        assert full["params"] is params
        assert jax.tree_util.tree_leaves(full["quant"])  # non-empty scales

        ctx = jnp.concatenate([jnp.tile(uncond1, (n, 1, 1)),
                               jnp.tile(cond1, (n, 1, 1))], axis=0)
        x = jax.random.normal(jax.random.PRNGKey(0), (2 * n, 64, 64, 4), dtype)
        t = jnp.full((2 * n,), 500, jnp.int32)
        eps = jax.jit(lambda p, x, t, c: model.apply_model(
            p, x, t, c, "image", "text"))(full, x, t, ctx)
        e = np.asarray(eps, np.float32)
        assert e.shape == x.shape
        assert np.isfinite(e).all()
        assert np.abs(e).mean() > 1e-4  # not the all-zero degenerate output
    finally:
        quant.set_policy(None)
