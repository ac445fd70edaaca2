"""int8 serving path: param-tree compatibility + output fidelity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vdtpu.ops import quant

TINY_CFG = {"args": {
    "diffuser_cfg_list": [
        ["image", {"type": "openai_unet_2d_next", "args": dict(
            in_channels=4, model_channels=32, out_channels=4,
            num_res_blocks=[1, 1], attention_resolutions=[1, 2],
            channel_mult=[1, 2], num_heads=4, context_dim=16)}],
        ["text", {"type": "openai_unet_0d_next", "args": dict(
            input_channels=24, model_channels=32, output_channels=24,
            num_noattn_blocks=[1, 1], channel_mult=[1, 2], second_dim=[4, 4],
            with_attn=[True, True], num_heads=4, context_dim=16)}],
    ],
    "global_layer_ptr": "image", "timesteps": 100,
    "beta_linear_start": 0.00085, "beta_linear_end": 0.012,
}}


@pytest.fixture(autouse=True)
def _restore_policy():
    yield
    quant.set_policy(None)


def _models():
    from vdtpu.models.vd import VDModel
    quant.set_policy(None)
    m_f = VDModel.from_config(TINY_CFG)
    quant.set_policy("int8")
    m_q = VDModel.from_config(TINY_CFG)
    return m_f, m_q


def test_param_tree_identical_across_policies():
    m_f, m_q = _models()
    quant.set_policy(None)
    p_f = m_f.init_params(jax.random.PRNGKey(0))
    quant.set_policy("int8")
    p_q = m_q.init_params(jax.random.PRNGKey(0))
    sf = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), p_f)
    sq = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), p_q)
    assert sf == sq  # checkpoints trained in f32 load straight into int8 serving


def _fill_zero_leaves(params, key, std=0.02):
    """Zero-init output convs make the fresh-init UNet output identically 0
    (vacuous comparisons); give every zero leaf random values."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    out = []
    for i, l in enumerate(leaves):
        if float(jnp.abs(l).max()) == 0.0:
            l = jax.random.normal(jax.random.fold_in(key, i), l.shape,
                                  l.dtype) * std
        out.append(l)
    return treedef.unflatten(out)


def test_int8_outputs_track_f32():
    m_f, m_q = _models()
    quant.set_policy(None)
    params = _fill_zero_leaves(m_f.init_params(jax.random.PRNGKey(0)),
                               jax.random.PRNGKey(7))
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 8, 4).astype(np.float32))
    t = jnp.asarray([3, 70])
    ctx = jnp.asarray(rs.randn(2, 7, 16).astype(np.float32))
    ref = np.asarray(m_f.apply_model(params, x, t, ctx, "image", "text"),
                     np.float64)
    quant.set_policy("int8")
    out = np.asarray(m_q.apply_model(params, x, t, ctx, "image", "text"),
                     np.float64)
    cos = (ref * out).sum() / (np.linalg.norm(ref) * np.linalg.norm(out))
    assert cos > 0.995, cos
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.2, rel


def test_calibrated_static_scales():
    """calibrate() records per-site activation scales; serving with the
    static scales stays faithful on data in the calibration range."""
    m_f, m_q = _models()
    quant.set_policy(None)
    params = _fill_zero_leaves(m_f.init_params(jax.random.PRNGKey(0)),
                               jax.random.PRNGKey(7))
    rs = np.random.RandomState(3)
    mk = lambda seed: (
        jnp.asarray(np.random.RandomState(seed).randn(2, 8, 8, 4).astype(np.float32)),
        jnp.asarray([seed % 100, (seed * 7) % 100]),
        jnp.asarray(np.random.RandomState(seed + 1).randn(2, 7, 16).astype(np.float32)))

    quant.set_policy("int8")
    flows = [(x, t, ctx, "image", "text") for x, t, ctx in map(mk, (0, 10, 20))]
    scales = quant.calibrate(m_q, params, flows)
    flat = jax.tree_util.tree_leaves_with_path(scales)
    acts = [l for p, l in flat if "act_scale" in jax.tree_util.keystr(p)]
    wqs = [l for p, l in flat if "w_q" in jax.tree_util.keystr(p)]
    assert len(acts) > 10 and all(float(s) > 0 for s in acts)
    # int8 weight tables materialized for every calibrated site
    assert len(wqs) == len(acts) and all(w.dtype == jnp.int8 for w in wqs)
    assert m_q.quant_scales is scales

    x, t, ctx = mk(30)  # held-out batch
    ref = np.asarray(m_f.apply_model(params, x, t, ctx, "image", "text"),
                     np.float64)
    out = np.asarray(m_q.apply_model(params, x, t, ctx, "image", "text"),
                     np.float64)
    cos = (ref * out).sum() / (np.linalg.norm(ref) * np.linalg.norm(out))
    assert cos > 0.99, cos
    m_q.quant_scales = None


def test_int8_trajectory_gate():
    """Trajectory-level int8 gate (VERDICT r2 task 2): a full DDIM sample
    under calibrated int8 must stay within bounded divergence of the exact
    f32 path — per-step latent cosine and final relative error — not just
    the single-step eps cosine of test_int8_outputs_track_f32. Fails if the
    int8 path drifts."""
    from vdtpu.sampling.ddim import DDIMSampler
    m_f, m_q = _models()
    quant.set_policy(None)
    params = _fill_zero_leaves(m_f.init_params(jax.random.PRNGKey(0)),
                               jax.random.PRNGKey(7))
    cond = jnp.asarray(np.random.RandomState(5).randn(2, 7, 16)
                       .astype(np.float32)) * 0.5
    uncond = jnp.zeros_like(cond)
    c_info = {"type": "text", "conditioning": cond,
              "unconditional_conditioning": uncond,
              "unconditional_guidance_scale": 5.0}
    key = jax.random.PRNGKey(11)

    def run(model):
        x, inter = DDIMSampler(model).sample(
            params if quant.get_policy() is None
            else {"params": params, "quant": model.quant_scales},
            key, steps=10, shape=(2, 8, 8, 4), x_info={"type": "image"},
            c_info=c_info, return_intermediates=True)
        return np.asarray(x, np.float64), np.asarray(inter["pred_xt"], np.float64)

    x_ref, traj_ref = run(m_f)

    quant.set_policy("int8")
    flows = []
    for i, tt in enumerate((0, 25, 50, 75, 99)):
        rs = np.random.RandomState(100 + i)
        flows.append((jnp.asarray(rs.randn(4, 8, 8, 4).astype(np.float32)),
                      jnp.full((4,), tt, jnp.int32),
                      jnp.asarray(rs.randn(4, 7, 16).astype(np.float32)) * 0.5,
                      "image", "text"))
    quant.calibrate(m_q, params, flows)
    x_q, traj_q = run(m_q)
    m_q.quant_scales = None

    # per-step divergence: cosine of the predicted x_t at every step
    for s in range(traj_ref.shape[0]):
        a, b = traj_ref[s].ravel(), traj_q[s].ravel()
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.98, (s, cos)
    rel = np.abs(x_q - x_ref).mean() / (np.abs(x_ref).mean() + 1e-9)
    assert rel < 0.25, rel


def test_quant_primitives_roundtrip():
    from vdtpu.ops.quant import _quantize_act, _quantize_weight
    rs = np.random.RandomState(1)
    w = jnp.asarray(rs.randn(3, 3, 8, 16).astype(np.float32))
    wq, s = _quantize_weight(w, (0, 1, 2))
    assert wq.dtype == jnp.int8 and s.shape == (1, 1, 1, 16)
    back = np.asarray(wq, np.float32) * np.asarray(s)
    assert np.abs(back - np.asarray(w)).max() < np.asarray(s).max() * 0.51
    x = jnp.asarray(rs.randn(4, 5).astype(np.float32))
    xq, sx = _quantize_act(x)
    assert np.abs(np.asarray(xq, np.float32) * float(sx) - np.asarray(x)).max() \
        <= float(sx) * 0.51
    # zero tensors don't divide by zero
    zq, zs = _quantize_weight(jnp.zeros((3, 3, 4, 4)), (0, 1, 2))
    assert np.all(np.asarray(zq) == 0) and np.isfinite(float(zs.max()))


@pytest.mark.parametrize("mode", ["q99.9", "sigma4"])
def test_clipped_calibration_scales(monkeypatch, mode):
    """VDTPU_INT8_CLIP swaps the calibration statistic (quantile / k-sigma
    clip) for the absmax. Scales must shrink (or match) per site, nothing
    downstream changes shape, and held-out fidelity holds — saturation of
    the clipped tail must not break the eps cosine gate."""
    m_f, m_q = _models()
    quant.set_policy(None)
    params = _fill_zero_leaves(m_f.init_params(jax.random.PRNGKey(0)),
                               jax.random.PRNGKey(7))
    mk = lambda seed: (
        jnp.asarray(np.random.RandomState(seed).randn(2, 8, 8, 4)
                    .astype(np.float32)),
        jnp.asarray([seed % 100, (seed * 7) % 100]),
        jnp.asarray(np.random.RandomState(seed + 1).randn(2, 7, 16)
                    .astype(np.float32)))
    flows = [(x, t, ctx, "image", "text") for x, t, ctx in map(mk, (0, 10, 20))]

    quant.set_policy("int8")
    base = quant.calibrate(m_q, params, flows)
    monkeypatch.setenv("VDTPU_INT8_CLIP", mode)
    clipped = quant.calibrate(m_q, params, flows)

    kp = jax.tree_util.tree_leaves_with_path
    b = {jax.tree_util.keystr(p): float(l) for p, l in kp(base)
         if "act_scale" in jax.tree_util.keystr(p)}
    c = {jax.tree_util.keystr(p): float(l) for p, l in kp(clipped)
         if "act_scale" in jax.tree_util.keystr(p)}
    assert set(b) == set(c) and len(b) > 10
    assert all(c[k] <= b[k] * (1 + 1e-6) for k in b)
    assert any(c[k] < b[k] * 0.999 for k in b), "clip changed nothing"

    x, t, ctx = mk(30)
    ref = np.asarray(m_f.apply_model(params, x, t, ctx, "image", "text"),
                     np.float64)
    out = np.asarray(m_q.apply_model(params, x, t, ctx, "image", "text"),
                     np.float64)
    cos = (ref * out).sum() / (np.linalg.norm(ref) * np.linalg.norm(out))
    assert cos > 0.99, (mode, cos)
    m_q.quant_scales = None
