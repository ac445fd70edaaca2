"""Golden-tensor parity for the legacy (pre-v2) model zoo vs the torch
reference classes (openaimodel.py:412-2574) at random weights.

Each test converts the reference state_dict mechanically (torch names ==
flax module paths) and compares forward outputs.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _reference import derandomize_zeros, ref_module  # noqa: E402
from vdtpu.interop.torch_convert import torch_to_flax  # noqa: E402
from vdtpu.models import legacy as L  # noqa: E402


@pytest.fixture(scope="module")
def ref_om():
    return ref_module("lib.model_zoo.openaimodel")


class _EDict(dict):
    """easydict-alike for reference cfg objects (attr + .get access).
    Missing attrs raise AttributeError (not KeyError) so copy.deepcopy's
    __deepcopy__ probe works."""
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k) from None


def _convert(tm, ours, *init_args, method=None):
    sd = tm.state_dict()
    params = ours.init(jax.random.PRNGKey(0), *init_args, method=method)
    params, _ = torch_to_flax(sd, params["params"])
    return params


def _nchw(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


X84 = np.random.RandomState(0).randn(2, 4, 8, 8).astype(np.float32)
T2 = np.array([3, 500], dtype=np.int64)
CTX = np.random.RandomState(1).randn(2, 7, 16).astype(np.float32)
X_JAX = jnp.asarray(X84.transpose(0, 2, 3, 1))


def test_openai_unet_spatial_transformer(ref_om):
    """SD-style UNetModel: ST context layers (openaimodel.py:412-776)."""
    torch.manual_seed(0)
    kw = dict(image_size=8, in_channels=4, model_channels=32, out_channels=4,
              num_res_blocks=1, attention_resolutions=[1, 2],
              channel_mult=[1, 2], num_heads=4,
              use_spatial_transformer=True, context_dim=16)
    tm = derandomize_zeros(ref_om.UNetModel(**kw).eval())
    ours = L.LegacyUNetModel(**kw)
    params = _convert(tm, ours, X_JAX, jnp.asarray(T2), jnp.asarray(CTX))
    out = ours.apply({"params": params}, X_JAX, jnp.asarray(T2), jnp.asarray(CTX))
    with torch.no_grad():
        ref = tm(torch.tensor(X84), torch.tensor(T2), torch.tensor(CTX)).numpy()
    np.testing.assert_allclose(_nchw(out), ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("new_order", [False, True])
def test_openai_unet_attention_block(ref_om, new_order):
    """Self-attention AttentionBlock path, both qkv orders (:277-410)."""
    torch.manual_seed(1)
    kw = dict(image_size=8, in_channels=4, model_channels=32, out_channels=4,
              num_res_blocks=1, attention_resolutions=[2],
              channel_mult=[1, 2], num_heads=4,
              use_new_attention_order=new_order)
    tm = derandomize_zeros(ref_om.UNetModel(**kw).eval())
    ours = L.LegacyUNetModel(**kw)
    params = _convert(tm, ours, X_JAX, jnp.asarray(T2))
    out = ours.apply({"params": params}, X_JAX, jnp.asarray(T2))
    with torch.no_grad():
        ref = tm(torch.tensor(X84), torch.tensor(T2)).numpy()
    np.testing.assert_allclose(_nchw(out), ref, atol=2e-4, rtol=1e-3)


def test_openai_unet_scale_shift_updown_classcond(ref_om):
    """Guided-diffusion options: scale-shift FiLM, resblock up/down,
    class-conditional label_emb, num_head_channels (:162-274, :533-534)."""
    torch.manual_seed(2)
    kw = dict(image_size=8, in_channels=4, model_channels=32, out_channels=4,
              num_res_blocks=1, attention_resolutions=[2],
              channel_mult=[1, 2], num_heads=-1, num_head_channels=8,
              use_scale_shift_norm=True, resblock_updown=True, num_classes=5)
    tm = derandomize_zeros(ref_om.UNetModel(**kw).eval())
    y = np.array([1, 4], dtype=np.int64)
    ours = L.LegacyUNetModel(**kw)
    params = _convert(tm, ours, X_JAX, jnp.asarray(T2), None, jnp.asarray(y))
    out = ours.apply({"params": params}, X_JAX, jnp.asarray(T2), None,
                     jnp.asarray(y))
    with torch.no_grad():
        ref = tm(torch.tensor(X84), torch.tensor(T2), y=torch.tensor(y)).numpy()
    np.testing.assert_allclose(_nchw(out), ref, atol=2e-4, rtol=1e-3)


def test_dual_context(ref_om):
    """UNetModelDualContext + DualSpatialTransformer: single-branch
    (which_attn in {0,1}) and ratio blend (attention.py:345-435)."""
    torch.manual_seed(3)
    kw = dict(image_size=8, in_channels=4, model_channels=32, out_channels=4,
              num_res_blocks=1, attention_resolutions=[1, 2],
              channel_mult=[1, 2], num_heads=4,
              use_spatial_transformer=True, context_dim=16)
    tm = derandomize_zeros(ref_om.UNetModelDualContext(**kw).eval())
    ours = L.LegacyUNetDualContext(**kw)
    # same token length as CTX: the reference blend path needs the context
    # pair STACKED into one tensor ([2,B,L,D]) — its forward calls
    # context.dtype (openaimodel.py:1921) and DualSpatialTransformer indexes
    # context[0]/context[1] (attention.py:413,423)
    ctx2 = np.random.RandomState(7).randn(2, 7, 16).astype(np.float32)
    params = _convert(tm, ours, X_JAX, jnp.asarray(T2), jnp.asarray(CTX), None, 0)

    for which in (0, 1):
        out = ours.apply({"params": params}, X_JAX, jnp.asarray(T2),
                         jnp.asarray(CTX), which_attn=which)
        with torch.no_grad():
            ref = tm(torch.tensor(X84), torch.tensor(T2), torch.tensor(CTX),
                     which_attn=which).numpy()
        np.testing.assert_allclose(_nchw(out), ref, atol=2e-4, rtol=1e-3)

    # blend: branch i consumes context[i], h = b0*r + b1*(1-r) + x
    r = 0.3
    out = ours.apply({"params": params}, X_JAX, jnp.asarray(T2),
                     (jnp.asarray(CTX), jnp.asarray(ctx2)), which_attn=r)
    with torch.no_grad():
        ref = tm(torch.tensor(X84), torch.tensor(T2),
                 torch.stack([torch.tensor(CTX), torch.tensor(ctx2)]),
                 which_attn=r).numpy()
    np.testing.assert_allclose(_nchw(out), ref, atol=2e-4, rtol=1e-3)


def test_nocontext_noatt_and_decoderonly(ref_om):
    torch.manual_seed(4)
    kw = dict(in_channels=4, model_channels=32, out_channels=4,
              num_res_blocks=1, channel_mult=[1, 2])
    tm = derandomize_zeros(ref_om.UNetModelNoContextNoAtt(**kw).eval())
    ours = L.LegacyUNetNoContextNoAtt(**kw)
    params = _convert(tm, ours, X_JAX, jnp.asarray(T2))
    out = ours.apply({"params": params}, X_JAX, jnp.asarray(T2))
    with torch.no_grad():
        ref = tm(torch.tensor(X84), torch.tensor(T2)).numpy()
    np.testing.assert_allclose(_nchw(out), ref, atol=2e-4, rtol=1e-3)

    kw = dict(in_channels=4, out_channels=3, model_channels=32,
              num_res_blocks=1, channel_mult=[2, 1])
    tm = derandomize_zeros(
        ref_om.UNetModelNoContextNoAttDecoderOnly(**kw).eval())
    ours = L.LegacyDecoderOnly(**kw)
    params = _convert(tm, ours, X_JAX, jnp.asarray(T2))
    out = ours.apply({"params": params}, X_JAX, jnp.asarray(T2))
    with torch.no_grad():
        ref = tm(torch.tensor(X84), torch.tensor(T2)).numpy()
    np.testing.assert_allclose(_nchw(out), ref, atol=2e-4, rtol=1e-3)


CFG_2D = dict(input_channels=4, model_channels=32, output_channels=4,
              context_dim=16, num_noattn_blocks=(1, 1), channel_mult=(1, 2),
              with_attn=[True, False], num_heads=4, use_checkpoint=False)
CFG_0DMD = dict(input_channels=24, model_channels=32, output_channels=24,
                context_dim=16, num_noattn_blocks=(1, 1), channel_mult=(1, 2),
                second_dim=(4, 4), with_attn=[True, False], num_heads=4,
                use_checkpoint=False)


def test_unet_2d_legacy(ref_om):
    torch.manual_seed(5)
    tm = derandomize_zeros(ref_om.UNetModel2D(**CFG_2D).eval())
    ours = L.legacy_unet_2d(**CFG_2D)
    params = _convert(tm, ours, X_JAX, jnp.asarray(T2), jnp.asarray(CTX))
    out = ours.apply({"params": params}, X_JAX, jnp.asarray(T2), jnp.asarray(CTX))
    with torch.no_grad():
        ref = tm(torch.tensor(X84), torch.tensor(T2), torch.tensor(CTX)).numpy()
    np.testing.assert_allclose(_nchw(out), ref, atol=2e-4, rtol=1e-3)


def test_unet_0d_legacy(ref_om):
    torch.manual_seed(6)
    kw = dict(input_channels=24, model_channels=32, output_channels=24,
              context_dim=16, num_noattn_blocks=(1, 1), channel_mult=(1, 2),
              with_attn=[True, False], num_heads=4, use_checkpoint=False)
    tm = derandomize_zeros(ref_om.UNetModel0D(**kw).eval())
    x = np.random.RandomState(2).randn(2, 24).astype(np.float32)
    ours = L.LegacyUNet0D(**kw)
    params = _convert(tm, ours, jnp.asarray(x), jnp.asarray(T2),
                      jnp.asarray(CTX))
    out = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(T2),
                     jnp.asarray(CTX))
    with torch.no_grad():
        ref = tm(torch.tensor(x)[:, :, None, None], torch.tensor(T2),
                 torch.tensor(CTX)).numpy()
    np.testing.assert_allclose(np.asarray(out), ref[:, :, 0, 0],
                               atol=2e-4, rtol=1e-3)


def test_unet_0dmd_legacy(ref_om):
    torch.manual_seed(7)
    tm = derandomize_zeros(ref_om.UNetModel0D_MultiDim(**CFG_0DMD).eval())
    x = np.random.RandomState(3).randn(2, 24).astype(np.float32)
    ours = L.LegacyUNet0DMultiDim(**CFG_0DMD)
    params = _convert(tm, ours, jnp.asarray(x), jnp.asarray(T2),
                      jnp.asarray(CTX))
    out = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(T2),
                     jnp.asarray(CTX))
    with torch.no_grad():
        ref = tm(torch.tensor(x)[:, :, None, None], torch.tensor(T2),
                 torch.tensor(CTX)).numpy()
    np.testing.assert_allclose(np.asarray(out), ref.reshape(2, -1)[:, :24],
                               atol=2e-4, rtol=1e-3)


def test_unet_vd_two_trunk(ref_om):
    """UNetModelVD zip-walk (:2468-2524): all four (xtype, ctype) routes plus
    forward_dc dual-context blending (:2526-2566)."""
    torch.manual_seed(8)
    # the reference's print_log -> sync.get_rank divides by
    # torch.cuda.device_count() (zero on CPU) — silence it
    gm = ref_module("lib.model_zoo.common.get_model")
    gm.print_log = lambda *a, **k: None
    img_cfg = _EDict(type="openai_unet_2d", args=_EDict(CFG_2D))
    txt_cfg = _EDict(type="openai_unet_0dmd", args=_EDict(CFG_0DMD))
    tm = derandomize_zeros(ref_om.UNetModelVD(img_cfg, txt_cfg).eval())

    ours = L.LegacyUNetVD({"type": "openai_unet_2d", "args": dict(CFG_2D)},
                          {"type": "openai_unet_0dmd", "args": dict(CFG_0DMD)})
    x_img = X_JAX
    x_txt = jnp.asarray(np.random.RandomState(4).randn(2, 24).astype(np.float32))
    c_vis = jnp.asarray(np.random.RandomState(5).randn(2, 9, 16).astype(np.float32))
    c_pr = jnp.asarray(CTX)
    params = ours.init(jax.random.PRNGKey(0), x_img, x_txt, jnp.asarray(T2),
                       c_vis, c_pr, method=L.LegacyUNetVD.init_walk)
    params, _ = torch_to_flax(tm.state_dict(), params["params"])

    t_t2 = torch.tensor(T2)
    cases = [("image", "prompt", x_img, c_pr), ("image", "vision", x_img, c_vis),
             ("text", "prompt", x_txt, c_pr), ("text", "vision", x_txt, c_vis)]
    for xtype, ctype, x, c in cases:
        out = ours.apply({"params": params}, x, jnp.asarray(T2), c,
                         xtype=xtype, ctype=ctype)
        with torch.no_grad():
            ref = tm(torch.tensor(np.asarray(x)).permute(0, 3, 1, 2)
                     if xtype == "image" else torch.tensor(np.asarray(x)),
                     t_t2, torch.tensor(np.asarray(c)),
                     xtype=xtype, ctype="vision" if ctype == "vision" else "prompt")
        ref = ref.numpy()
        got = _nchw(out) if xtype == "image" else np.asarray(out)
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3,
                                   err_msg=f"{xtype}/{ctype}")

    # forward_dc: per-context-layer delta blend
    out = ours.apply({"params": params}, x_img, jnp.asarray(T2), c_vis, c_pr,
                     "image", "vision", "prompt", 0.25,
                     method=L.LegacyUNetVD.forward_dc)
    with torch.no_grad():
        ref = tm.forward_dc(torch.tensor(X84), t_t2,
                            torch.tensor(np.asarray(c_vis)),
                            torch.tensor(np.asarray(c_pr)),
                            "image", "vision", "prompt", 0.25).numpy()
    np.testing.assert_allclose(_nchw(out), ref, atol=2e-4, rtol=1e-3)


def test_registry_exposes_legacy_types():
    from vdtpu.config.registry import get_builder
    for name in ("openai_unet", "openai_unet_dual_context",
                 "openai_unet_nocontext", "openai_unet_nocontext_noatt",
                 "openai_unet_nocontext_noatt_decoderonly", "openai_unet_2d",
                 "openai_unet_0d", "openai_unet_0dmd", "openai_unet_vd"):
        assert callable(get_builder(name)), name


def test_legacy_vd_registry_jit_sampling():
    """The legacy two-trunk diffuser is usable for inference through the
    registry: config-built, jit-compiled (static layer program), and stable
    over an unrolled denoise loop in both streams."""
    from vdtpu.config.registry import build

    model = build({"type": "openai_unet_vd",
                   "args": {"unet_image_cfg": {"type": "openai_unet_2d",
                                               "args": dict(CFG_2D)},
                            "unet_text_cfg": {"type": "openai_unet_0dmd",
                                              "args": dict(CFG_0DMD)}}})
    x_img = jnp.zeros((2, 8, 8, 4))
    x_txt = jnp.zeros((2, 24))
    t = jnp.array([0, 1])
    c = jnp.asarray(CTX)
    params = model.init(jax.random.PRNGKey(2), x_img, x_txt, t, c, c,
                        method=type(model).init_walk)["params"]

    @jax.jit
    def step_img(x, t, c):
        return model.apply({"params": params}, x, t, c,
                           xtype="image", ctype="prompt")

    @jax.jit
    def step_txt(x, t, c):
        return model.apply({"params": params}, x, t, c,
                           xtype="text", ctype="prompt")

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 4), jnp.float32)
    for i in range(4):  # toy denoise: x <- x - 0.3 * eps
        x = x - 0.3 * step_img(x, jnp.full((2,), 900 - 200 * i), c)
    assert np.isfinite(np.asarray(x)).all()
    assert step_img._cache_size() == 1  # one trace for all steps

    xt = jnp.asarray(np.random.RandomState(1).randn(2, 24), jnp.float32)
    for i in range(4):
        xt = xt - 0.3 * step_txt(xt, jnp.full((2,), 900 - 200 * i), c)
    assert np.isfinite(np.asarray(xt)).all()


def test_legacy_vd_paramfree_resample():
    """conv_resample=False trunks (parameter-free pool/nearest-up) must walk
    through the VD zip-dispatcher too, not just the standalone trunks."""
    cfg2d = dict(CFG_2D, conv_resample=False)
    model = L.LegacyUNetVD({"type": "openai_unet_2d", "args": cfg2d},
                           {"type": "openai_unet_0dmd", "args": dict(CFG_0DMD)})
    x_img = X_JAX
    x_txt = jnp.zeros((2, 24))
    t = jnp.asarray(T2)
    c = jnp.asarray(CTX)
    params = model.init(jax.random.PRNGKey(3), x_img, x_txt, t, c, c,
                        method=L.LegacyUNetVD.init_walk)
    out = model.apply(params, x_img, t, c, xtype="image", ctype="prompt")
    assert out.shape == (2, 8, 8, 4) and np.isfinite(np.asarray(out)).all()
