"""Full-size numerical parity vs the torch reference + torch-noise injection.

VERDICT r1 item 2: every round-1 parity test ran tiny shapes; here the REAL
configuration dims (320-ch UNets per configs/model/openai_unet.yaml:4-17,
CLIP ViT-L/14 towers, 512^2 KL-f8 decode per configs/model/autokl.yaml) are
compared against the reference modules on CPU with converted random weights,
and the sampler's torch-noise injection hooks (vdtpu/interop/noise.py) are
exercised end-to-end against the reference's actual DDIMSampler class so
bit-comparability vs the published checkpoint is a one-command test once
real weights exist.

Tolerance budget (f32, random weights scaled like trained nets):
  module                     metric             budget     rationale
  UNet2D eps (320ch, 64x64)  atol/max|ref|      3e-3       ~70 matmul/conv
                                                           layers of f32
                                                           reassociation
  UNet0D eps (768-d latent)  atol/max|ref|      3e-3       same depth
  CLIP text/vision (L/14)    atol               2e-3       24-layer tower,
                                                           LN-bounded scale
  KL-f8 decode 512^2         atol               2e-3       output in [0,1]
  DDIM trajectory (injected  atol               1e-5       identical math,
  torch noise, stub model)                                 only f32 ordering

These run in the default suite (each is seconds-to-~2min on CPU; the jit
cache makes re-runs cheap). Mark: slow.
"""
import gc

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _reference import derandomize_zeros, ref_module  # noqa: E402
from vdtpu.interop import noise as tnoise  # noqa: E402
from vdtpu.interop.torch_convert import torch_to_flax  # noqa: E402

# ---------------------------------------------------------------------------
# Torch-noise injection: our sampler consumes the reference's RNG stream and
# must reproduce the reference sampler's trajectory exactly (stub model =>
# any difference is sampler math, not network numerics).
# ---------------------------------------------------------------------------


class _StubRefModel:
    """Minimal model surface the reference DDIMSampler needs (ddim.py:10-56),
    with an analytic apply_model shared with the JAX side."""

    def __init__(self, schedule):
        self.num_timesteps = schedule.num_timesteps
        self.device = torch.device("cpu")
        self.betas = torch.tensor(schedule.betas)
        self.alphas_cumprod = torch.tensor(schedule.alphas_cumprod)
        self.alphas_cumprod_prev = torch.tensor(schedule.alphas_cumprod_prev)
        self._sqrt_ac = torch.tensor(schedule.sqrt_alphas_cumprod)
        self._sqrt_1mac = torch.tensor(schedule.sqrt_one_minus_alphas_cumprod)

    def q_sample(self, x0, ts):
        # ref vd.py:237-239 — draws torch.randn_like when not given noise
        noise = torch.randn_like(x0)
        b = [-1] + [1] * (x0.ndim - 1)
        return (self._sqrt_ac[ts].view(b) * x0
                + self._sqrt_1mac[ts].view(b) * noise)

    def apply_model(self, x_info, t, c_info):
        x, c = x_info["x"], c_info["c"]
        tt = t.to(x.dtype).view(-1, *([1] * (x.ndim - 1)))
        return 0.1 * x + c.mean(dim=(1, 2)).view(-1, *([1] * (x.ndim - 1))) \
            + 1e-4 * tt


def _stub_eps_jax(x, t, c):
    tt = t.astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
    return 0.1 * x + c.mean(axis=(1, 2)).reshape(-1, *([1] * (x.ndim - 1))) \
        + 1e-4 * tt


class _StubVDJax:
    def __init__(self, schedule):
        self.schedule = schedule

    def apply_model(self, params, x, t, c, x_type, c_type):
        return _stub_eps_jax(x, t, c)


@pytest.fixture(scope="module")
def ref_sampler_cls(monkeypatch_module=None):
    ddim = ref_module("lib.model_zoo.ddim")
    # the reference hard-codes .to('cuda') in register_buffer (ddim.py:17-21);
    # keep buffers on CPU for the oracle run
    ddim.DDIMSampler.register_buffer = lambda self, name, attr: setattr(self, name, attr)
    return ddim.DDIMSampler


@pytest.mark.parametrize("eta,mode", [(0.0, "noise"), (0.5, "noise"), (0.5, "x0")])
def test_torch_noise_injection_matches_reference_sampler(ref_sampler_cls, eta, mode):
    from vdtpu.ops.schedules import DiffusionSchedule
    from vdtpu.sampling.ddim import DDIMSampler

    sched = DiffusionSchedule.create(
        timesteps=1000, beta_schedule="linear",
        linear_start=0.00085, linear_end=0.012)
    shape, steps, seed, scale = (2, 4, 8, 8), 8, 123, 7.5
    cond_np = np.random.RandomState(1).randn(2, 5, 6).astype(np.float32)
    uncond_np = np.zeros_like(cond_np)
    x0_np = np.random.RandomState(2).randn(*shape).astype(np.float32)
    fwd_ts = 5

    # --- reference run (consumes the pinned torch RNG stream) -------------
    ref = ref_sampler_cls(_StubRefModel(sched))
    np.random.seed(seed)
    torch.manual_seed(seed + 100)  # app.py:308-309 convention
    x_info = {"type": "image"}
    if mode == "x0":
        x_info.update(x0=torch.tensor(x0_np), x0_forward_timesteps=fwd_ts)
    c_info = {"type": "text", "conditioning": torch.tensor(cond_np),
              "unconditional_conditioning": torch.tensor(uncond_np),
              "unconditional_guidance_scale": scale}
    with torch.no_grad():
        ref_out, _ = ref.sample(steps, shape, x_info, c_info, eta=eta,
                                verbose=False)
    ref_out = ref_out.numpy()

    # --- our run with the captured stream ---------------------------------
    cap = tnoise.capture(seed, shape, steps,
                         x0_forward_timesteps=fwd_ts if mode == "x0" else None)
    ours = DDIMSampler(_StubVDJax(sched))
    xi = {"type": "image"}
    if mode == "x0":
        xi.update(x0=x0_np, x0_forward_timesteps=fwd_ts, noise=cap["q_noise"])
    else:
        xi["xt"] = cap["xt"]
    ci = {"type": "text", "conditioning": cond_np,
          "unconditional_conditioning": uncond_np,
          "unconditional_guidance_scale": scale}
    out = ours.sample({}, jax.random.PRNGKey(0), steps, shape, xi, ci,
                      eta=eta, noise_table=cap["step_noise"])
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# Full-size module parity (slow): the real config dims, never before compared.
# ---------------------------------------------------------------------------

FULL_2D = dict(  # configs/model/openai_unet.yaml:4-17 (use_checkpoint off)
    in_channels=4, model_channels=320, out_channels=4,
    num_res_blocks=[2, 2, 2, 2], attention_resolutions=[4, 2, 1],
    channel_mult=[1, 2, 4, 4], num_heads=8, context_dim=768)

FULL_0D = dict(  # configs/model/openai_unet.yaml "0d" section
    input_channels=768, model_channels=320, output_channels=768,
    num_noattn_blocks=[2, 2, 2, 2], channel_mult=[1, 2, 4, 4],
    second_dim=[4, 4, 4, 4], with_attn=[True, True, True, False],
    num_heads=8, context_dim=768)

FULL_KL = dict(  # configs/model/autokl.yaml
    double_z=True, z_channels=4, resolution=256, in_channels=3, out_ch=3,
    ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2, attn_resolutions=[],
    dropout=0.0)


def _rel_close(ours, ref, budget, name):
    ref = np.asarray(ref)
    scale = max(float(np.abs(ref).max()), 1e-6)
    err = float(np.abs(np.asarray(ours) - ref).max()) / scale
    assert err < budget, f"{name}: rel-max err {err:.2e} > budget {budget:.0e}"


@pytest.mark.slow
def test_fullsize_unet2d_eps_parity():
    from test_unet_parity import walk_reference
    from vdtpu.models.unet import UNet2DNext

    om = ref_module("lib.model_zoo.openaimodel")
    torch.manual_seed(0)
    tm = derandomize_zeros(om.UNetModel2D_Next(**FULL_2D).eval())
    ours = UNet2DNext(**FULL_2D)
    x = np.random.RandomState(0).randn(1, 4, 64, 64).astype(np.float32)
    ctx = (np.random.RandomState(1).randn(1, 77, 768) * 0.5).astype(np.float32)
    t = np.array([444], np.int64)

    with torch.no_grad():
        ref_eps = walk_reference(tm, torch.tensor(x), torch.tensor(t),
                                 torch.tensor(ctx)).numpy()

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), xj,
                          jnp.asarray(t, jnp.int32), jnp.asarray(ctx)))["params"]
    params, _ = torch_to_flax(tm.state_dict(), params)  # strict: raises on gaps
    del tm
    gc.collect()
    eps = ours.apply({"params": params}, xj, jnp.asarray(t, jnp.int32),
                     jnp.asarray(ctx))
    _rel_close(np.asarray(eps).transpose(0, 3, 1, 2), ref_eps, 3e-3,
               "unet2d-320ch eps")


@pytest.mark.slow
def test_fullsize_unet0d_eps_parity():
    from test_unet_parity import walk_reference
    from vdtpu.models.unet import UNet0DNext

    om = ref_module("lib.model_zoo.openaimodel")
    torch.manual_seed(0)
    tm = derandomize_zeros(om.UNetModel0D_Next(**FULL_0D).eval())
    ours = UNet0DNext(**FULL_0D)
    x = np.random.RandomState(0).randn(2, 768).astype(np.float32)
    ctx = (np.random.RandomState(1).randn(2, 257, 768) * 0.5).astype(np.float32)
    t = np.array([444, 17], np.int64)

    with torch.no_grad():
        ref_eps = walk_reference(tm, torch.tensor(x), torch.tensor(t),
                                 torch.tensor(ctx)).numpy()

    params = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(t, jnp.int32), jnp.asarray(ctx)))["params"]
    params, _ = torch_to_flax(tm.state_dict(), params)
    del tm
    gc.collect()
    eps = ours.apply({"params": params}, jnp.asarray(x),
                     jnp.asarray(t, jnp.int32), jnp.asarray(ctx))
    _rel_close(eps, ref_eps, 3e-3, "unet0d eps")


@pytest.mark.slow
def test_fullsize_clip_text_parity():
    tfm = pytest.importorskip("transformers")
    from vdtpu.models.clip import CLIPTextContextEncoder

    cfg = tfm.CLIPConfig(  # openai/clip-vit-large-patch14 dims, random init
        text_config=dict(vocab_size=49408, hidden_size=768,
                         intermediate_size=3072, num_hidden_layers=12,
                         num_attention_heads=12, max_position_embeddings=77,
                         eos_token_id=49407),
        vision_config=dict(hidden_size=1024, intermediate_size=4096,
                           num_hidden_layers=24, num_attention_heads=16,
                           image_size=224, patch_size=14),
        projection_dim=768)
    torch.manual_seed(0)
    hf = tfm.CLIPModel(cfg).eval()

    ids = np.zeros((2, 77), np.int64)
    rs = np.random.RandomState(3)
    ids[:, 0] = 49406
    ids[0, 1:5] = rs.randint(1, 49406, 4)
    ids[0, 5:] = 49407
    ids[1, 1:] = 49407

    with torch.no_grad():  # ref clip.py:53-62
        out = hf.text_model(torch.tensor(ids))
        z = hf.text_projection(out.last_hidden_state)
        zp = hf.text_projection(out.pooler_output)
        ref = (z / zp.norm(dim=-1, keepdim=True).unsqueeze(1)).numpy()

    ours = CLIPTextContextEncoder()
    params = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), jnp.asarray(ids)))["params"]
    sd = {k: v for k, v in hf.state_dict().items()
          if k.startswith("text_model.") or k == "text_projection.weight"}
    params, _ = torch_to_flax(sd, params)
    del hf, sd
    gc.collect()
    z = ours.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(z), ref, atol=2e-3, rtol=1e-2)


@pytest.mark.slow
def test_fullsize_clip_vision_parity():
    tfm = pytest.importorskip("transformers")
    from vdtpu.models.clip import CLIPImageContextEncoder

    cfg = tfm.CLIPVisionConfig(hidden_size=1024, intermediate_size=4096,
                               num_hidden_layers=24, num_attention_heads=16,
                               image_size=224, patch_size=14)
    full = tfm.CLIPConfig(
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=4,
                         max_position_embeddings=8),
        vision_config=cfg.to_dict(), projection_dim=768)
    torch.manual_seed(0)
    hf = tfm.CLIPModel(full).eval()

    px = np.random.RandomState(4).rand(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():  # ref clip.py:88-101
        out = hf.vision_model(torch.tensor(px))
        h = hf.vision_model.post_layernorm(out.last_hidden_state)
        z = hf.visual_projection(h)
        ref = (z / z[:, 0:1].norm(dim=-1, keepdim=True)).numpy()

    ours = CLIPImageContextEncoder()
    pxj = jnp.asarray(px.transpose(0, 2, 3, 1))
    params = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), pxj))["params"]
    sd = {f"vision_model.{k}": v for k, v in hf.vision_model.state_dict().items()}
    sd.update({f"visual_projection.{k}": v
               for k, v in hf.visual_projection.state_dict().items()})
    params, _ = torch_to_flax(sd, params)
    del hf
    gc.collect()
    z = ours.apply({"params": params}, pxj)
    np.testing.assert_allclose(np.asarray(z), ref, atol=2e-3, rtol=1e-2)


@pytest.mark.slow
def test_fullsize_klf8_decode_512():
    from vdtpu.models.autoencoder import AutoencoderKL

    ak = ref_module("lib.model_zoo.autokl")
    torch.manual_seed(0)
    tm = ak.AutoencoderKL(ddconfig=FULL_KL, lossconfig=None, embed_dim=4).eval()
    ours = AutoencoderKL(ddconfig=FULL_KL, embed_dim=4)
    z = (np.random.RandomState(5).randn(1, 4, 64, 64) * 5).astype(np.float32)

    with torch.no_grad():
        ref_img = tm.decode(torch.tensor(z)).numpy()

    zj = jnp.asarray(z.transpose(0, 2, 3, 1))
    params = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 512, 512, 3))))["params"]
    params, _ = torch_to_flax(tm.state_dict(), params)
    del tm
    gc.collect()
    img = ours.apply({"params": params}, zj, method=AutoencoderKL.decode)
    assert img.shape == (1, 512, 512, 3)
    np.testing.assert_allclose(
        np.asarray(img).transpose(0, 3, 1, 2), ref_img, atol=2e-3, rtol=1e-2)
