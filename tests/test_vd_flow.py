"""Multi-flow orchestration tests: cross-diffuser walks, multicontext mixing,
and the DDIM scan math vs a numpy reimplementation of the reference update."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _reference import derandomize_zeros, ref_module  # noqa: E402
from vdtpu.interop.torch_convert import torch_to_flax  # noqa: E402
from vdtpu.models.vd import MultiDiffuser  # noqa: E402

SMALL_2D = dict(
    in_channels=4, model_channels=32, out_channels=4,
    num_res_blocks=[1, 1], attention_resolutions=[1, 2],
    channel_mult=[1, 2], num_heads=4, context_dim=16)
SMALL_0D = dict(
    input_channels=24, model_channels=32, output_channels=24,
    num_noattn_blocks=[1, 1], channel_mult=[1, 2], second_dim=[4, 4],
    with_attn=[True, True], num_heads=4, context_dim=16)

DIFF_CFGS = (
    ("image", {"type": "openai_unet_2d_next", "args": SMALL_2D}),
    ("text", {"type": "openai_unet_0d_next", "args": SMALL_0D}),
)


@pytest.fixture(scope="module")
def ref_pair():
    om = ref_module("lib.model_zoo.openaimodel")
    torch.manual_seed(0)
    tm2 = derandomize_zeros(om.UNetModel2D_Next(**SMALL_2D).eval())
    tm0 = derandomize_zeros(om.UNetModel0D_Next(**SMALL_0D).eval(), seed=1)
    assert tm2.layer_order == tm0.layer_order
    return om, tm2, tm0


@pytest.fixture(scope="module")
def our_diffuser(ref_pair):
    _, tm2, tm0 = ref_pair
    md = MultiDiffuser(diffuser_cfgs=DIFF_CFGS, global_layer_ptr="image")
    inputs = {
        "image": {"x": jnp.zeros((1, 8, 8, 4)), "context": jnp.zeros((1, 5, 16))},
        "text": {"x": jnp.zeros((1, 24)), "context": jnp.zeros((1, 5, 16))},
    }
    params = md.init(jax.random.PRNGKey(0), inputs, jnp.zeros((1,), jnp.int32))["params"]
    sd = {f"image.{k}": v for k, v in tm2.state_dict().items()}
    sd.update({f"text.{k}": v for k, v in tm0.state_dict().items()})
    params, _ = torch_to_flax(sd, params)
    return md, params


def walk_reference_mixed(om, glayer, dif_x, dif_c, x, t, context):
    """Replay vd.py:330-381 with data blocks from dif_x, ctx blocks from dif_c."""
    t_emb = om.timestep_embedding(t, glayer.model_channels, repeat_only=False)
    emb = glayer.time_embed(t_emb)
    d_iter, c_iter = iter(dif_x.data_blocks), iter(dif_c.context_blocks)
    hs, h = [], x
    for order in (dif_x.i_order, dif_x.m_order, dif_x.o_order):
        for lt in order:
            if lt == "d":
                h = next(d_iter)(h, emb, None)
            elif lt == "c":
                h = next(c_iter)(h, emb, context)
            elif lt == "save_hidden_feature":
                hs.append(h)
            elif lt == "load_hidden_feature":
                h = torch.cat([h, hs.pop()], dim=1)
    return h


@pytest.mark.parametrize("x_type,c_type", [
    ("image", "text"),   # t2i: image data blocks + text-diffuser ctx blocks
    ("text", "image"),   # i2t
    ("image", "image"),  # image-variation
    ("text", "text"),    # text-variation
])
def test_cross_flow_parity(ref_pair, our_diffuser, x_type, c_type):
    om, tm2, tm0 = ref_pair
    md, params = our_diffuser
    ref_d = {"image": tm2, "text": tm0}
    rs = np.random.RandomState(7)
    if x_type == "image":
        x_np = rs.randn(2, 4, 8, 8).astype(np.float32)
        x_j = jnp.asarray(x_np.transpose(0, 2, 3, 1))
    else:
        x_np = rs.randn(2, 24).astype(np.float32)
        x_j = jnp.asarray(x_np)
    ctx = rs.randn(2, 5, 16).astype(np.float32)
    t = np.array([11, 503], dtype=np.int64)

    out = md.apply({"params": params}, x_j, jnp.asarray(t), jnp.asarray(ctx),
                   x_type, c_type, method=MultiDiffuser.apply_flow)
    out = np.asarray(out)
    if x_type == "image":
        out = out.transpose(0, 3, 1, 2)

    with torch.no_grad():
        x_t = torch.tensor(x_np)
        ref = walk_reference_mixed(
            om, tm2, ref_d[x_type], ref_d[c_type],
            x_t, torch.tensor(t), torch.tensor(ctx)).numpy()
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)


def test_multicontext_attention_mixing(ref_pair, our_diffuser):
    """'attention' mixing = ratio-weighted sum of per-context block outputs
    (ref vd.py:383-402). Oracle: replay with two contexts in torch."""
    om, tm2, tm0 = ref_pair
    md, params = our_diffuser
    rs = np.random.RandomState(3)
    x_np = rs.randn(1, 4, 8, 8).astype(np.float32)
    ctx_a = rs.randn(1, 5, 16).astype(np.float32)
    ctx_b = rs.randn(1, 7, 16).astype(np.float32)
    t = np.array([99], dtype=np.int64)
    ratios = [0.7, 0.3]

    out = md.apply({"params": params}, jnp.asarray(x_np.transpose(0, 2, 3, 1)),
                   jnp.asarray(t), [jnp.asarray(ctx_a), jnp.asarray(ctx_b)],
                   ratios, "image", ["text", "image"],
                   method=MultiDiffuser.apply_flow_multicontext)
    out = np.asarray(out).transpose(0, 3, 1, 2)

    with torch.no_grad():
        t_emb = om.timestep_embedding(torch.tensor(t), 32, repeat_only=False)
        emb = tm2.time_embed(t_emb)
        d_iter = iter(tm2.data_blocks)
        c_iters = [iter(tm0.context_blocks), iter(tm2.context_blocks)]
        ctxs = [torch.tensor(ctx_a), torch.tensor(ctx_b)]
        r = np.asarray(ratios) / np.sum(ratios)
        hs, h = [], torch.tensor(x_np)
        for order in (tm2.i_order, tm2.m_order, tm2.o_order):
            for lt in order:
                if lt == "d":
                    h = next(d_iter)(h, emb, None)
                elif lt == "c":
                    mods = [next(ci) for ci in c_iters]
                    h = sum(m(h, emb, c) * ri for m, c, ri in zip(mods, ctxs, r))
                elif lt == "save_hidden_feature":
                    hs.append(h)
                elif lt == "load_hidden_feature":
                    h = torch.cat([h, hs.pop()], dim=1)
        ref = h.numpy()
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)


def test_ddim_scan_matches_reference_math():
    """Run the lax.scan sampler with a closed-form eps model and compare to a
    numpy replay of the reference update (ddim.py:144-171), incl. CFG."""
    from vdtpu.ops.schedules import DiffusionSchedule
    from vdtpu.sampling.ddim import DDIMTables, cfg_eps_fn, ddim_scan

    sched = DiffusionSchedule.create(1000, "linear", 0.00085, 0.012)
    tables = DDIMTables.create(sched, steps=20, eta=0.0)
    rs = np.random.RandomState(0)
    x0 = rs.randn(2, 4, 4, 3).astype(np.float32)
    W = rs.randn(3, 3).astype(np.float32) * 0.05
    cond = np.float32(0.3)
    uncond = np.float32(0.0)
    scale = 7.5

    def model_eps(x, t, c):
        # linear toy eps-model; same formula in jnp and numpy
        tt = jnp.asarray(t, jnp.float32).reshape(-1, 1, 1, 1)
        return x @ jnp.asarray(W) + c + 1e-4 * tt

    eps = cfg_eps_fn(model_eps, jnp.full((2, 1, 1, 1), cond),
                     jnp.full((2, 1, 1, 1), uncond), scale)
    out = np.asarray(ddim_scan(eps, jnp.asarray(x0), jax.random.PRNGKey(0), tables))

    # numpy replay in strict f32 (the scan runs f32; f64 here would diverge
    # through 20 steps of 1/sqrt(alpha) amplification)
    f = np.float32
    x = x0.copy()
    for i in range(len(tables.timesteps)):
        t = f(tables.timesteps[i])
        def np_eps(xx, c):
            return xx @ W + f(c) + f(1e-4) * t
        e = np_eps(x, uncond) + f(scale) * (np_eps(x, cond) - np_eps(x, uncond))
        a_t, a_prev = f(tables.alphas[i]), f(tables.alphas_prev[i])
        som = f(tables.sqrt_one_minus_alphas[i])
        pred_x0 = ((x - som * e) / np.sqrt(a_t)).astype(f)
        dir_xt = (np.sqrt(f(1.0) - a_prev) * e).astype(f)
        x = (np.sqrt(a_prev) * pred_x0 + dir_xt).astype(f)
    np.testing.assert_allclose(out, x, atol=2e-3, rtol=1e-3)


def test_multicontext_layer_mixing(ref_pair, our_diffuser):
    """'layer' mixing: one-hot context pick per slot equals calling only the
    chosen context's block (ref vd.py:397-402)."""
    om, tm2, tm0 = ref_pair
    md, params = our_diffuser
    rs = np.random.RandomState(9)
    x = jnp.asarray(rs.randn(1, 4, 8, 8).transpose(0, 2, 3, 1).astype(np.float32))
    ctx_a = jnp.asarray(rs.randn(1, 5, 16).astype(np.float32))
    ctx_b = jnp.asarray(rs.randn(1, 7, 16).astype(np.float32))
    t = jnp.array([55])
    n_slots = sum(1 for tok in tm2.layer_order if tok == "c")
    choices = jnp.asarray(np.random.RandomState(10).randint(0, 2, n_slots))

    out = md.apply({"params": params}, x, t, [ctx_a, ctx_b], [0.5, 0.5],
                   "image", ["text", "image"], "layer", choices,
                   method=MultiDiffuser.apply_flow_multicontext)
    assert out.shape == x.shape

    # oracle: replay picking exactly the chosen context per slot
    om2, tm2b, tm0b = ref_pair
    with torch.no_grad():
        t_emb = om2.timestep_embedding(torch.tensor(np.asarray(t, np.int64)), 32,
                                       repeat_only=False)
        emb = tm2b.time_embed(t_emb)
        d_iter = iter(tm2b.data_blocks)
        c_iters = [iter(tm0b.context_blocks), iter(tm2b.context_blocks)]
        ctxs = [torch.tensor(np.asarray(ctx_a)), torch.tensor(np.asarray(ctx_b))]
        x_t = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))
        hs, h, ci = [], x_t, 0
        for order in (tm2b.i_order, tm2b.m_order, tm2b.o_order):
            for lt in order:
                if lt == "d":
                    h = next(d_iter)(h, emb, None)
                elif lt == "c":
                    mods = [next(cc) for cc in c_iters]
                    pick = int(choices[ci])
                    h = mods[pick](h, emb, ctxs[pick])
                    ci += 1
                elif lt == "save_hidden_feature":
                    hs.append(h)
                elif lt == "load_hidden_feature":
                    h = torch.cat([h, hs.pop()], dim=1)
        ref = h.numpy()
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=3e-4, rtol=1e-3)


def test_ddim_intermediates_and_noise_dropout():
    from vdtpu.ops.schedules import DiffusionSchedule
    from vdtpu.sampling.ddim import DDIMTables, ddim_scan
    sched = DiffusionSchedule.create(100, "linear", 0.00085, 0.012)
    tables = DDIMTables.create(sched, steps=5, eta=1.0)
    eps = lambda x, t, i: 0.1 * x
    x0 = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 3).astype(np.float32))
    x, inter = ddim_scan(eps, x0, jax.random.PRNGKey(0), tables,
                         noise_dropout=0.3, return_intermediates=True)
    assert inter["pred_xt"].shape == (5, 2, 4, 4, 3)
    assert inter["pred_x0"].shape == (5, 2, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(inter["pred_xt"][-1]), np.asarray(x))
    assert np.isfinite(np.asarray(x)).all()


def test_img2img_x0_truncation_matches_replay():
    """The x0/x0_forward_timesteps path (ref ddim.py:97-103): q_sample at
    ascending-step k, then denoise over only the k lowest timesteps."""
    from vdtpu.models.vd import VDModel
    from vdtpu.ops.schedules import DiffusionSchedule
    from vdtpu.sampling.ddim import DDIMSampler, DDIMTables

    sched = DiffusionSchedule.create(1000, "linear", 0.00085, 0.012)

    class ToyModel:
        schedule = sched
        def apply_model(self, params, x, t, c, x_type, c_type):
            return 0.05 * x + c.mean() * 0.0  # linear toy eps

    sampler = DDIMSampler(ToyModel())
    steps, kcut = 10, 4
    rs = np.random.RandomState(0)
    x0 = rs.randn(2, 4, 4, 3).astype(np.float32)
    cond = jnp.zeros((2, 3, 8))
    key = jax.random.PRNGKey(5)

    out = sampler.sample(
        None, key, steps, x0.shape,
        {"type": "image", "x0": x0, "x0_forward_timesteps": kcut},
        {"type": "text", "conditioning": cond,
         "unconditional_conditioning": None,
         "unconditional_guidance_scale": 1.0})

    # replay: same key stream as sampler._x_init + ddim_scan
    tables = DDIMTables.create(sched, steps, 0.0)
    ts_asc = tables.timesteps[::-1]
    key2, sub = jax.random.split(jax.random.fold_in(key, 0))
    noise = jax.random.normal(jax.random.split(sub)[1], x0.shape, jnp.float32)
    t0 = jnp.full((2,), int(ts_asc[kcut]), jnp.int32)
    x = np.asarray(sched.q_sample(jnp.asarray(x0), t0, noise), np.float32)

    f = np.float32
    for i in range(steps - kcut, steps):  # trailing k rows of the descending tables
        e = f(0.05) * x
        a_t, a_prev = f(tables.alphas[i]), f(tables.alphas_prev[i])
        som = f(tables.sqrt_one_minus_alphas[i])
        pred_x0 = ((x - som * e) / np.sqrt(a_t)).astype(f)
        x = (np.sqrt(a_prev) * pred_x0 + (np.sqrt(f(1) - a_prev) * e)).astype(f)
    np.testing.assert_allclose(np.asarray(out), x, atol=2e-4, rtol=1e-4)
