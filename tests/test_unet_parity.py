"""Golden-tensor parity: our Flax UNets vs the torch reference (random weights).

The reference's own `.forward` has a known bug (walks i_order in its output
stage, openaimodel.py:2801), so the oracle here replays the correct walk the
way `vd.py:apply_model` does.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _reference import derandomize_zeros, ref_module  # noqa: E402
from vdtpu.interop.torch_convert import torch_to_flax  # noqa: E402
from vdtpu.models.unet import UNet0DNext, UNet2DNext  # noqa: E402


def walk_reference(unet, x, t, context):
    """Replay vd.py:330-381 on a single reference diffuser."""
    om = ref_module("lib.model_zoo.openaimodel")
    t_emb = om.timestep_embedding(t, unet.model_channels, repeat_only=False)
    emb = unet.time_embed(t_emb)
    d_iter = iter(unet.data_blocks)
    c_iter = iter(unet.context_blocks)
    hs, h = [], x
    for order in (unet.i_order, unet.m_order, unet.o_order):
        for ltype in order:
            if ltype == "d":
                h = next(d_iter)(h, emb, None)
            elif ltype == "c":
                h = next(c_iter)(h, emb, context)
            elif ltype == "save_hidden_feature":
                hs.append(h)
            elif ltype == "load_hidden_feature":
                h = torch.cat([h, hs.pop()], dim=1)
    return h


SMALL_2D = dict(
    in_channels=4, model_channels=32, out_channels=4,
    num_res_blocks=[1, 1], attention_resolutions=[1, 2],
    channel_mult=[1, 2], num_heads=4, context_dim=16)

SMALL_0D = dict(
    input_channels=24, model_channels=32, output_channels=24,
    num_noattn_blocks=[1, 1], channel_mult=[1, 2], second_dim=[4, 4],
    with_attn=[True, False], num_heads=4, context_dim=16)


@pytest.fixture(scope="module")
def ref_om():
    return ref_module("lib.model_zoo.openaimodel")


def test_program_matches_reference_orders(ref_om):
    tm = ref_om.UNetModel2D_Next(**SMALL_2D)
    ours = UNet2DNext(**{k: v for k, v in SMALL_2D.items()})
    prog = ours.bind({"params": {}}, mutable=False) if False else None
    from vdtpu.models.unet import build_program_2d
    p = build_program_2d(4, 32, 4, [1, 1], [1, 2], [1, 2], 4)
    conv = {"d": "d", "c": "c", "save": "save_hidden_feature", "load": "load_hidden_feature"}
    assert [conv[t] for t in p.i_order] == tm.i_order
    assert [conv[t] for t in p.m_order] == tm.m_order
    assert [conv[t] for t in p.o_order] == tm.o_order
    assert len(p.data) == len(tm.data_blocks)
    assert len(p.ctx) == len(tm.context_blocks)


def test_2d_0d_program_alignment():
    """The four-flow config's two diffusers must emit identical token orders
    (check_diffuser contract, vd.py:313-320)."""
    from vdtpu.models.unet import build_program_0d, build_program_2d
    p2 = build_program_2d(4, 320, 4, [2, 2, 2, 2], [4, 2, 1], [1, 2, 4, 4], 8)
    p0 = build_program_0d(768, 320, 768, [2, 2, 2, 2], [1, 2, 4, 4],
                          [4, 4, 4, 4], [True, True, True, False], 8)
    assert p2.layer_order == p0.layer_order


def test_unet2d_parity(ref_om):
    torch.manual_seed(0)
    tm = derandomize_zeros(ref_om.UNetModel2D_Next(**SMALL_2D).eval())
    sd = tm.state_dict()

    ours = UNet2DNext(**SMALL_2D)
    x = np.random.RandomState(0).randn(2, 4, 8, 8).astype(np.float32)
    t = np.array([3, 500], dtype=np.int64)
    ctx = np.random.RandomState(1).randn(2, 7, 16).astype(np.float32)

    x_jax = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = ours.init(jax.random.PRNGKey(0), x_jax, jnp.asarray(t), jnp.asarray(ctx))
    params, _ = torch_to_flax(sd, params["params"])

    out = ours.apply({"params": params}, x_jax, jnp.asarray(t), jnp.asarray(ctx))
    out = np.asarray(out).transpose(0, 3, 1, 2)

    with torch.no_grad():
        ref = walk_reference(tm, torch.tensor(x), torch.tensor(t), torch.tensor(ctx)).numpy()
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_unet0d_parity(ref_om):
    torch.manual_seed(1)
    tm = derandomize_zeros(ref_om.UNetModel0D_Next(**SMALL_0D).eval())
    sd = tm.state_dict()

    ours = UNet0DNext(**SMALL_0D)
    x = np.random.RandomState(2).randn(2, 24).astype(np.float32)
    t = np.array([7, 42], dtype=np.int64)
    ctx = np.random.RandomState(3).randn(2, 5, 16).astype(np.float32)

    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))
    params, _ = torch_to_flax(sd, params["params"])
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)))

    with torch.no_grad():
        ref = walk_reference(tm, torch.tensor(x), torch.tensor(t), torch.tensor(ctx)).numpy()
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_0d_per_level_second_dim(ref_om):
    """Per-level second_dim (ref openaimodel.py:2885-2963 carries [C,S,1]
    state per level). The reference itself CRASHES at runtime for varying S
    (torch.cat dim=1 across levels with mismatched S, and FCBlock channel
    specs computed from the wrong S), so the oracle here is the construction
    walk: per-slot (C, S) must follow the level the slot sits in — round 1
    wrongly tokenized every slot with S = second_dim[0]."""
    cfg = dict(input_channels=24, model_channels=32, output_channels=24,
               num_noattn_blocks=[1, 1], channel_mult=[1, 2], second_dim=[4, 6],
               with_attn=[True, True], num_heads=4, context_dim=16)
    from vdtpu.models.unet import build_program_0d
    p = build_program_0d(24, 32, 24, [1, 1], [1, 2], [4, 6], [True, True], 4)
    # construction replay: i:[(32,4),(64,6)] m:[(64,6)] o:[(64,6),(64,6),(32,4),(32,4)]
    expected = [(32, 4), (64, 6), (64, 6), (64, 6), (64, 6), (32, 4), (32, 4)]
    assert [c.channels for c in p.ctx] == [c for c, _ in expected]
    # the reference's ctx-block channel sequence agrees where constructible
    tm = ref_om.UNetModel0D_Next(**cfg)
    ref_chs = [blk[0].in_channels for blk in tm.context_blocks]
    assert ref_chs == [c for c, _ in expected]

    ours = UNet0DNext(**cfg)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 24).astype(np.float32))
    t = jnp.array([7, 42])
    ctx = jnp.asarray(np.random.RandomState(3).randn(2, 5, 16).astype(np.float32))
    params = ours.init(jax.random.PRNGKey(0), x, t, ctx)
    out = ours.apply(params, x, t, ctx)
    assert out.shape == (2, 24) and np.isfinite(np.asarray(out)).all()

    # tokens_of must reshape by the slot's channel count, not second_dim[0]
    bound = ours.bind(params)
    for ci, (c, s) in enumerate(expected):
        tokens, restore = bound.tokens_of(jnp.zeros((2, c * s)), ci)
        assert tokens.shape == (2, s, c), (ci, tokens.shape)
        assert restore(tokens).shape == (2, c * s)


def test_remat_preserves_forward_and_grad(ref_om):
    """use_checkpoint (nn.remat) must not change forward values or grads."""
    cfg = dict(SMALL_2D)
    x = jnp.asarray(np.random.RandomState(5).randn(1, 8, 8, 4).astype(np.float32))
    t = jnp.array([13])
    ctx = jnp.asarray(np.random.RandomState(6).randn(1, 7, 16).astype(np.float32))

    plain = UNet2DNext(**cfg, use_checkpoint=False)
    remat = UNet2DNext(**cfg, use_checkpoint=True)
    params = plain.init(jax.random.PRNGKey(1), x, t, ctx)["params"]

    o1 = plain.apply({"params": params}, x, t, ctx)
    o2 = remat.apply({"params": params}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

    g1 = jax.grad(lambda p: plain.apply({"params": p}, x, t, ctx).sum())(params)
    g2 = jax.grad(lambda p: remat.apply({"params": p}, x, t, ctx).sum())(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_selective_remat_preserves_forward_and_grad(ref_om):
    """remat_max_channels (selective remat: only blocks <= threshold, i.e.
    the high-resolution levels) must be bit-identical to full remat and to
    no remat — it only changes what the backward pass recomputes."""
    cfg = dict(SMALL_2D)
    x = jnp.asarray(np.random.RandomState(5).randn(1, 8, 8, 4).astype(np.float32))
    t = jnp.array([13])
    ctx = jnp.asarray(np.random.RandomState(6).randn(1, 7, 16).astype(np.float32))

    plain = UNet2DNext(**cfg, use_checkpoint=False)
    # threshold 32 = remat only the model_channels-wide (highest-res) level
    sel = UNet2DNext(**cfg, use_checkpoint=True, remat_max_channels=32)
    params = plain.init(jax.random.PRNGKey(1), x, t, ctx)["params"]
    # same param tree: selective remat must not change module structure
    assert (jax.tree_util.tree_structure(params) ==
            jax.tree_util.tree_structure(
                sel.init(jax.random.PRNGKey(1), x, t, ctx)["params"]))

    o1 = plain.apply({"params": params}, x, t, ctx)
    o2 = sel.apply({"params": params}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

    g1 = jax.grad(lambda p: plain.apply({"params": p}, x, t, ctx).sum())(params)
    g2 = jax.grad(lambda p: sel.apply({"params": p}, x, t, ctx).sum())(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
