"""Loss-surface completeness (ref vd.py:246-280, 307-311): learnable logvar,
l_elbo_weight application, and the ctx_encode_trainable training path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

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
    "global_layer_ptr": "image", "timesteps": 50,
    "beta_linear_start": 0.00085, "beta_linear_end": 0.012,
}}


def _model(**overrides):
    from vdtpu.models.vd import VDModel
    cfg = {"args": dict(TINY_CFG["args"], **overrides)}
    return VDModel.from_config(cfg)


def _data(bsz=4):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(bsz, 8, 8, 4).astype(np.float32))
    ctx = jnp.asarray(rs.randn(bsz, 7, 16).astype(np.float32))
    t = jnp.asarray([0, 7, 23, 49][:bsz])
    noise = jnp.asarray(rs.randn(bsz, 8, 8, 4).astype(np.float32))
    return x, ctx, t, noise


def test_p_losses_matches_reference_formula():
    """loss = l_simple_weight * mean(per_ex/exp(logvar_t) + logvar_t)
            + l_elbo_weight * mean(lvlb_weights[t] * per_ex)
    (vd.py:264-277; lvlb table itself is bit-tested in test_schedules)."""
    model = _model(learn_logvar=True, logvar_init=0.3, l_elbo_weight=0.25)
    params = model.init_params(jax.random.PRNGKey(0))
    assert params["logvar"].shape == (50,)
    # perturb logvar so the formula's exp() term is actually exercised
    params["logvar"] = jnp.linspace(-0.5, 0.5, 50)

    x, ctx, t, noise = _data()
    loss, aux = model.p_losses(params, x, t, ctx, "image", "text", noise)

    x_noisy = model.q_sample(x, t, noise)
    out = np.asarray(model.apply_model(params, x_noisy, t, ctx, "image", "text"))
    per_ex = ((out - np.asarray(noise)) ** 2).reshape(4, -1).mean(-1)
    logvar_t = np.asarray(params["logvar"])[np.asarray(t)]
    lvlb = (np.asarray(model.schedule.lvlb_weights)[np.asarray(t)] * per_ex).mean()
    expected = (per_ex / np.exp(logvar_t) + logvar_t).mean() + 0.25 * lvlb
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    assert "loss_gamma" in aux and "logvar" in aux
    np.testing.assert_allclose(float(aux["loss_simple"]), per_ex.mean(), rtol=1e-5)
    np.testing.assert_allclose(float(aux["loss_vlb"]), lvlb, rtol=1e-5)


def test_default_config_reproduces_round1_loss():
    """learn_logvar=False, l_elbo_weight=0 must be the plain simple loss
    (the reference's effective default behavior)."""
    model = _model()
    params = model.init_params(jax.random.PRNGKey(0))
    assert "logvar" not in params
    x, ctx, t, noise = _data()
    loss, aux = model.p_losses(params, x, t, ctx, "image", "text", noise)
    np.testing.assert_allclose(float(loss), float(aux["loss_simple"]), rtol=1e-6)


def test_learn_logvar_trains():
    """The logvar vector must receive gradients and move under the trainer."""
    from vdtpu.training.harness import Trainer
    from vdtpu.training.optim import get_optimizer
    from vdtpu.training.schedulers import ConstantScheduler
    model = _model(learn_logvar=True)
    params = model.init_params(jax.random.PRNGKey(0))
    x, ctx, t, noise = _data()
    g = jax.grad(lambda p: model.p_losses(p, x, t, ctx, "image", "text",
                                          noise)[0])(params)
    assert np.abs(np.asarray(g["logvar"])).max() > 0

    tx, set_lr = get_optimizer("adamw", params=params)
    trainer = Trainer(model, params, tx, set_lr,
                      scheduler=ConstantScheduler(lr=1e-2), log_every=10**9)
    before = np.asarray(params["logvar"]).copy()

    def batches():
        while True:
            yield {"x": np.asarray(x), "ctx": np.asarray(ctx)}
    state = trainer.run(batches(), num_iters=2)
    after = np.asarray(state.params["logvar"])
    assert np.abs(after - before).max() > 1e-5


def test_ctx_encode_trainable_path():
    """make_train_step(ctx_encode_fn=...) fine-tunes the context encoder
    jointly with the diffuser (ref ctx_encode_trainable, vd.py:307-311)."""
    from vdtpu.training.harness import make_train_step
    from vdtpu.training.optim import get_optimizer

    model = _model()
    dparams = model.init_params(jax.random.PRNGKey(0))
    rs = np.random.RandomState(1)
    cparams = {"embed": {"kernel": jnp.asarray(rs.randn(10, 16).astype(np.float32))}}

    def ctx_encode_fn(cp, raw_ids):  # raw int ids [B, M] -> [B, M, 16]
        return cp["embed"]["kernel"][raw_ids]

    params = {"diffuser": dparams, "ctx": cparams}
    tx, set_lr = get_optimizer("adamw", params=params)
    step = jax.jit(make_train_step(model, tx, "image", "text",
                                   ctx_encode_fn=ctx_encode_fn))
    opt_state = set_lr(tx.init(params), 1e-2)

    x = jnp.asarray(rs.randn(4, 8, 8, 4).astype(np.float32))
    ids = jnp.asarray(rs.randint(0, 10, (4, 7)))
    new_params, _, _, loss, _ = step(params, opt_state, None, x, ids,
                                     jax.random.PRNGKey(2),
                                     jnp.asarray(1e-2, jnp.float32))
    assert np.isfinite(float(loss))
    moved = np.abs(np.asarray(new_params["ctx"]["embed"]["kernel"])
                   - np.asarray(cparams["embed"]["kernel"])).max()
    assert moved > 1e-6, "context-encoder params did not train"
    dmoved = np.abs(np.asarray(
        new_params["diffuser"]["image"]["data_blocks.0.0"]["kernel"])
        - np.asarray(dparams["image"]["data_blocks.0.0"]["kernel"])).max()
    assert dmoved > 1e-6


def test_parameter_groups_combined_layout():
    from vdtpu.training.optim import parameter_group_of
    assert parameter_group_of(("ctx", "text", "proj", "kernel")) == "ctx_text"
    assert parameter_group_of(
        ("diffuser", "image", "time_embed", "0", "kernel")) == \
        "diffuser_image_global"
    assert parameter_group_of(("image", "data_blocks.0.0", "kernel")) == \
        "diffuser_image_data"
