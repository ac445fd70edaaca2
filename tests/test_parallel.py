"""Sharding: mesh construction, param shardings, batch-parallel sampling
equivalence, tp-sharded apply on the 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vdtpu.parallel.mesh import (
    batch_sharding, make_mesh, param_shardings, shard_params)

TINY_CFG = {"args": {
    "diffuser_cfg_list": [
        ["image", {"type": "openai_unet_2d_next", "args": dict(
            in_channels=4, model_channels=32, out_channels=4,
            num_res_blocks=[1, 1], attention_resolutions=[1, 2],
            channel_mult=[1, 2], num_heads=4, context_dim=128)}],
        ["text", {"type": "openai_unet_0d_next", "args": dict(
            input_channels=24, model_channels=32, output_channels=24,
            num_noattn_blocks=[1, 1], channel_mult=[1, 2], second_dim=[4, 4],
            with_attn=[True, True], num_heads=4, context_dim=128)}],
    ],
    "global_layer_ptr": "image", "timesteps": 100,
    "beta_linear_start": 0.00085, "beta_linear_end": 0.012,
}}


@pytest.fixture(scope="module")
def model_and_params():
    from vdtpu.models.vd import VDModel
    model = VDModel.from_config(TINY_CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_mesh_shapes():
    mesh = make_mesh(8, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh = make_mesh(8, tp=1)
    assert mesh.shape == {"dp": 8, "tp": 1}
    with pytest.raises(ValueError):
        make_mesh(8, tp=3)


def test_param_shardings_tp(model_and_params):
    _, params = model_and_params
    mesh = make_mesh(8, tp=2)
    sh = param_shardings(mesh, params)
    from flax import traverse_util
    flat_p = traverse_util.flatten_dict(params)
    flat_s = traverse_util.flatten_dict(sh)
    n_sharded = 0
    for k, leaf in flat_p.items():
        spec = flat_s[k].spec
        if any(s is not None for s in spec):
            n_sharded += 1
            # sharded dims must divide evenly
            for dim, ax in enumerate(spec):
                if ax is not None:
                    assert leaf.shape[dim] % 2 == 0
    assert n_sharded > 0  # context-dim 128 projections shard over tp


def test_batch_parallel_flow_matches_single_device(model_and_params):
    model, params = model_and_params
    mesh = make_mesh(8, tp=1)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 8, 8, 4).astype(np.float32))
    t = jnp.arange(8, dtype=jnp.int32) * 10
    ctx = jnp.asarray(np.random.RandomState(1).randn(8, 5, 128).astype(np.float32))

    ref = model.apply_model(params, x, t, ctx, "image", "text")

    with mesh:
        bs = batch_sharding(mesh)
        params_m = shard_params(mesh, params)
        out = model.apply_model(
            params_m, jax.device_put(x, bs), jax.device_put(t, bs),
            jax.device_put(ctx, bs), "image", "text")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_tp_sharded_apply_matches(model_and_params):
    model, params = model_and_params
    mesh = make_mesh(8, tp=2)
    x = jnp.asarray(np.random.RandomState(2).randn(4, 8, 8, 4).astype(np.float32))
    t = jnp.zeros(4, jnp.int32)
    ctx = jnp.asarray(np.random.RandomState(3).randn(4, 5, 128).astype(np.float32))
    ref = model.apply_model(params, x, t, ctx, "image", "text")
    with mesh:
        params_m = shard_params(mesh, params)
        bs = batch_sharding(mesh)
        out = model.apply_model(params_m, jax.device_put(x, bs), t,
                                jax.device_put(ctx, bs), "image", "text")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_sharded_sampler_equivalence():
    """Batch-parallel DDIM sampling == single-device sampling (eta=0)."""
    from vdtpu.models.vd import VDModel
    from vdtpu.sampling.ddim import DDIMSampler
    model = VDModel.from_config(TINY_CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    sampler = DDIMSampler(model)
    cond = jnp.asarray(np.random.RandomState(0).randn(8, 5, 128).astype(np.float32))
    uncond = jnp.zeros_like(cond)
    c_info = {"type": "text", "conditioning": cond,
              "unconditional_conditioning": uncond,
              "unconditional_guidance_scale": 3.0}
    key = jax.random.PRNGKey(7)
    ref = sampler.sample(params, key, 3, (8, 8, 8, 4), {"type": "image"}, c_info)

    mesh = make_mesh(8, tp=1)
    with mesh:
        bs = batch_sharding(mesh)
        params_m = shard_params(mesh, params)
        ci = dict(c_info)
        ci["conditioning"] = jax.device_put(cond, bs)
        ci["unconditional_conditioning"] = jax.device_put(uncond, bs)
        out = sampler.sample(params_m, key, 3, (8, 8, 8, 4),
                             {"type": "image"}, ci)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_vdinference_mesh_matches_single_device():
    """The PRODUCTION serving class under a dp mesh (`VDInference(mesh=...)`)
    returns the same images as single-device serving: params dp-replicated,
    conditioning batch-sharded by _shard_batch, the whole 4-step CFG scan
    partitioned by SPMD (PERF.md scale-out row)."""
    from _tiny import det_tokenizer
    from vdtpu.serving.api import VDInference, VDSystem

    sysm = VDSystem("vd_test_tiny").init_random(0, image_size=64)
    kw = dict(text_tokenizer=det_tokenizer, output_dim=(64, 64),
              ddim_steps=4, n_sample_image=2, image_latent_dim=4,
              text_latent_dim=96, latent_downsample=2)
    ref = VDInference(sysm, **kw).inference_t2i("a red cat", seed=0)

    mesh = make_mesh(2, tp=1)
    sysm.params["diffuser"] = shard_params(mesh, sysm.params["diffuser"])
    vdi_m = VDInference(sysm, mesh=mesh, **kw)
    # _shard_batch really places conditioning over the dp axis
    sharded = vdi_m._shard_batch({"conditioning": jnp.zeros((2, 5, 128)),
                                  "unconditional_conditioning": None})
    assert len(sharded["conditioning"].sharding.device_set) == 2
    out = vdi_m.inference_t2i("a red cat", seed=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_batching_queue_on_mesh_matches_single_device():
    """BatchingQueue x mesh: the production queue dispatches its padded
    CFG buckets through VDInference(mesh=...) unchanged (per-request x_T
    rows ride the dp-sharded batch), and a request's image matches the
    single-device queue to 1e-3 (sharded reduction-order tolerance)."""
    from _tiny import det_tokenizer
    from vdtpu.serving.api import VDInference, VDSystem
    from vdtpu.serving.queue import BatchingQueue

    sysm = VDSystem("vd_test_tiny").init_random(0, image_size=64)
    kw = dict(text_tokenizer=det_tokenizer, output_dim=(64, 64),
              ddim_steps=4, n_sample_image=2, image_latent_dim=4,
              text_latent_dim=96, latent_downsample=2)
    with BatchingQueue(VDInference(sysm, **kw), buckets=(2,),
                       max_wait_ms=250.0) as q:
        f1, f2 = q.submit("a red cat", 0), q.submit("a blue dog", 1)
        ref = f1.result(timeout=600), f2.result(timeout=600)

    mesh = make_mesh(2, tp=1)
    sysm.params["diffuser"] = shard_params(mesh, sysm.params["diffuser"])
    with BatchingQueue(VDInference(sysm, mesh=mesh, **kw), buckets=(2,),
                       max_wait_ms=250.0) as q:
        f1, f2 = q.submit("a red cat", 0), q.submit("a blue dog", 1)
        out = f1.result(timeout=600), f2.result(timeout=600)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]), atol=1e-3)
