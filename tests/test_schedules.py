import numpy as np
import pytest

from vdtpu.ops import schedules as S

torch = pytest.importorskip("torch")
from _reference import ref_module  # noqa: E402


@pytest.fixture(scope="module")
def ref_du():
    return ref_module("lib.model_zoo.diffusion_utils")


@pytest.mark.parametrize("kind", ["linear", "cosine", "sqrt_linear", "sqrt"])
def test_beta_schedule_matches_reference(ref_du, kind):
    ours = S.make_beta_schedule(kind, 1000, linear_start=0.00085, linear_end=0.012)
    theirs = ref_du.make_beta_schedule(kind, 1000, linear_start=0.00085, linear_end=0.012)
    np.testing.assert_allclose(ours, np.asarray(theirs), rtol=1e-12, atol=1e-12)


def test_ddim_timesteps_and_params(ref_du):
    ts = S.make_ddim_timesteps(50, 1000)
    ref_ts = ref_du.make_ddim_timesteps("uniform", 50, 1000, verbose=False)
    np.testing.assert_array_equal(ts, ref_ts)

    sched = S.DiffusionSchedule.create(1000, "linear", 0.00085, 0.012)
    sig, al, alp = S.make_ddim_sampling_parameters(sched.alphas_cumprod, ts, eta=0.0)
    rsig, ral, ralp = ref_du.make_ddim_sampling_parameters(
        torch.tensor(sched.alphas_cumprod), ref_ts, eta=0.0, verbose=False)
    np.testing.assert_allclose(al, ral.numpy(), rtol=1e-6)
    np.testing.assert_allclose(alp, np.asarray(ralp), rtol=1e-6)
    np.testing.assert_allclose(sig, np.asarray(rsig), rtol=1e-6, atol=1e-12)

    ts_quad = S.make_ddim_timesteps(50, 1000, method="quad")
    ref_quad = ref_du.make_ddim_timesteps("quad", 50, 1000, verbose=False)
    np.testing.assert_array_equal(ts_quad, ref_quad)


def test_schedule_buffers_match_reference_vd():
    """Full buffer-set comparison against the reference VD registration math."""
    sched = S.DiffusionSchedule.create(
        1000, "linear", linear_start=0.00085, linear_end=0.012)
    # Recompute reference-style in torch f32 from the f64 betas.
    betas = S.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    np.testing.assert_allclose(sched.alphas_cumprod, ac.astype(np.float32), rtol=1e-7)
    np.testing.assert_allclose(
        sched.sqrt_recipm1_alphas_cumprod, np.sqrt(1.0 / ac - 1).astype(np.float32), rtol=1e-6)
    assert sched.lvlb_weights[0] == sched.lvlb_weights[1]
    assert not np.isnan(sched.lvlb_weights).any()
    assert sched.posterior_variance.shape == (1000,)


def test_timestep_embedding_matches_reference(ref_du):
    import jax.numpy as jnp
    t = np.array([0, 1, 10, 999], dtype=np.int32)
    # f32 sin/cos of large args (t*freq up to ~1e3 rad) round differently across
    # backends; budget 3e-3 absolute on an O(1) embedding (SURVEY.md section 7).
    ours = np.asarray(S.timestep_embedding(jnp.asarray(t), 320))
    theirs = ref_du.timestep_embedding(torch.tensor(t), 320).numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-3)
    assert np.abs(ours - theirs).mean() < 1e-4
    # odd dim zero-pad path
    ours_odd = np.asarray(S.timestep_embedding(jnp.asarray(t), 321))
    theirs_odd = ref_du.timestep_embedding(torch.tensor(t), 321).numpy()
    np.testing.assert_allclose(ours_odd, theirs_odd, atol=3e-3)


def test_q_sample_roundtrip():
    import jax
    import jax.numpy as jnp
    sched = S.DiffusionSchedule.create(1000, "linear", 0.00085, 0.012)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0, 999])
    xt = sched.q_sample(x0, t, noise)
    # eps-parameterization inversion recovers x0 exactly
    x0_hat = sched.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)
