"""DPM-Solver++(2M) (vdtpu/sampling/dpmpp.py).

Validation strategy (no trained weights exist in this environment, so the
quality claim is proven mathematically instead of visually):

1. Structural: the solver grid shares the DDIM ladder and terminal point,
   so both samplers solve the same boundary-value problem.
2. Analytic convergence: for x0 ~ N(0, c^2 I) the exact epsilon and the
   exact probability-flow map are closed-form (the ODE is linear:
   x / sqrt(var(t)) is conserved). Against it, DDIM must converge at
   order ~1 and DPM-Solver++ strictly faster, with a several-fold
   accuracy win at equal step count — the entire serving claim.
3. End-to-end on the tiny VD model: 20 dpmpp2m steps land closer to the
   DDIM-200 reference trajectory than 20 DDIM steps do, through the real
   sampler API (cache keys, CFG wiring, VDInference).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vdtpu.ops.schedules import DiffusionSchedule
from vdtpu.sampling.ddim import DDIMSampler, DDIMTables, ddim_scan
from vdtpu.sampling.dpmpp import DPMppTables, dpmpp_scan


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule.create(1000, "linear", 0.00085, 0.012)


def test_tables_grid_matches_ddim(sched):
    S = 20
    d = DDIMTables.create(sched, S)
    p = DPMppTables.create(sched, S)
    np.testing.assert_array_equal(p.timesteps, d.timesteps)
    # same eval-point alphas (sqrt of ddim's abar) and same terminal point
    np.testing.assert_allclose(p.alphas, np.sqrt(d.alphas), rtol=1e-6)
    abar0 = float(np.asarray(sched.alphas_cumprod)[0])
    assert float(d.alphas_prev[-1]) == pytest.approx(abar0)
    # last sigma_ratio/alpha_phi are built from that same terminal abar
    sig_term = float(p.sigmas[-1]) * float(p.sigma_ratio[-1])
    assert sig_term == pytest.approx(np.sqrt(1 - abar0), rel=1e-5)
    # first step has no history; later weights 0.5*h_i/h_{i-1} are positive
    # and finite (the lambda grid is strongly non-uniform at low noise, so
    # values far from 0.5 are expected there)
    assert p.w2[0] == 0.0
    assert np.all(p.w2[1:] > 0.0) and np.isfinite(p.w2).all()
    # short ladders drop to first order on the final step (diffusers'
    # lower_order_final); long ones keep second order
    assert DPMppTables.create(sched, 10).w2[-1] == 0.0
    assert DPMppTables.create(sched, 20).w2[-1] > 0.0
    # img2img truncation: trailing k rows of the ladder, fresh history
    k = 7
    t = DPMppTables.create(sched, S, truncate=k)
    np.testing.assert_array_equal(t.timesteps, p.timesteps[S - k:])
    assert t.w2[0] == 0.0


def test_analytic_convergence_beats_ddim(sched):
    """Gaussian data: exact eps* and exact ODE solution are closed-form."""
    abar = np.asarray(sched.alphas_cumprod, np.float64)
    abar_j = jnp.asarray(abar, jnp.float32)
    c2 = 4.0  # x0 ~ N(0, 4 I)

    def eps_star(x, t_b, i):
        a = abar_j[t_b][:, None]
        return x * jnp.sqrt(1.0 - a) / (a * c2 + (1.0 - a))

    x_init = jax.random.normal(jax.random.PRNGKey(0), (4, 8), jnp.float32) * 3.0

    def exact(S):
        ts = DDIMTables.create(sched, S).timesteps  # descending
        v = lambda a: a * c2 + (1.0 - a)
        return np.asarray(x_init, np.float64) * np.sqrt(
            v(abar[0]) / v(abar[ts[0]]))

    errs = {}
    for S in (10, 20, 40):
        xd = ddim_scan(eps_star, x_init, jax.random.PRNGKey(1),
                       DDIMTables.create(sched, S))
        xp = dpmpp_scan(eps_star, x_init, DPMppTables.create(sched, S))
        ex = exact(S)
        errs[S] = (np.abs(np.asarray(xd, np.float64) - ex).max(),
                   np.abs(np.asarray(xp, np.float64) - ex).max())

    for S, (ed, ep) in errs.items():
        assert ep < 0.5 * ed, f"S={S}: dpmpp {ep} not well below ddim {ed}"
    # convergence order per step-doubling: ddim ~1, dpmpp clearly higher
    order = lambda e: np.log2(e[0] / e[1])
    ddim_o = [order((errs[10][0], errs[20][0])), order((errs[20][0], errs[40][0]))]
    dpm_o = [order((errs[10][1], errs[20][1])), order((errs[20][1], errs[40][1]))]
    assert all(0.6 < o < 1.3 for o in ddim_o), ddim_o
    assert all(o > 1.4 for o in dpm_o), dpm_o
    # the serving claim: 20 dpmpp steps are at least as accurate as 40 ddim
    assert errs[20][1] < errs[40][0]


@pytest.mark.slow
def test_tiny_model_dpmpp_closer_to_fine_ddim(sched):
    """On the tiny VD model with CFG: a fine 89-point DDIM ladder is the
    trajectory reference; a nested 12-point sub-ladder (shared endpoints,
    every 8th point — so all three runs solve the SAME boundary-value
    problem) must be closer to it under dpmpp2m than under DDIM.

    The model's params are random-filled (NOT flax init: diffusion UNets
    zero-init the output conv, which makes eps identically zero and every
    solver exact — the comparison would be vacuous)."""
    from vdtpu.config.bank import model_cfg_bank
    from vdtpu.models.vd import VDModel
    from vdtpu.sampling.ddim import cfg_eps_fn
    from vdtpu.sampling.dpmpp import DPMppTables, dpmpp_scan

    model = VDModel.from_config(model_cfg_bank()("vd_test_tiny"),
                                dtype=jnp.float32, use_checkpoint=False)
    shapes = jax.eval_shape(lambda k: model.init_params(k, jit=False),
                            jax.random.PRNGKey(0))
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    key = jax.random.PRNGKey(0)
    params = treedef.unflatten([
        jax.random.normal(jax.random.fold_in(key, i), l.shape, jnp.float32) * 0.02
        for i, l in enumerate(leaves)])

    # nested ascending ladders with shared endpoints
    ts_fine = np.unique(np.round(np.linspace(1, 913, 89)).astype(np.int64))
    ts_coarse = ts_fine[::8]
    assert ts_coarse[0] == ts_fine[0] and ts_coarse[-1] == ts_fine[-1]

    shape = (1, 32, 32, 4)
    xt = jax.random.normal(jax.random.PRNGKey(3), shape, jnp.float32)
    rs = np.random.RandomState(0)
    cond = jnp.asarray(rs.randn(1, 16, 96).astype(np.float32))
    uncond = jnp.asarray(rs.randn(1, 16, 96).astype(np.float32) * 0.1)
    eps = cfg_eps_fn(
        lambda xx, tt, cc: model.apply_model(params, xx, tt, cc, "image", "text"),
        cond, uncond, scale=3.0)

    def run_ddim(ts):
        tbl = DDIMTables.create(sched, len(ts), timesteps=ts)
        return np.asarray(jax.jit(lambda x: ddim_scan(
            eps, x, jax.random.PRNGKey(7), tbl))(xt), np.float64)

    def run_dpm(ts):
        tbl = DPMppTables.create(sched, len(ts), timesteps=ts)
        return np.asarray(jax.jit(lambda x: dpmpp_scan(eps, x, tbl))(xt),
                          np.float64)

    ref = run_ddim(ts_fine)
    e_ddim = np.abs(run_ddim(ts_coarse) - ref).mean()
    e_dpm = np.abs(run_dpm(ts_coarse) - ref).mean()
    assert np.isfinite(e_ddim) and np.isfinite(e_dpm)
    assert e_dpm < e_ddim, (e_dpm, e_ddim)


def test_method_validation(sched):
    class Toy:
        schedule = sched
        def apply_model(self, params, x, t, c, x_type, c_type):
            return 0.1 * x

    s = DDIMSampler(Toy())
    x_info = {"type": "image"}
    c_info = {"type": "text", "conditioning": jnp.zeros((1, 3, 8)),
              "unconditional_conditioning": None,
              "unconditional_guidance_scale": 1.0}
    with pytest.raises(ValueError, match="unknown sampling method"):
        s.sample(None, jax.random.PRNGKey(0), 4, (1, 4, 4, 3),
                 x_info, c_info, method="plms")
    with pytest.raises(ValueError, match="deterministic"):
        s.sample(None, jax.random.PRNGKey(0), 4, (1, 4, 4, 3),
                 x_info, c_info, eta=0.5, method="dpmpp2m")
    with pytest.raises(ValueError, match="deterministic"):
        s.sample(None, jax.random.PRNGKey(0), 4, (1, 4, 4, 3),
                 x_info, c_info, method="dpmpp2m", return_intermediates=True)
    # valid: runs and is finite + deterministic in the key
    a = s.sample(None, jax.random.PRNGKey(0), 4, (1, 4, 4, 3),
                 x_info, c_info, method="dpmpp2m")
    b = s.sample(None, jax.random.PRNGKey(0), 4, (1, 4, 4, 3),
                 x_info, c_info, method="dpmpp2m")
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_segmented_scan_bit_identical(sched):
    """slice_tables + the (x, m_prev) carry: a segmented run performs the
    same per-step ops in the same order as one whole scan (the invariant
    the cfg_interval composition relies on)."""
    from vdtpu.sampling.dpmpp import slice_tables

    tbl = DPMppTables.create(sched, 20)
    eps = lambda x, t_b, i: 0.1 * x + 0.01 * t_b[:, None].astype(x.dtype)
    x0 = jax.random.normal(jax.random.PRNGKey(4), (3, 8), jnp.float32)
    whole = np.asarray(dpmpp_scan(eps, x0, tbl))
    x, m = x0, None
    for a, b in ((0, 7), (7, 15), (15, 20)):
        x, m = dpmpp_scan(eps, x, slice_tables(tbl, a, b), m_prev=m,
                          return_carry=True)
    np.testing.assert_array_equal(np.asarray(x), whole)


@pytest.fixture(scope="module")
def tiny():
    """Tiny VD model with zero-init convs random-filled (see
    test_encreuse.py — a fresh-init UNet outputs identically zero)."""
    from vdtpu.config.bank import model_cfg_bank
    from vdtpu.models.vd import VDModel

    model = VDModel.from_config(model_cfg_bank()("vd_test_tiny"),
                                dtype=jnp.float32, use_checkpoint=False)
    params = model.init_params(jax.random.PRNGKey(0))
    leaves, treedef = jax.tree_util.tree_flatten(params)
    key = jax.random.PRNGKey(7)
    leaves = [
        jax.random.normal(jax.random.fold_in(key, i), l.shape, l.dtype) * 0.02
        if float(jnp.abs(l).max()) == 0.0 else l
        for i, l in enumerate(leaves)]
    return model, treedef.unflatten(leaves)


def _sample_tiny(model, params, **kw):
    cond = jax.random.normal(jax.random.PRNGKey(9), (2, 5, 96)) * 0.3
    sampler = DDIMSampler(model)
    return np.asarray(sampler.sample(
        params, jax.random.PRNGKey(7), steps=8, shape=(2, 8, 8, 4),
        x_info={"type": "image"},
        c_info={"type": "text", "conditioning": cond,
                "unconditional_conditioning": jnp.zeros_like(cond),
                "unconditional_guidance_scale": 4.0},
        method="dpmpp2m", **kw))


def test_dpmpp_cfg_interval_composition(tiny):
    """cfg_interval=(0,1) keeps one full-CFG segment -> bit-identical to
    the plain dpmpp2m path; a real band must diverge (cond-only segments
    actually ran at scale 1) yet stay on-trajectory."""
    model, params = tiny
    exact = _sample_tiny(model, params)
    full_band = _sample_tiny(model, params, cfg_interval=(0.0, 1.0))
    np.testing.assert_array_equal(full_band, exact)
    banded = _sample_tiny(model, params, cfg_interval=(0.25, 0.75))
    assert np.isfinite(banded).all()
    assert np.abs(banded - exact).max() > 1e-6
    cos = (banded * exact).sum() / (
        np.linalg.norm(banded) * np.linalg.norm(exact) + 1e-9)
    assert cos > 0.9, cos


def test_dpmpp_encreuse_composition(tiny):
    """interval=1 (every step a key step) reproduces the exact dpmpp2m
    sample through the stateful encoder-cache path; interval=2 skips
    encoder work yet stays on-trajectory."""
    model, params = tiny
    exact = _sample_tiny(model, params)
    every = _sample_tiny(model, params,
                         encoder_reuse={"interval": 1, "warmup": 0})
    np.testing.assert_allclose(every, exact, rtol=2e-5, atol=2e-5)
    approx = _sample_tiny(model, params,
                          encoder_reuse={"interval": 2, "warmup": 2})
    assert np.isfinite(approx).all()
    assert np.abs(approx - exact).max() > 1e-6
    cos = (approx * exact).sum() / (
        np.linalg.norm(approx) * np.linalg.norm(exact) + 1e-9)
    assert cos > 0.9, cos


def test_vdinference_dpmpp_flow():
    from _tiny import make_tiny_vdi
    vdi = make_tiny_vdi()
    vdi.sampler = "dpmpp2m"
    imgs = vdi.inference_t2i("a red cat", seed=1)
    arr = np.stack([np.asarray(i, np.float32) for i in imgs]) \
        if isinstance(imgs, list) else np.asarray(imgs, np.float32)
    assert np.isfinite(arr).all()
