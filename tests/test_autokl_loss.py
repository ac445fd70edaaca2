"""VAE adversarial loss: discriminator parity vs reference, d-loss math,
two-branch loss plumbing."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _reference import ref_module  # noqa: E402
from vdtpu.interop.torch_convert import torch_to_flax  # noqa: E402
from vdtpu.models.autokl_loss import (  # noqa: E402
    LPIPS, LPIPSWithDiscriminator, NLayerDiscriminator, adopt_weight,
    hinge_d_loss, vanilla_d_loss)


def test_discriminator_parity():
    au = ref_module("lib.model_zoo.autokl_utils")
    torch.manual_seed(0)
    tm = au.NLayerDiscriminator(input_nc=3, n_layers=3).train()
    ours = NLayerDiscriminator(input_nc=3, n_layers=3)
    x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = ours.init(jax.random.PRNGKey(0), x_j)
    params, _ = torch_to_flax(tm.state_dict(), variables["params"])

    # torch train-mode BatchNorm uses batch stats; mirror with train=True
    out, _ = ours.apply({"params": params, "batch_stats": variables["batch_stats"]},
                        x_j, train=True, mutable=["batch_stats"])
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=3e-4, rtol=1e-3)


def test_d_losses_match_reference():
    # closed-form oracles (the reference functions themselves hit a missing
    # `F` import when called standalone, autokl_utils.py:283)
    rs = np.random.RandomState(1)
    lr, lf = rs.randn(4, 1, 8, 8).astype(np.float32), rs.randn(4, 1, 8, 8).astype(np.float32)
    ref_hinge = 0.5 * (np.maximum(1 - lr, 0).mean() + np.maximum(1 + lf, 0).mean())
    np.testing.assert_allclose(
        float(hinge_d_loss(jnp.asarray(lr), jnp.asarray(lf))), ref_hinge, rtol=1e-6)
    sp = lambda x: np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)
    ref_vanilla = 0.5 * (sp(-lr).mean() + sp(lf).mean())
    np.testing.assert_allclose(
        float(vanilla_d_loss(jnp.asarray(lr), jnp.asarray(lf))), ref_vanilla, rtol=1e-5)
    assert float(adopt_weight(1.0, 5, threshold=10)) == 0.0
    assert float(adopt_weight(1.0, 15, threshold=10)) == 1.0


def test_lpips_structure_and_loss_branches():
    """LPIPS params follow torchvision/LPIPS names; both loss branches run."""
    from vdtpu.models.distributions import DiagonalGaussian
    loss = LPIPSWithDiscriminator(disc_start=0, kl_weight=1e-6,
                                  perceptual_weight=1.0)
    rng = jax.random.PRNGKey(0)
    lp = loss.init_params(rng, image_size=32)
    flat = list(jax.tree_util.tree_leaves(lp["lpips"]))
    assert len(flat) > 20  # vgg16 convs + 5 lin heads
    import flax.traverse_util as tu
    keys = {".".join(k) for k in tu.flatten_dict(lp["lpips"])}
    assert "net.features.0.kernel" in keys
    assert "lin0.model.1.kernel" in keys

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    rec = jnp.asarray(rs.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    post = DiagonalGaussian(jnp.asarray(rs.randn(2, 4, 4, 8).astype(np.float32)))

    g, glog = loss.generator_loss(lp, x, rec, post, global_step=10)
    assert np.isfinite(float(g))
    assert set(glog) >= {"Loss", "loss_kl", "loss_nll", "loss_rec", "loss_g"}

    d, dlog, _ = loss.discriminator_loss(lp, x, rec, global_step=10)
    assert np.isfinite(float(d))
    assert "logits_real" in dlog
