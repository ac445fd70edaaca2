"""Golden-tensor parity for the KL-f8 VAE vs the torch reference (random weights)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _reference import ref_module  # noqa: E402
from vdtpu.interop.torch_convert import torch_to_flax  # noqa: E402
from vdtpu.models.autoencoder import AutoencoderKL  # noqa: E402

# ch must be a multiple of 32 (GroupNorm(32, ch) in both implementations)
DD = dict(double_z=True, z_channels=3, resolution=32, in_channels=3, out_ch=3,
          ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[16], dropout=0.0)


@pytest.fixture(scope="module")
def pair():
    ak = ref_module("lib.model_zoo.autokl")
    torch.manual_seed(0)
    tm = ak.AutoencoderKL(ddconfig=DD, lossconfig=None, embed_dim=3).eval()
    ours = AutoencoderKL(ddconfig=DD, embed_dim=3)
    x = np.random.RandomState(0).rand(2, 3, 32, 32).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    params, _ = torch_to_flax(tm.state_dict(), params["params"])
    return tm, ours, params, x


def test_encode_posterior_parity(pair):
    tm, ours, params, x = pair
    with torch.no_grad():
        post_t = tm.encode(torch.tensor(x), out_posterior=True)
    mean_t = post_t.mean.numpy().transpose(0, 2, 3, 1)
    std_t = post_t.std.numpy().transpose(0, 2, 3, 1)

    post_j = ours.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                        method=AutoencoderKL.posterior)
    np.testing.assert_allclose(np.asarray(post_j.mean), mean_t, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(post_j.std), std_t, atol=2e-4, rtol=1e-3)


def test_decode_parity(pair):
    tm, ours, params, _ = pair
    z = np.random.RandomState(5).randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        dec_t = tm.decode(torch.tensor(z)).numpy().transpose(0, 2, 3, 1)
    dec_j = ours.apply({"params": params}, jnp.asarray(z.transpose(0, 2, 3, 1)),
                       method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(dec_j), dec_t, atol=2e-4, rtol=1e-3)


def test_diagonal_gaussian_math():
    from vdtpu.models.distributions import DiagonalGaussian
    dist = ref_module("lib.model_zoo.distributions")
    m = np.random.RandomState(0).randn(2, 4, 4, 6).astype(np.float32)
    ours = DiagonalGaussian(jnp.asarray(m))
    theirs = dist.DiagonalGaussianDistribution(torch.tensor(m.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours.kl()), theirs.kl().numpy(), rtol=1e-4)
    samp = np.random.RandomState(1).randn(2, 4, 4, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ours.nll(jnp.asarray(samp))),
        theirs.nll(torch.tensor(samp.transpose(0, 3, 1, 2))).numpy(), rtol=1e-4)
