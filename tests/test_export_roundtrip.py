"""Export interop: our params -> torch state_dict -> loaded into the actual
reference modules -> forward parity. The strongest checkpoint-compat check:
checkpoints trained here must run in the PyTorch reference."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _reference import ref_module  # noqa: E402
from vdtpu.interop.torch_convert import flax_to_torch, vd_conv1x1_pred  # noqa: E402
from vdtpu.models.unet import UNet0DNext, UNet2DNext  # noqa: E402
from test_unet_parity import SMALL_0D, SMALL_2D, walk_reference  # noqa: E402


def test_export_loads_into_reference_unet2d():
    om = ref_module("lib.model_zoo.openaimodel")
    ours = UNet2DNext(**SMALL_2D)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4).astype(np.float32))
    t = jnp.array([42])
    ctx = jnp.asarray(np.random.RandomState(1).randn(1, 7, 16).astype(np.float32))
    params = ours.init(jax.random.PRNGKey(3), x, t, ctx)["params"]

    sd = flax_to_torch(params, prefix="diffuser.image.",
                       conv1x1_pred=vd_conv1x1_pred)
    sd = {k[len("diffuser.image."):]: torch.tensor(v) for k, v in sd.items()}

    tm = om.UNetModel2D_Next(**SMALL_2D).eval()
    missing, unexpected = tm.load_state_dict(sd, strict=True), None
    with torch.no_grad():
        ref = walk_reference(
            tm, torch.tensor(np.asarray(x).transpose(0, 3, 1, 2)),
            torch.tensor(np.asarray(t, np.int64)), torch.tensor(np.asarray(ctx)))
    out = np.asarray(ours.apply({"params": params}, x, t, ctx)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref.numpy(), atol=3e-4, rtol=1e-3)


def test_export_loads_into_reference_unet0d():
    om = ref_module("lib.model_zoo.openaimodel")
    ours = UNet0DNext(**SMALL_0D)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 24).astype(np.float32))
    t = jnp.array([7])
    ctx = jnp.asarray(np.random.RandomState(3).randn(1, 5, 16).astype(np.float32))
    params = ours.init(jax.random.PRNGKey(4), x, t, ctx)["params"]

    sd = flax_to_torch(params, prefix="diffuser.text.",
                       conv1x1_pred=vd_conv1x1_pred)
    sd = {k[len("diffuser.text."):]: torch.tensor(v) for k, v in sd.items()}

    tm = om.UNetModel0D_Next(**SMALL_0D).eval()
    tm.load_state_dict(sd, strict=True)
    with torch.no_grad():
        ref = walk_reference(tm, torch.tensor(np.asarray(x)),
                             torch.tensor(np.asarray(t, np.int64)),
                             torch.tensor(np.asarray(ctx)))
    out = np.asarray(ours.apply({"params": params}, x, t, ctx))
    np.testing.assert_allclose(out, ref.numpy(), atol=3e-4, rtol=1e-3)
