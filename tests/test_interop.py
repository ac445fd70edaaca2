"""Checkpoint converter: transforms, strict/missing behavior, round-trip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vdtpu.interop.torch_convert import flax_to_torch, torch_to_flax


def test_transform_rules():
    template = {
        "conv": {"kernel": jnp.zeros((3, 3, 2, 4)), "bias": jnp.zeros(4)},
        "dense": {"kernel": jnp.zeros((5, 6))},
        "one_by_one": {"kernel": jnp.zeros((7, 8))},
        "norm": {"scale": jnp.zeros(4), "bias": jnp.zeros(4)},
        "emb": {"embedding": jnp.zeros((10, 3))},
    }
    rs = np.random.RandomState(0)
    sd = {
        "conv.weight": rs.randn(4, 2, 3, 3).astype(np.float32),
        "conv.bias": rs.randn(4).astype(np.float32),
        "dense.weight": rs.randn(6, 5).astype(np.float32),
        "one_by_one.weight": rs.randn(8, 7, 1, 1).astype(np.float32),
        "norm.weight": rs.randn(4).astype(np.float32),
        "norm.bias": rs.randn(4).astype(np.float32),
        "emb.weight": rs.randn(10, 3).astype(np.float32),
    }
    out, missing = torch_to_flax(sd, template)
    assert not missing
    np.testing.assert_array_equal(out["conv"]["kernel"],
                                  sd["conv.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(out["dense"]["kernel"], sd["dense.weight"].T)
    np.testing.assert_array_equal(out["one_by_one"]["kernel"],
                                  sd["one_by_one.weight"][:, :, 0, 0].T)
    np.testing.assert_array_equal(out["emb"]["embedding"], sd["emb.weight"])
    np.testing.assert_array_equal(out["norm"]["scale"], sd["norm.weight"])


def test_strict_and_missing():
    template = {"a": {"kernel": jnp.zeros((2, 2))}}
    with pytest.raises(KeyError):
        torch_to_flax({}, template, strict=True)
    out, missing = torch_to_flax({}, template, strict=False)
    assert missing == ["a.kernel"]


def test_round_trip_export():
    """flax -> torch scheme -> flax reproduces the tree (non-1x1 layers)."""
    rs = np.random.RandomState(1)
    params = {
        "block": {"conv": {"kernel": jnp.asarray(rs.randn(3, 3, 4, 8).astype(np.float32))},
                  "lin": {"kernel": jnp.asarray(rs.randn(8, 16).astype(np.float32)),
                          "bias": jnp.asarray(rs.randn(16).astype(np.float32))}},
    }
    sd = flax_to_torch(params, prefix="m.")
    assert set(sd) == {"m.block.conv.weight", "m.block.lin.weight", "m.block.lin.bias"}
    assert sd["m.block.conv.weight"].shape == (8, 4, 3, 3)
    back, missing = torch_to_flax(sd, params, prefix="m.")
    assert not missing
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fp16_checkpoint_tensors():
    """Half-precision torch checkpoints convert (the published fp16 variant)."""
    torch = pytest.importorskip("torch")
    template = {"lin": {"kernel": jnp.zeros((3, 5))}}
    sd = {"lin.weight": torch.randn(5, 3, dtype=torch.float16)}
    out, _ = torch_to_flax(sd, template)
    assert out["lin"]["kernel"].dtype == np.float32
    np.testing.assert_allclose(out["lin"]["kernel"],
                               sd["lin.weight"].float().numpy().T)
