"""PyTorch state_dict <-> Flax params conversion.

Every Flax submodule in this framework is named with its exact torch
state-dict path component (dots included), so mapping is mechanical:

  flax path join(".")  + leaf rename (kernel/scale/embedding -> weight)
  == torch key, with the tensor transform inferred from both ndims:

  - conv kernels:   torch [O, I, kh, kw] -> flax [kh, kw, I, O]
  - dense kernels:  torch [O, I]         -> flax [I, O]
  - 1x1-conv-as-dense: torch [O, I, 1, 1] -> flax [I, O]
  - embeddings:     torch [V, D]         -> flax [V, D] (no transpose)
  - norm scale/bias and 1-D tensors: unchanged

Covers the published checkpoint tree (`vd-four-flow-v1-0.pth`, `kl-f8.pth`,
`optimus-vae.pth`; key scheme at SURVEY.md section 3.5 /
`/root/reference/lib/model_zoo/common/get_model.py:64-83`).
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np
from flax import traverse_util


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        if t.dtype is not None and "bfloat16" in str(t.dtype):
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def _leaf_to_torch_key(path: tuple[str, ...]) -> str:
    *parents, leaf = path
    leaf = {"kernel": "weight", "scale": "weight", "embedding": "weight"}.get(leaf, leaf)
    return ".".join([*parents, leaf])


def _transform(torch_val: np.ndarray, flax_leaf_name: str, flax_shape: tuple[int, ...]) -> np.ndarray:
    tv = torch_val
    if flax_leaf_name == "embedding":
        out = tv
    elif flax_leaf_name == "kernel":
        if tv.ndim == 4 and len(flax_shape) == 4:
            out = tv.transpose(2, 3, 1, 0)
        elif tv.ndim == 4 and len(flax_shape) == 2:  # 1x1 conv -> dense
            out = tv[:, :, 0, 0].T
        elif tv.ndim == 3 and len(flax_shape) == 3:  # conv1d [O,I,k] -> [k,I,O]
            out = tv.transpose(2, 1, 0)
        elif tv.ndim == 3 and len(flax_shape) == 2:  # 1-wide conv1d -> dense
            if tv.shape[2] != 1:                     # (legacy AttentionBlock qkv)
                raise ValueError(
                    f"conv1d kernel width {tv.shape[2]} != 1 cannot map to a "
                    f"Dense kernel {flax_shape}")
            out = tv[:, :, 0].T
        elif tv.ndim == 2 and len(flax_shape) == 2:
            out = tv.T
        else:
            raise ValueError(f"kernel rank mismatch torch{tv.shape} flax{flax_shape}")
    else:
        out = tv
    if tuple(out.shape) != tuple(flax_shape):
        raise ValueError(f"shape mismatch after transform: {out.shape} vs {flax_shape}")
    return out


def torch_to_flax(
    state_dict: Mapping[str, Any],
    params_template,
    prefix: str = "",
    strict: bool = True,
    rename: Mapping[str, str] | None = None,
) -> tuple[Any, list[str]]:
    """Fill a Flax params pytree from a torch state_dict.

    Args:
      state_dict: torch name -> tensor/ndarray.
      params_template: Flax params pytree (from module.init) providing
        structure and shapes.
      prefix: prepended to every derived torch key (e.g. "diffuser.image.").
      strict: raise if a template leaf has no matching torch key.
      rename: optional exact-match torch-key rewrites applied after joining.
    Returns: (filled params, list of unmatched flax paths when strict=False).
    """
    flat = traverse_util.flatten_dict(params_template)
    out: dict[tuple[str, ...], np.ndarray] = {}
    missing: list[str] = []
    for path, tmpl in flat.items():
        tkey = prefix + _leaf_to_torch_key(path)
        if rename and tkey in rename:
            tkey = rename[tkey]
        if tkey not in state_dict:
            if strict:
                raise KeyError(f"torch key {tkey!r} not found for flax path {path}")
            missing.append(".".join(path))
            out[path] = tmpl
            continue
        val = _to_numpy(state_dict[tkey])
        out[path] = _transform(val, path[-1], tmpl.shape).astype(np.float32)
    return traverse_util.unflatten_dict(out), missing


def flax_to_torch(params, prefix: str = "",
                  conv1x1_pred=None) -> dict[str, np.ndarray]:
    """Inverse mapping (for exporting checkpoints back to the torch scheme).

    conv1x1_pred(torch_key) -> True marks Dense kernels that the torch model
    stores as [O, I, 1, 1] 1x1 convs (SpatialTransformer proj_in/out, the
    0-D FC blocks); their 2-D kernels get the trailing spatial dims back.
    """
    flat = traverse_util.flatten_dict(params)
    sd: dict[str, np.ndarray] = {}
    for path, val in flat.items():
        tkey = prefix + _leaf_to_torch_key(path)
        v = np.asarray(val)
        leaf = path[-1]
        if leaf == "kernel":
            if v.ndim == 4:
                v = v.transpose(3, 2, 0, 1)
            elif v.ndim == 3:
                v = v.transpose(2, 1, 0)
            elif v.ndim == 2:
                v = v.T
                if conv1x1_pred is not None and conv1x1_pred(tkey):
                    v = v[:, :, None, None]
        sd[tkey] = v
    return sd


def vd_conv1x1_pred(torch_key: str) -> bool:
    """The VD layers whose torch form is a 1x1 Conv2d but whose flax form is
    Dense: SpatialTransformer proj_in/proj_out (attention.py:237-253) and the
    0-D diffuser's FC-block convs (openaimodel.py:2100-2118)."""
    k = torch_key
    if k.endswith((".proj_in.weight", ".proj_out.weight")) and "context_blocks" in k:
        return True
    if "diffuser.text." in k and "data_blocks" in k and k.endswith(
            ("in_layers.2.weight", "out_layers.3.weight", "skip_connection.weight")):
        return True
    return False
