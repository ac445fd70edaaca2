"""Device mesh + sharding rules (SPMD over ICI).

TPU-native replacement for the reference's distributed stack
(`torch.distributed` DDP + NCCL/Gloo rendezvous + shared-memory barriers,
`/root/reference/lib/utils.py:434-551`, `lib/sync.py:62-195`; rows P1-P3 of
SURVEY.md section 2.3): a `jax.sharding.Mesh` with named axes

  - ``dp``: data parallel — batch dimension sharded; gradient reduction is
    XLA's implicit psum over ICI (replaces DDP allreduce),
  - ``tp``: tensor parallel — large Dense/conv output features sharded
    (optional scale-out for serving; the reference has no TP at all, P4).

No hand-written rendezvous or shm side-channel survives: the single
controller + jit partitioner owns placement, and host-side sync is
`jax.experimental.multihost_utils` when running multi-process.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS, TP_AXIS = "dp", "tp"


def make_mesh(n_devices: int | None = None, tp: int = 1,
              devices=None) -> Mesh:
    """A (dp, tp) mesh over the first n_devices devices."""
    devices = list(devices if devices is not None else jax.devices())[: n_devices]
    n = len(devices)
    if n % tp:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over dp, everything else replicated."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: tuple[str, ...], leaf, tp_size: int) -> P:
    """Tensor-parallel layout for one param.

    Sharding the *output* features of the big projections (attention qkv/out,
    GEGLU mlp, FC blocks) puts each chip's matmul slab on its own MXU; the
    activations all-gather over ICI at block boundaries (XLA inserts these).
    Anything not cleanly divisible stays replicated.
    """
    if tp_size <= 1:
        return P()
    name = path[-1]
    if name == "kernel" and hasattr(leaf, "ndim"):
        if leaf.ndim == 2 and leaf.shape[1] % tp_size == 0 and leaf.shape[1] >= 128:
            return P(None, TP_AXIS)
        if leaf.ndim == 4 and leaf.shape[3] % tp_size == 0 and leaf.shape[3] >= 128:
            return P(None, None, None, TP_AXIS)
    if name in ("bias", "scale") and hasattr(leaf, "ndim") and leaf.ndim == 1 \
            and leaf.shape[0] % tp_size == 0 and leaf.shape[0] >= 128:
        # biases follow their kernel's output sharding
        return P(TP_AXIS)
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding pytree for a param tree (tp-aware, else replicated)."""
    tp_size = mesh.shape[TP_AXIS]
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        out[keys] = NamedSharding(mesh, _param_spec(keys, leaf, tp_size))
    from flax import traverse_util
    return traverse_util.unflatten_dict(out)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a param pytree on the mesh according to `param_shardings`."""
    sh = param_shardings(mesh, params)
    from flax import traverse_util
    flat_p = traverse_util.flatten_dict(params)
    flat_s = traverse_util.flatten_dict(sh)
    out = {k: jax.device_put(v, flat_s[k]) for k, v in flat_p.items()}
    return traverse_util.unflatten_dict(out)
