"""Token merging (ToMe) for the long self-attention sites — opt-in
APPROXIMATE serving mode (off by default; the exact DDIM path is the
headline).

Implements the ToMe-for-Stable-Diffusion recipe (Bolya & Hoffman,
arXiv 2303.17604) as pure XLA ops with static shapes, so it runs inside the
jitted 50-step sampling scan with no custom-call boundaries (the mechanism
that killed all four Pallas-in-scan kernels, PERF.md "Tried and rejected"):

- tokens are partitioned into ``dst`` (one per 2x2 latent patch when the
  token count is a square spatial map, else every 4th token) and ``src``
  (the rest);
- each src token's nearest dst (cosine similarity on the block input) is
  found with one matmul + argmax;
- the ``r`` most-similar src tokens are merged (averaged) into their dst,
  the attention runs on the remaining ``N - r`` tokens, and merged tokens
  read their dst's output back on unmerge.

The merge is recomputed every UNet call from the live activations — all
decisions are data-dependent *values* (argmax / top-k / gather), never
data-dependent *shapes*: ``r`` is static, so XLA sees fixed [B, N-r, C]
attention operands and keeps the Pallas flash kernel eligible.

There is no reference counterpart (the reference samples exact DDIM only);
this extends the serving mode menu (encoder-reuse / cfg-interval / dpmpp)
with an orthogonal, composable lever. Like the quant policy
(vdtpu/ops/quant.py), the spec is read at TRACE time by
``BasicTransformerBlock`` and must therefore be part of every sampler jit
cache key (sampling/ddim.py::_jitted).

int8 interaction: the no-max flash kernel's calibrated logit bound stays a
valid upper bound under merging — merged tokens are convex combinations, and
``mean(q) . mean(k) <= max_ij q_i . k_j`` — so full-resolution calibration
scales/shifts serve the merged sites unchanged.
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ToMeSpec:
    """Hashable mode config (frozen: used in sampler jit cache keys).

    ratio: fraction of ALL tokens merged away at an eligible site (0.5 ->
      a 4096-token map attends over 2048). Clamped to the src-partition
      size (3/4 of tokens under the 2x2 layout).
    min_tokens: sites shorter than this are untouched (default: only the
      64x64 = 4096-token sites — ToMe-SD applies at the highest resolution
      only; smaller maps lose more quality per FLOP saved).
    """
    ratio: float = 0.5
    min_tokens: int = 4096

    def __post_init__(self):
        if not 0.0 <= self.ratio < 1.0:
            raise ValueError(f"tome ratio must be in [0, 1), got {self.ratio}")


_TOME: ToMeSpec | None = None


def set_tome(spec: ToMeSpec | float | None):
    """Set the process-wide token-merging policy (None = off, the default).

    Read at TRACE time by the transformer blocks — change it only before
    building a new jit (the sampler's cache key includes get_tome(), so a
    policy flip re-traces instead of silently reusing the old executable).
    A bare float is shorthand for ToMeSpec(ratio=float)."""
    global _TOME
    if isinstance(spec, (int, float)) and not isinstance(spec, bool):
        spec = ToMeSpec(ratio=float(spec))
    if spec is not None and not isinstance(spec, ToMeSpec):
        raise TypeError(f"expected ToMeSpec | float | None, got {spec!r}")
    if spec is not None and spec.ratio == 0.0:
        spec = None
    _TOME = spec


def get_tome() -> ToMeSpec | None:
    return _TOME


# ---- per-walk merge-assignment cache -------------------------------------
#
# ToMe-SD recomputes the merge at every block — a GPU habit, not a
# requirement: within one UNet call the token features at a resolution
# level change little between adjacent self-attention sites, while the
# assignment computation itself (f32 normalize + [B, Ns, Nd] score matmul +
# argsort + scatter index builds) costs a large share of the attention
# savings (VERDICT r3: +3.2% e2e for per-site recompute). With the cache,
# the FIRST eligible site of a walk computes the assignment and every later
# same-token-count site reuses it (amortizing ~5 sites at the 64x64 level
# into one). Trace-local by construction: UNetBase.walk/walk_encoder/
# walk_decoder bracket the walk with begin_walk/end_walk, so cached tracers
# never outlive the trace that made them; paths that don't bracket (legacy
# zoo) see None and fall back to per-site recompute.

_MERGE_CACHE: dict | None = None


def begin_walk():
    global _MERGE_CACHE
    if _TOME is not None:
        _MERGE_CACHE = {}


def end_walk():
    global _MERGE_CACHE
    _MERGE_CACHE = None


def cached_merge(x, spec: "ToMeSpec"):
    """build_merge with per-walk reuse: one assignment per (tokens, batch).
    Outside a bracketed walk this is exactly build_merge."""
    if _MERGE_CACHE is None:
        return build_merge(x, spec)
    key = (x.shape[0], x.shape[1], spec)
    ent = _MERGE_CACHE.get(key)
    if ent is None:
        ent = build_merge(x, spec)
        _MERGE_CACHE[key] = ent
    return ent


def _partition(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Static (dst_idx, src_idx) for an n-token site.

    Square spatial maps get the paper's 2D stride-2x2 dst layout (one dst
    per 2x2 latent patch — 1D strides leave rows of src with no nearby
    dst); anything else falls back to every-4th-token."""
    h = math.isqrt(n)
    if h * h == n and h % 2 == 0:
        grid = np.arange(n).reshape(h, h)
        dst = grid[0::2, 0::2].reshape(-1)
    else:
        dst = np.arange(0, n, 4)
    mask = np.ones(n, bool)
    mask[dst] = False
    return dst.astype(np.int32), np.nonzero(mask)[0].astype(np.int32)


def merge_count(n: int, ratio: float) -> int:
    """Static merged-token count r for an n-token site.

    Capped at the src partition size; for the long sites (n >= 2048, the
    ones whose reduced length can stay on the Pallas flash kernel) r is
    rounded down so n - r is a multiple of 256 (exact flash tile grid).
    Shorter sites run reduced attention on the XLA backend, which takes
    any length."""
    _, src_idx = _partition(n)
    r = min(int(n * ratio), len(src_idx))
    align = 256 if n >= 2048 else 1
    short = (-(n - r)) % align  # growth of n - r to the next multiple
    return max(r - short, 0)


def build_merge(x, spec: ToMeSpec):
    """Compute this call's merge from the block input x [B, N, C].

    Returns (merge, unmerge, n_reduced): closures applying the SAME
    token assignment to any [B, N, C'] tensor (the normed hidden states) /
    its [B, n_reduced, C'] attention output. merge averages each merged
    src into its dst; unmerge copies the dst's output back to every token
    it absorbed (gather by a precomputed index map — one take_along_axis).
    """
    b, n, _ = x.shape
    r = merge_count(n, spec.ratio)
    if r == 0:
        return (lambda h: h), (lambda a: a), n
    dst_idx, src_idx = _partition(n)
    ns, nd = len(src_idx), len(dst_idx)

    xm = x.astype(jnp.float32)
    xm = xm / (jnp.linalg.norm(xm, axis=-1, keepdims=True) + 1e-6)
    scores = jnp.einsum("bsc,bdc->bsd", xm[:, src_idx], xm[:, dst_idx])
    best_val = jnp.max(scores, axis=-1)                     # [B, Ns]
    best_dst = jnp.argmax(scores, axis=-1).astype(jnp.int32)

    order = jnp.argsort(-best_val, axis=-1).astype(jnp.int32)  # [B, Ns]
    merged_pos = order[:, :r]        # src ranks merged away
    kept_pos = order[:, r:]          # src ranks kept as-is
    bidx = jnp.arange(b)[:, None]
    dst_of = jnp.take_along_axis(best_dst, merged_pos, axis=1)  # [B, r]

    def merge(h):
        hsrc, hdst = h[:, src_idx], h[:, dst_idx]
        hm = jnp.take_along_axis(
            hsrc, merged_pos[..., None], axis=1).astype(jnp.float32)
        add = jnp.zeros(hdst.shape, jnp.float32).at[bidx, dst_of].add(hm)
        cnt = jnp.zeros((b, nd), jnp.float32).at[bidx, dst_of].add(1.0)
        hdst = ((hdst.astype(jnp.float32) + add)
                / (1.0 + cnt[..., None])).astype(h.dtype)
        kept = jnp.take_along_axis(hsrc, kept_pos[..., None], axis=1)
        return jnp.concatenate([kept, hdst], axis=1)  # [B, N - r, C]

    # index map: which reduced-sequence row each ORIGINAL token reads
    inv_src = jnp.zeros((b, ns), jnp.int32)
    inv_src = inv_src.at[bidx, kept_pos].set(
        jnp.arange(ns - r, dtype=jnp.int32)[None])
    inv_src = inv_src.at[bidx, merged_pos].set((ns - r) + dst_of)
    inv = jnp.zeros((b, n), jnp.int32)
    inv = inv.at[:, src_idx].set(inv_src)
    inv = inv.at[:, dst_idx].set(
        (ns - r) + jnp.arange(nd, dtype=jnp.int32)[None])

    def unmerge(a):
        return jnp.take_along_axis(a, inv[..., None], axis=1)

    return merge, unmerge, n - r
