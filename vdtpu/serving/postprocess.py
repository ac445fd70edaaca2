"""Serving-side context/image post-processing helpers.

Capability parity with the reference app helpers:
- `adjust_rank` semantic/style PCA focus filtering (`/root/reference/app.py:48-127`)
- simple color adjust (`app.py:373-379`)
- `remove_duplicate_word` text cleanup (`app.py:129-201`)

TPU-first notes: the reference uses randomized `torch.pca_lowrank`; here the
decomposition is a deterministic thin SVD on the (tiny) 256x768 token matrix
— same subspace, reproducible, and jit-friendly. Divergence vs the
randomized reference is bounded by the rank-q truncation error (SURVEY.md
section 7 flags this as an accepted difference).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _decompose(x: jnp.ndarray, q: int):
    """Rank-q PCA of token matrix x [B, N, D] (ref app.py:48-55)."""
    x_mean = x.mean(-1, keepdims=True)
    xc = x - x_mean
    u, s, vt = jnp.linalg.svd(xc, full_matrices=False)
    u, s, vt = u[:, :, :q], s[:, :q], vt[:, :q, :]
    x_lowrank = jnp.einsum("bnq,bq,bqd->bnd", u, s, vt)
    return u, s, vt, x_mean, xc - x_lowrank


class AdjustRank:
    """Focus-level filter over CLIP vision tokens (ref app.py:57-127).

    lvl < 0.5 progressively drops the leading (semantic) principal ranks;
    lvl > 0.5 drops the trailing (style) ranks and the residual.
    """

    def __init__(self, max_drop_rank=(1, 5), q: int = 20):
        self.max_semantic_drop_rank = max_drop_rank[0]
        self.max_style_drop_rank = max_drop_rank[1]
        self.q = q

    def _sem_weights(self, lvl: float) -> np.ndarray:
        t0, y00 = np.exp((0 - 0.5) * 2), -self.max_semantic_drop_rank
        t1, y01 = np.exp((0.5 - 0.5) * 2), 1.0
        y0 = (np.exp((lvl - 0.5) * 2) - t0) / (t1 - t0) * (y01 - y00) + y00
        w = np.ones(self.q, np.float32)
        x1 = self.max_semantic_drop_rank + 1
        for xi in range(0, self.max_semantic_drop_rank + 1):
            yi = (xi - 0) / (x1 - 0) * (1.0 - y0) + y0
            w[xi] = max(yi, 0.0)
        return w

    def _sty_weights(self, lvl: float) -> np.ndarray:
        t0, y00 = np.exp((1 - 0.5) * 2), -(self.q - self.max_style_drop_rank)
        t1, y01 = np.exp((0.5 - 0.5) * 2), 1.0
        y0 = (np.exp((lvl - 0.5) * 2) - t0) / (t1 - t0) * (y01 - y00) + y00
        w = np.ones(self.q, np.float32)
        x0, x1 = self.q - 1, self.max_style_drop_rank - 1
        for xi in range(self.max_style_drop_rank, self.q):
            yi = (xi - x0) / (x1 - x0) * (1.0 - y0) + y0
            w[xi] = max(yi, 0.0)
        return w

    def __call__(self, x: jnp.ndarray, lvl: float) -> jnp.ndarray:
        if lvl == 0.5:
            return x
        x32 = x.astype(jnp.float32)
        std_save = x32.std(axis=(-2, -1))
        u, s, vt, x_mean, x_remain = _decompose(x32, self.q)
        # SVD yields min(N, D, q) ranks: token matrices shorter than q
        # (e.g. test miniatures) keep their full spectrum and the rank
        # weights truncate to match (full-size: s is exactly q long)
        if lvl < 0.5:
            assert lvl >= 0
            s = s * jnp.asarray(self._sem_weights(lvl)[:s.shape[-1]])
        else:
            assert lvl <= 1
            s = s * jnp.asarray(self._sty_weights(lvl)[:s.shape[-1]])
            x_remain = 0.0
        x_new = jnp.einsum("bnq,bq,bqd->bnd", u, s, vt) + x_mean + x_remain
        std_new = x_new.std(axis=(-2, -1))
        x_new = x_new / std_new[:, None, None] * std_save[:, None, None]
        return x_new.astype(x.dtype)


def color_adjust_simple(imout: jnp.ndarray, ref_image: jnp.ndarray) -> jnp.ndarray:
    """Match per-channel mean/std of outputs to the reference image
    (ref app.py:373-379). NHWC [0,1] arrays."""
    axes = (1, 2)
    ref_mean = ref_image.mean(axis=axes, keepdims=True)
    ref_std = ref_image.std(axis=axes, keepdims=True)
    out_mean = imout.mean(axis=axes, keepdims=True)
    out_std = imout.std(axis=axes, keepdims=True)
    out = (imout - out_mean) / out_std * ref_std + ref_mean
    return jnp.clip(out, 0.0, 1.0)


def remove_duplicate_word(tx: str) -> str:
    """Iteratively collapse repeated n-gram runs in sampled captions
    (behavioral parity with ref app.py:129-201, including the punctuation
    split markers)."""
    if tx == "":
        return tx

    def split_and_puncsplit(text: str) -> list[str]:
        out = []
        for word in text.split(" "):
            pre, post = [], []
            while word and word[0] in "([{":
                pre += [word[0], "<puncnext>"]
                word = word[1:]
            while word and word[-1] in "?!.,:;}])":
                post = ["<puncnext>", word[-1]] + post
                word = word[:-1]
            out += pre + ([word] if word else []) + post
        return out

    def remove_duplicates(items: list[str], length: int) -> list[str]:
        changed = True
        while changed:
            changed = False
            for i in range(len(items) - length):
                if items[i] == items[i + length]:
                    del items[i + 1:i + 1 + length]
                    changed = True
                    break
        return items

    items = split_and_puncsplit(tx)
    length = 1
    while len(items) > 1:
        items = remove_duplicates(items, length)
        if len(items) > 1:
            # expand each unit with its right neighbour's last word
            # (ref combine_words, app.py:130-135)
            items = [items[i] + " " + _last_word(items[i + 1], length)
                     for i in range(len(items) - 1)]
            length += 1
    out = items[0] if items else ""
    return out.replace(" <puncnext> ", "")


def _last_word(s: str, length: int) -> str:
    parts = s.split(" ")
    return parts[length - 1] if parts else s
