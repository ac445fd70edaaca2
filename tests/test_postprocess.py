"""Serving post-processing: caption dedup parity vs reference, PCA focus
filter properties, color adjust."""
import ast

import numpy as np
import pytest

import jax.numpy as jnp

from vdtpu.serving.postprocess import (
    AdjustRank, color_adjust_simple, remove_duplicate_word)


def _reference_remove_duplicate_word():
    """Extract the reference implementation as a test oracle (app.py can't be
    imported wholesale — it pulls gradio at module scope)."""
    src = open("/root/reference/app.py").read()
    tree = ast.parse(src)
    fn = next(n for n in tree.body if isinstance(n, ast.FunctionDef)
              and n.name == "remove_duplicate_word")
    ns = {}
    exec(compile(ast.Module([fn], []), "<ref>", "exec"), ns)
    return ns["remove_duplicate_word"]


@pytest.mark.parametrize("text", [
    "",
    "a cat",
    "a cat a cat",
    "a cat sat a cat sat on the mat",
    "the dog the dog the dog barks",
    "hello, world! hello, world!",
    "one two three two three four",
    "(bracketed) text (bracketed) text",
    "repeat repeat repeat repeat repeat",
])
def test_remove_duplicate_word_parity(text):
    ref = _reference_remove_duplicate_word()
    assert remove_duplicate_word(text) == ref(text)


def test_adjust_rank_identity_and_std():
    ar = AdjustRank(max_drop_rank=(1, 5), q=20)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 256, 64).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(ar(x, 0.5)), np.asarray(x))
    for lvl in (0.0, 0.25, 0.75, 1.0):
        y = ar(x, lvl)
        assert y.shape == x.shape
        # per-sample std is preserved by construction (app.py:121-122)
        np.testing.assert_allclose(
            np.asarray(y).std(axis=(-2, -1)), np.asarray(x).std(axis=(-2, -1)),
            rtol=1e-4)


def test_adjust_rank_semantic_drop_removes_leading_rank():
    ar = AdjustRank(max_drop_rank=(1, 5), q=20)
    rs = np.random.RandomState(1)
    # one dominant rank-1 direction + noise
    u = rs.randn(256, 1)
    v = rs.randn(1, 64)
    x = jnp.asarray((50 * u @ v + rs.randn(256, 64)).astype(np.float32)[None])
    y = np.asarray(ar(x, 0.0))[0]
    xc = np.asarray(x)[0] - np.asarray(x)[0].mean(-1, keepdims=True)
    yc = y - y.mean(-1, keepdims=True)
    s_x = np.linalg.svd(xc, compute_uv=False)
    s_y = np.linalg.svd(yc, compute_uv=False)
    # the dominant singular value's share collapses
    assert s_y[0] / s_y.sum() < 0.8 * (s_x[0] / s_x.sum())


def test_color_adjust_matches_reference_stats():
    rs = np.random.RandomState(2)
    ref = jnp.asarray(rs.rand(1, 16, 16, 3).astype(np.float32))
    out = jnp.asarray(rs.rand(2, 16, 16, 3).astype(np.float32) * 0.5)
    adj = np.asarray(color_adjust_simple(out, ref))
    assert adj.min() >= 0.0 and adj.max() <= 1.0
    # channel means move toward the reference's
    ref_mean = np.asarray(ref).mean(axis=(1, 2))
    np.testing.assert_allclose(adj.mean(axis=(1, 2)),
                               np.broadcast_to(ref_mean, (2, 3)), atol=0.05)
