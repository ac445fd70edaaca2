"""Evaluators for the eval stage.

The reference's eval contract (`/root/reference/lib/utils.py:371-407`)
iterates an evalloader, feeds per-batch outputs to an ``evaluator`` object
and asks it for a summary — but the evaluator module itself was never
published (`lib/evaluator` absent, SURVEY.md section 1). These are the
designed-fresh implementations behind the same add-batch/summarize contract:

- `ClipSimilarityEvaluator` — mean CLIP cosine between generated images and
  their prompts (the paper's CLIP-sim metric), computed with our own CLIP
  towers.
- `FIDEvaluator` — Frechet distance over pooled features. NOTE: the
  canonical FID uses InceptionV3-pool3 features; offline environments can
  plug any feature_fn (default: CLIP vision CLS features, i.e. "CLIP-FID",
  which correlates strongly with Inception-FID and needs no extra weights).
"""
from __future__ import annotations

from typing import Callable

import numpy as np

_REG: dict[str, type] = {}


def register_evaluator(name):
    def deco(cls):
        _REG[name] = cls
        return cls
    return deco


def get_evaluator(name: str, **kw):
    return _REG[name](**kw)


@register_evaluator("clip_similarity")
class ClipSimilarityEvaluator:
    """Mean cosine(image CLS embedding, text pooled embedding)."""

    def __init__(self, image_embed_fn: Callable, text_embed_fn: Callable):
        self.image_embed_fn = image_embed_fn
        self.text_embed_fn = text_embed_fn
        self.sims: list[np.ndarray] = []
        self.sample_n = None

    def set_sample_n(self, n):
        self.sample_n = n

    def add_batch(self, images, texts):
        zi = np.asarray(self.image_embed_fn(images))   # [B, D] CLS embedding
        zt = np.asarray(self.text_embed_fn(texts))     # [B, D] pooled embedding
        zi = zi / np.linalg.norm(zi, axis=-1, keepdims=True)
        zt = zt / np.linalg.norm(zt, axis=-1, keepdims=True)
        self.sims.append((zi * zt).sum(-1))

    def summarize(self) -> dict[str, float]:
        sims = np.concatenate(self.sims) if self.sims else np.zeros(1)
        return {"clip_similarity": float(sims.mean())}

    def clear(self):
        self.sims.clear()


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 (S1 S2)^1/2) via scipy sqrtm."""
    from scipy import linalg
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


@register_evaluator("fid")
class FIDEvaluator:
    """Frechet distance between generated and reference feature sets."""

    def __init__(self, feature_fn: Callable):
        self.feature_fn = feature_fn
        self.real: list[np.ndarray] = []
        self.fake: list[np.ndarray] = []

    def add_batch(self, fake_images, real_images=None):
        self.fake.append(np.asarray(self.feature_fn(fake_images)))
        if real_images is not None:
            self.real.append(np.asarray(self.feature_fn(real_images)))

    def add_reference(self, real_images):
        self.real.append(np.asarray(self.feature_fn(real_images)))

    def summarize(self) -> dict[str, float]:
        fake = np.concatenate(self.fake)
        real = np.concatenate(self.real)
        stats = lambda x: (x.mean(0), np.cov(x, rowvar=False))
        mu1, s1 = stats(real)
        mu2, s2 = stats(fake)
        return {"fid": frechet_distance(mu1, s1, mu2, s2)}

    def clear(self):
        self.real.clear()
        self.fake.clear()


class EvalStage:
    """Iterate an eval loader, run the sample fn, feed the evaluator
    (contract of ref eval_stage, utils.py:361-407)."""

    def __init__(self, evaluator, sample_fn: Callable, log_every: int = 10):
        self.evaluator = evaluator
        self.sample_fn = sample_fn
        self.log_every = log_every

    def __call__(self, loader) -> dict[str, float]:
        from vdtpu.utils.logging import print_log
        for i, batch in enumerate(loader):
            out = self.sample_fn(batch)
            self.evaluator.add_batch(*out)
            if (i + 1) % self.log_every == 0:
                print_log(f"eval processed {i + 1} batches")
        summary = self.evaluator.summarize()
        print_log("eval summary: " + " ".join(
            f"{k}={v:.4f}" for k, v in summary.items()))
        self.evaluator.clear()
        return summary
