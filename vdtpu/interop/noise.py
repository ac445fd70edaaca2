"""Torch-noise capture for bit-comparability against the PyTorch reference.

The reference pins RNG per request with ``np.random.seed(seed);
torch.manual_seed(seed + 100)`` (app.py:308-309,348-349,399-400,480-481,
567-568) and then consumes the torch RNG stream in a fixed order inside
`DDIMSampler.ddim_sampling` (ddim.py:81-171):

  1. ``torch.randn(shape)`` for the initial x_T        (pure-noise mode), or
     ``torch.randn_like(x0)`` inside ``model.q_sample`` (img2img/x0 mode,
     vd.py:237-239 — drawn when ``p_sample_ddim`` is *not* given noise), and
  2. one ``noise_like(x) == torch.randn_like(x)`` per sampling step
     (ddim.py:168) — drawn even when sigma == 0 (eta=0), so it always
     advances the stream.

`capture(seed, ...)` replays exactly that stream on CPU torch and returns
the draws as numpy arrays; feeding them to
``DDIMSampler.sample(..., noise_table=..., x_info={'xt': ...})`` (or
``x_info={'x0': ..., 'noise': ...}``) makes the JAX sampler consume the
reference's noise verbatim, so any output difference is model numerics, not
randomness. This is the one-command bit-comparability hook called for by
VERDICT.md item 2; exercised end-to-end (vs the actual reference sampler
class) in tests/test_fullsize_parity.py.
"""
from __future__ import annotations

import numpy as np


def capture(seed: int, shape, steps: int, x0_forward_timesteps: int | None = None):
    """Replay the reference's per-request RNG stream.

    Args:
      seed: the request seed (the reference derives torch's seed as
        ``seed + 100``; we replicate that here).
      shape: full batch latent shape, e.g. (2, 4, 64, 64) for t2i — torch
        NCHW layout, exactly what the reference draws.
      steps: DDIM step count of the call.
      x0_forward_timesteps: when set, capture the img2img stream instead
        (q_sample noise first, then only the truncated step count).

    Returns a dict of numpy f32 arrays:
      'xt'          initial noise (pure-noise mode only)
      'q_noise'     q_sample noise (x0 mode only)
      'step_noise'  [S, *shape] per-step noise, S = steps or the truncation
    """
    import torch

    np.random.seed(seed)
    torch.manual_seed(seed + 100)
    out = {}
    if x0_forward_timesteps is None:
        out["xt"] = torch.randn(tuple(shape)).numpy()
        n = steps
    else:
        out["q_noise"] = torch.randn(tuple(shape)).numpy()
        n = int(x0_forward_timesteps)
    out["step_noise"] = np.stack(
        [torch.randn(tuple(shape)).numpy() for _ in range(n)])
    return out


def nchw_to_nhwc(a: np.ndarray) -> np.ndarray:
    """Torch draws latents NCHW; our image stream is NHWC."""
    return np.transpose(a, (0, 2, 3, 1)) if a.ndim == 4 else \
        np.transpose(a, (0, 1, 3, 4, 2)) if a.ndim == 5 else a
