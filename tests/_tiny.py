"""Shared tiny-system test fixtures (deterministic, hash()-free)."""
import zlib

import numpy as np


def det_tokenizer(texts, max_length=16):
    """Deterministic stand-in CLIP tokenizer for the tiny towers: stable
    crc32 word ids (round 1 used Python hash(), which varies with
    PYTHONHASHSEED and poisoned the goldens)."""
    rows = []
    for t in texts:
        ids = [2 + (zlib.crc32(w.encode()) % 900)
               for w in t.split()][: max_length - 2]
        rows.append([1] + ids + [999] + [999] * (max_length - 2 - len(ids)))
    return np.array(rows, np.int32)


def make_tiny_vdi(n_sample_text=2):
    from vdtpu.serving.api import VDInference, VDSystem
    sys = VDSystem("vd_test_tiny").init_random(0, image_size=64)
    return VDInference(sys, text_tokenizer=det_tokenizer, output_dim=(64, 64),
                       ddim_steps=4, n_sample_image=2,
                       n_sample_text=n_sample_text, image_latent_dim=4,
                       text_latent_dim=96, latent_downsample=2)
