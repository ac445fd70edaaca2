"""Shared tiny-system test fixtures (deterministic, hash()-free)."""
import io
import json
import tarfile
import zlib

import numpy as np


def make_shard(path, n, offset=0):
    """Synthetic webdataset shard: n (jpg, txt) pairs."""
    from PIL import Image
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{offset + i:06d}"
            img = Image.fromarray(
                (np.random.RandomState(i).rand(40, 30, 3) * 255).astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{key}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cap = f"caption {offset + i}".encode()
            info = tarfile.TarInfo(f"{key}.txt")
            info.size = len(cap)
            tf.addfile(info, io.BytesIO(cap))


def write_tiny_clip_vocab(vocab_path, merges_path):
    """Minimal CLIP BPE vocab (chars + </w> forms + specials, all ids < 1000)
    so the launcher's build_tokenizer path runs against the tiny towers."""
    from vdtpu.data.tokenizers import bytes_to_unicode
    chars = list(bytes_to_unicode().values())
    vocab = {c: i for i, c in enumerate(chars)}
    vocab.update({c + "</w>": len(chars) + i for i, c in enumerate(chars)})
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(vocab_path, "w") as f:
        json.dump(vocab, f)
    with open(merges_path, "w") as f:
        f.write("#version: tiny\n")


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
