"""Headless CLI smoke (vdtpu.serving.cli): the argparse surface drives the
tiny system end-to-end — t2i saves PNGs, i2t prints decoded text — through
the real tokenizer-from-files path (no reference counterpart: the
reference ships only the WebUI)."""
import os

import numpy as np
import pytest

from _tiny import write_tiny_clip_vocab


@pytest.mark.timeout(900)
def test_cli_t2i_and_i2t(tmp_path, capsys):
    from PIL import Image

    from vdtpu.serving.cli import main
    vocab, merges = tmp_path / "vocab.json", tmp_path / "merges.txt"
    write_tiny_clip_vocab(str(vocab), str(merges))
    common = ["--config", "vd_test_tiny", "--size", "64",
              "--latent-downsample", "2", "--text-latent-dim", "96",
              "--steps", "2", "--clip-vocab", str(vocab),
              "--clip-merges", str(merges), "--clip-max-length", "16",
              "--out", str(tmp_path / "out")]
    main(["t2i", "--text", "a village in the snow", "--seed", "3"] + common)
    pngs = sorted((tmp_path / "out").glob("t2i_*.png"))
    assert len(pngs) == 2
    arr = np.asarray(Image.open(pngs[0]))
    assert arr.shape == (64, 64, 3)

    img = tmp_path / "in.png"
    Image.fromarray((np.random.RandomState(0).rand(64, 64, 3) * 255)
                    .astype(np.uint8)).save(img)
    main(["i2t", "--image", str(img), "--seed", "3", "--n-texts", "2"] + common)
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()) >= 2
