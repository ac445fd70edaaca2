"""Tokenizers: WordPiece vs the reference implementation on its shipped
vocab, GPT-2 BPE round-trip, CLIP BPE conventions."""
import json
import os

import numpy as np
import pytest

from vdtpu.data.tokenizers import (
    BertWordPieceTokenizer, CLIPTokenizer, GPT2BPETokenizer, bytes_to_unicode)

REF_VOCAB = "/root/reference/lib/model_zoo/optimus_models/vocab"


@pytest.mark.skipif(not os.path.exists(f"{REF_VOCAB}/bert-base-cased-vocab.txt"),
                    reason="reference vocab not mounted")
def test_bert_wordpiece_vs_reference_tokenizer():
    from _reference import ref_module
    tb = ref_module("lib.model_zoo.optimus_models.tokenization_bert")
    ref = tb.BertTokenizer(f"{REF_VOCAB}/bert-base-cased-vocab.txt",
                           do_lower_case=False)
    ours = BertWordPieceTokenizer(f"{REF_VOCAB}/bert-base-cased-vocab.txt",
                                  do_lower_case=False)
    for text in ["a photo of a cat sitting on the mat",
                 "unbelievable, transformers tokenize sub-words!",
                 "the quick brown fox 123 jumped."]:
        text = text.lower()  # optimus encode lowercases (optimus.py:731)
        ref_tokens = ref.tokenize(text)
        assert ours.tokenize(text) == ref_tokens
        ref_ids = [ref._convert_token_to_id(t) for t in ref_tokens]
        ref_ids = ref.add_special_tokens_single_sentence(ref_ids)
        ids = ours([text], max_length=77)[0]
        np.testing.assert_array_equal(ids[: len(ref_ids)], ref_ids)


def test_gpt2_bpe_roundtrip(tmp_path):
    # synthetic byte-level vocab: every single byte-symbol + a few merges
    b2u = bytes_to_unicode()
    vocab = {c: i for i, c in enumerate(b2u.values())}
    he = b2u[ord("h")] + b2u[ord("e")]
    ll = b2u[ord("l")] + b2u[ord("l")]
    vocab[he] = len(vocab)
    vocab[ll] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n"
        f"{b2u[ord('h')]} {b2u[ord('e')]}\n"
        f"{b2u[ord('l')]} {b2u[ord('l')]}\n")
    tok = GPT2BPETokenizer(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))
    ids = tok.encode("hello hello")
    assert tok.decode(ids) == "hello hello"
    # merges actually applied: "he"+"ll"+"o" = 3 tokens for "hello"
    assert len(tok.encode("hello")) == 3
    assert tok.bos_id == 50258 and tok.eos_id == 50259 and tok.pad_id == 50257


def test_clip_tokenizer_conventions(tmp_path):
    b2u = bytes_to_unicode()
    vocab = {}
    for c in b2u.values():
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    ca = b2u[ord("c")] + b2u[ord("a")]
    vocab[ca] = len(vocab)
    vocab[ca + "t</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    merges = ["#version: 0.2",
              f"{b2u[ord('c')]} {b2u[ord('a')]}",
              f"{ca} t</w>"]
    (tmp_path / "merges.txt").write_text("\n".join(merges) + "\n")
    tok = CLIPTokenizer(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))
    ids = tok(["A Cat", "cat"], max_length=8)
    assert ids.shape == (2, 8)
    assert (ids[:, 0] == tok.bos).all()
    # lowercased => both rows tokenize "cat" identically after the article
    assert ids[0, 2] == ids[1, 1] == vocab[ca + "t</w>"]
    # padded with eos
    assert (ids[1, 2:] == tok.eos).all()
