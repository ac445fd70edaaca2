"""Tokenizers for the three text front-ends.

Capability parity with the reference's vendored tokenizers
(`/root/reference/lib/model_zoo/optimus_models/tokenization_bert.py`,
`tokenization_gpt2.py`) and the HF CLIP tokenizer the reference downloads at
runtime. Implemented from the published algorithms (WordPiece; byte-level
BPE; CLIP's lowercased BPE with </w> markers) — vocab/merges files are
user-supplied paths (this environment has no network, and large vocab blobs
don't belong in the repo).

These run on host as part of the input pipeline; the hot path (BPE merge
loop) is simple enough that Python keeps up with request rates, and the
C-accelerated `vdtpu.data.fast_bpe` extension replaces the merge loop when
built (see vdtpu/data/native/).
"""
from __future__ import annotations

import functools
import json
import re
from typing import Sequence

import numpy as np


# --------------------------------------------------------------------------
# BERT WordPiece
# --------------------------------------------------------------------------

class BertWordPieceTokenizer:
    """Cased WordPiece (bert-base-cased vocab, 28996 entries).

    Matches the reference pipeline used by Optimus encode
    (`optimus.py:729-739`): basic whitespace+punct split, greedy
    longest-match wordpieces, [CLS] ... [SEP] wrapping, pad id 0.
    """

    def __init__(self, vocab_file: str, do_lower_case: bool = False):
        self.vocab: dict[str, int] = {}
        with open(vocab_file, encoding="utf-8") as f:
            for i, line in enumerate(f):
                self.vocab[line.rstrip("\n")] = i
        self.do_lower_case = do_lower_case
        self.unk = "[UNK]"
        self.cls_id = self.vocab["[CLS]"]
        self.sep_id = self.vocab["[SEP]"]
        self.pad_id = self.vocab.get("[PAD]", 0)

    @staticmethod
    def _basic_split(text: str) -> list[str]:
        text = text.strip()
        out, buf = [], []
        for ch in text:
            if ch.isspace():
                if buf:
                    out.append("".join(buf))
                    buf = []
            elif _is_punct(ch):
                if buf:
                    out.append("".join(buf))
                    buf = []
                out.append(ch)
            else:
                buf.append(ch)
        if buf:
            out.append("".join(buf))
        return out

    def _wordpiece(self, word: str) -> list[str]:
        if len(word) > 100:
            return [self.unk]
        pieces, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> list[str]:
        if self.do_lower_case:
            text = text.lower()
        out = []
        for word in self._basic_split(text):
            out.extend(self._wordpiece(word))
        return out

    def __call__(self, texts: Sequence[str], max_length: int = 77) -> np.ndarray:
        """Replicates optimus encode tokenization: truncate to max_length
        wordpieces, wrap with [CLS]/[SEP], pad with 0 (`optimus.py:731-738`)."""
        rows = []
        for t in texts:
            ids = [self.vocab.get(p, self.vocab[self.unk])
                   for p in self.tokenize(t)[:max_length]]
            rows.append([self.cls_id] + ids + [self.sep_id])
        n = max(len(r) for r in rows)
        return np.array([r + [self.pad_id] * (n - len(r)) for r in rows], np.int32)


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    import unicodedata
    return unicodedata.category(ch).startswith("P")


# --------------------------------------------------------------------------
# Byte-level BPE (GPT-2)
# --------------------------------------------------------------------------

@functools.lru_cache()
def bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 reversible byte<->unicode table (public algorithm)."""
    bs = list(range(ord("!"), ord("~") + 1)) + \
        list(range(ord("¡"), ord("¬") + 1)) + \
        list(range(ord("®"), ord("ÿ") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_GPT2_PAT = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\s\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+",
    re.UNICODE)


class _BPE:
    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {m: i for i, m in enumerate(merges)}
        self.cache: dict[str, tuple[str, ...]] = {}

    def __call__(self, token: str) -> tuple[str, ...]:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.ranks.get(p, 1 << 60))
            if best not in self.ranks:
                break
            first, second = best
            out, i = [], 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first and word[i + 1] == second):
                    out.append(first + second)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
        self.cache[token] = word
        return word


class GPT2BPETokenizer:
    """Byte-level BPE with Optimus' added specials <PAD>/<BOS>/<EOS>
    (ids 50257/50258/50259, ref optimus.py:30-42)."""

    def __init__(self, vocab_file: str, merges_file: str):
        with open(vocab_file, encoding="utf-8") as f:
            self.encoder: dict[str, int] = json.load(f)
        merges = []
        with open(merges_file, encoding="utf-8") as f:
            for line in f.read().split("\n"):
                if not line or line.startswith("#version"):
                    continue
                a, _, b = line.partition(" ")
                if b:
                    merges.append((a, b))
        self.bpe = _BPE(merges)
        for i, sp in enumerate(("<PAD>", "<BOS>", "<EOS>")):
            self.encoder.setdefault(sp, 50257 + i)
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.byte_enc = bytes_to_unicode()
        self.byte_dec = {v: k for k, v in self.byte_enc.items()}
        self.pad_id, self.bos_id, self.eos_id = (
            self.encoder["<PAD>"], self.encoder["<BOS>"], self.encoder["<EOS>"])

    def encode(self, text: str) -> list[int]:
        ids = []
        for tok in _GPT2_PAT.findall(text):
            tok = "".join(self.byte_enc[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[p] for p in self.bpe(tok))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder.get(int(i), "") for i in ids)
        data = bytearray(self.byte_dec[c] for c in text if c in self.byte_dec)
        return data.decode("utf-8", errors="replace")


# --------------------------------------------------------------------------
# CLIP BPE
# --------------------------------------------------------------------------

class CLIPTokenizer:
    """CLIP's lowercased BPE with </w> end-of-word markers (vocab 49408).

    Output ids match `openai/clip-vit-large-patch14`:
    <|startoftext|> tokens... <|endoftext|>, padded with <|endoftext|> to
    max_length=77 (the reference uses the HF tokenizer, clip.py:53-57).
    """

    def __init__(self, vocab_file: str, merges_file: str):
        with open(vocab_file, encoding="utf-8") as f:
            self.encoder: dict[str, int] = json.load(f)
        merges = []
        with open(merges_file, encoding="utf-8") as f:
            lines = f.read().split("\n")
        for line in lines[1:]:  # first line is a version header
            a, _, b = line.partition(" ")
            if b:
                merges.append((a, b))
        self.ranks = {m: i for i, m in enumerate(merges)}
        self.byte_enc = bytes_to_unicode()
        self.bos = self.encoder["<|startoftext|>"]
        self.eos = self.encoder["<|endoftext|>"]
        self.cache: dict[str, list[str]] = {}
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[^\s\w]|\d|[^\s\W\d_]+", re.IGNORECASE)

    def _bpe(self, token: str) -> list[str]:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.ranks.get(p, 1 << 60))
            if best not in self.ranks:
                break
            first, second = best
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    out.append(first + second)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
        self.cache[token] = list(word)
        return list(word)

    def encode(self, text: str) -> list[int]:
        text = re.sub(r"\s+", " ", text.strip()).lower()
        ids = []
        for tok in self.pat.findall(text):
            tok = "".join(self.byte_enc[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[p] for p in self._bpe(tok))
        return ids

    def __call__(self, texts: Sequence[str], max_length: int = 77) -> np.ndarray:
        rows = []
        for t in texts:
            ids = [self.bos] + self.encode(t)[:max_length - 2] + [self.eos]
            rows.append(ids + [self.eos] * (max_length - len(ids)))
        return np.array(rows, np.int32)
