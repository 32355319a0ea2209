"""Byte-level BPE tokenizer compatible with OpenAI CLIP.

Fresh implementation of the standard byte-pair-encoding algorithm with CLIP's
conventions (reference behavior: models/clip_fsar.py:274-392 — byte→unicode
table, lowercasing + whitespace cleanup, word-final ``</w>`` marker, merge
ranking loop, 77-token context with SOT/EOT). The merges table is **data**,
not code: it loads from a user-supplied ``bpe_simple_vocab_16e6.txt.gz``
(the public OpenAI asset) found via ``$CLIP_BPE_PATH`` or
``clipspm_tpu/assets/``; a deterministic synthetic vocabulary is generated
when no asset is present so the pipeline stays functional (text features then
differ from OpenAI CLIP — only exact-vocab runs reproduce reference text
embeddings bit-for-bit).

``ftfy`` is optional (not in the base image): when missing, text cleanup falls
back to ``html.unescape`` + strip, which is equivalent for ASCII class names
(every class name shipped in the reference configs is ASCII).
"""

from __future__ import annotations

import gzip
import html
import os
from functools import lru_cache
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

try:
    import regex as re
except ImportError:  # pragma: no cover
    import re  # type: ignore

try:
    import ftfy  # type: ignore

    def _fix_text(text: str) -> str:
        return ftfy.fix_text(text)
except ImportError:  # pragma: no cover
    def _fix_text(text: str) -> str:
        return text

_PAT = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+"""
    r"""|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE)

CONTEXT_LENGTH = 77


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """Reversible byte -> printable-unicode map (the standard GPT-2/CLIP
    table): printable ASCII/latin ranges map to themselves, the rest are
    assigned codepoints from 256 upward."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _word_pairs(word: Tuple[str, ...]) -> set:
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def default_bpe_path() -> Optional[str]:
    """Locate the OpenAI merges asset without bundling it."""
    candidates = [
        os.environ.get("CLIP_BPE_PATH"),
        os.path.join(os.path.dirname(__file__), "..", "..", "assets",
                     "bpe_simple_vocab_16e6.txt.gz"),
    ]
    for c in candidates:
        if c and os.path.isfile(c):
            return c
    return None


def _load_merges(bpe_path: str, limit: int) -> List[Tuple[str, str]]:
    opener = gzip.open if bpe_path.endswith(".gz") else open
    with opener(bpe_path, "rb") as f:
        lines = f.read().decode("utf-8").split("\n")
    # line 0 is a version header; merges follow (OpenAI asset layout)
    lines = lines[1: limit + 1]
    return [tuple(line.split()) for line in lines if line.strip()]


def _synthetic_merges(limit: int) -> List[Tuple[str, str]]:
    """Deterministic fallback vocabulary: frequent English bigram merges so
    tokenization stays reasonable without the OpenAI asset."""
    base = list(bytes_to_unicode().values())
    merges: List[Tuple[str, str]] = []
    common = ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
              "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
              "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le"]
    for pair in common:
        merges.append((pair[0], pair[1]))
        merges.append((pair[0], pair[1] + "</w>"))
    for ch in base[:min(len(base), max(0, (limit - len(merges)) // 1))]:
        if len(merges) >= limit:
            break
        merges.append((ch, "</w>"))
    return merges[:limit]


class SimpleTokenizer:
    """CLIP byte-level BPE (behavioral parity with models/clip_fsar.py:321-392)."""

    def __init__(self, bpe_path: Optional[str] = None,
                 vocab_size: int = 49408):
        if bpe_path is None:
            bpe_path = default_bpe_path()
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        n_merges = vocab_size - 2 * len(self.byte_encoder) - 2
        if bpe_path is not None:
            merges = _load_merges(bpe_path, n_merges)
            self.using_openai_vocab = True
        else:
            merges = _synthetic_merges(n_merges)
            self.using_openai_vocab = False

        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        self.sot_token = self.encoder["<|startoftext|>"]
        self.eot_token = self.encoder["<|endoftext|>"]

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _word_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs,
                         key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _word_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    @staticmethod
    def _clean(text: str) -> str:
        text = _fix_text(text)
        text = html.unescape(html.unescape(text))
        text = re.sub(r"\s+", " ", text)
        return text.strip().lower()

    def encode(self, text: str) -> List[int]:
        tokens: List[int] = []
        text = self._clean(text)
        for tok in re.findall(_PAT, text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            tokens.extend(self.encoder[t] for t in self.bpe(tok).split(" "))
        return tokens

    def decode(self, tokens: List[int]) -> str:
        text = "".join(self.decoder[t] for t in tokens)
        raw = bytearray(self.byte_decoder[c] for c in text
                        if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


_default_tokenizer: Optional[SimpleTokenizer] = None


def get_tokenizer() -> SimpleTokenizer:
    global _default_tokenizer
    if _default_tokenizer is None:
        _default_tokenizer = SimpleTokenizer()
    return _default_tokenizer


def tokenize(texts: Union[str, List[str]],
             context_length: int = CONTEXT_LENGTH,
             truncate: bool = False,
             tokenizer: Optional[SimpleTokenizer] = None) -> np.ndarray:
    """Tokenize to a fixed ``[B, context_length]`` int32 array
    (reference: models/clip_fsar.py:144-180)."""
    if isinstance(texts, str):
        texts = [texts]
    tk = tokenizer or get_tokenizer()
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        toks = [tk.sot_token] + tk.encode(text) + [tk.eot_token]
        if len(toks) > context_length:
            if truncate:
                toks = toks[:context_length]
                toks[-1] = tk.eot_token
            else:
                raise RuntimeError(
                    f"Input {text!r} is too long for context length "
                    f"{context_length}")
        result[i, : len(toks)] = toks
    return result
