"""Byte-level BPE tokenizer compatible with OpenAI CLIP.

Implements the published CLIP tokenization algorithm (byte-level BPE over the
standard ``bpe_simple_vocab_16e6`` merge table, vocab size 49408 including
``<|startoftext|>``/``<|endoftext|>``) so that token ids match the reference
(reference ``model/clip/simple_tokenizer.py`` behavior and
``model/clip/clip.py:185-223`` ``tokenize``). The merge-table gz in
``assets/`` is the standard public OpenAI data artifact (MIT licensed), not
code.

Text cleaning vs the reference (ref ``simple_tokenizer.py:50-59``): ftfy is
used **when installed**; otherwise the stdlib fallback applies html unescape
+ NFC normalization, in that order — matching ftfy's own pipeline position
for normalization (``fix_text`` unescapes HTML *before* its final NFC pass,
so entity-encoded combining marks land on the same precomposed ids either
way). The fallback is id-identical to ftfy for ASCII and for already-valid,
already-"plain" unicode; it diverges wherever one of ftfy's non-NFC fixers
would fire: mojibake repair (``"Ã©"`` → ``"é"``), curly-quote uncurling
(``"don’t"`` → ``"don't"``), latin-ligature expansion (``"ﬁ"`` → ``"fi"``),
and fullwidth-character narrowing — all of which the fallback passes
through unchanged. Pinned by ``tests/test_tokenizer.py::
TestCleaningBoundary``. All prompt templates this framework generates
("X X ... person.") are ASCII, so training/eval behavior never depends on
the difference.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import unicodedata
from typing import List

import regex as re

import numpy as np

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "bpe_simple_vocab_16e6.txt.gz")

CONTEXT_LENGTH = 77
VOCAB_SIZE = 49408


@functools.lru_cache()
def bytes_to_unicode():
    """Reversible byte↔unicode map used by GPT-2-style byte-level BPE."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


try:  # optional: full mojibake repair parity with the reference cleaner
    import ftfy as _ftfy
except ImportError:  # stdlib fallback (see module docstring)
    _ftfy = None


def _clean_text(text: str) -> str:
    if _ftfy is not None:
        # reference order (simple_tokenizer.py:50-59): fix_text, then two
        # html unescapes, then whitespace collapse + lower
        text = _ftfy.fix_text(text)
        text = html.unescape(html.unescape(text))
    else:
        text = html.unescape(html.unescape(text))
        # ftfy runs its final NFC pass AFTER unescaping too; what the
        # fallback lacks is ftfy's other fixers (mojibake repair, quote
        # uncurling, ligature/width fixes) — see module docstring
        text = unicodedata.normalize("NFC", text)
    text = re.sub(r"\s+", " ", text)
    return text.strip().lower()


class ClipTokenizer:
    def __init__(self, bpe_path: str = _ASSET):
        byte_encoder = bytes_to_unicode()
        self.byte_encoder = byte_encoder
        self.byte_decoder = {v: k for k, v in byte_encoder.items()}
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )
        self.sot_token = self.encoder["<|startoftext|>"]
        self.eot_token = self.encoder["<|endoftext|>"]

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"

        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        result = " ".join(word)
        self.cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = _clean_text(text)
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    def decode(self, tokens) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        return (
            bytearray(self.byte_decoder[c] for c in text)
            .decode("utf-8", errors="replace")
            .replace("</w>", " ")
        )


@functools.lru_cache()
def get_tokenizer() -> ClipTokenizer:
    return ClipTokenizer()


def tokenize(
    texts, context_length: int = CONTEXT_LENGTH, truncate: bool = False
) -> np.ndarray:
    """Texts → (N, context_length) int32 array with SOT/EOT framing.

    Mirrors reference ``clip.py:185-223``.
    """
    if isinstance(texts, str):
        texts = [texts]
    tok = get_tokenizer()
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = [tok.sot_token] + tok.encode(text) + [tok.eot_token]
        if len(tokens) > context_length:
            if truncate:
                tokens = tokens[:context_length]
                tokens[-1] = tok.eot_token
            else:
                raise RuntimeError(
                    f"Input {text} is too long for context length {context_length}"
                )
        result[i, : len(tokens)] = tokens
    return result
