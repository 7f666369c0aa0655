"""CLIP byte-level BPE tokenizer, pure python, zero egress.

Replicates ``transformers.CLIPTokenizer`` in its no-ftfy configuration
(ftfy is absent here, so HF itself takes the BasicTokenizer path:
lowercase, no accent-strip, no punctuation split) — the path the
reference's FrozenCLIPEmbedder uses for its clip-t2i config
(``/root/reference/frido/modules/encoders/modules.py:159-185``). Given the
same ``vocab.json``/``merges.txt`` the ids match HF exactly (golden-tested
in ``tests/test_tokenizers.py``).
"""

from __future__ import annotations

import json
from functools import lru_cache
from typing import Dict, List, Sequence, Tuple

import numpy as np

from frido_tpu.text.wordpiece import BasicTokenizer

BOS = "<|startoftext|>"
EOS = "<|endoftext|>"


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte <-> printable-unicode table (the BPE operates
    on these stand-in chars so raw bytes never collide with merges)."""
    bs = list(range(ord("!"), ord("~") + 1)) \
        + list(range(ord("¡"), ord("¬") + 1)) \
        + list(range(ord("®"), 0x100))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    return {(a, b) for a, b in zip(word, word[1:])}


def fallback_vocab() -> Tuple[Dict[str, int], Dict[Tuple[str, str], int]]:
    """Byte-level fallback: every byte symbol plus its ``</w>`` word-final
    variant, no merges. Tokenizes arbitrary text deterministically (each
    word becomes its byte sequence); ids are NOT openai/clip ids — for
    importing real CLIP checkpoints supply the original vocab files."""
    syms = [bytes_to_unicode()[b] for b in range(256)]
    toks = syms + [s + "</w>" for s in syms] + [BOS, EOS]
    return {t: i for i, t in enumerate(toks)}, {}


class ClipBPETokenizer:
    """End-to-end CLIP tokenizer: clean/lowercase -> regex pretokenize ->
    byte-encode -> BPE -> ``<|startoftext|>`` x ``<|endoftext|>`` ->
    truncate/pad (CLIP pads with the EOS id). Returns int32 [B, L].
    """

    def __init__(self, vocab_file: str | None = None,
                 merges_file: str | None = None):
        import regex

        if vocab_file is None:
            self.encoder, self.bpe_ranks = fallback_vocab()
        else:
            with open(vocab_file, encoding="utf-8") as f:
                self.encoder = json.load(f)
            merges = []
            with open(merges_file, encoding="utf-8") as f:
                lines = f.read().strip().split("\n")[1:49152 - 256 - 2 + 1]
            merges = [tuple(line.split()) for line in lines]
            self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.byte_encoder = bytes_to_unicode()
        self.nlp = BasicTokenizer(strip_accents=False, do_split_on_punc=False)
        self.cache = {BOS: BOS, EOS: EOS}
        self.pat = regex.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""", regex.IGNORECASE)
        self.bos_id = self.encoder[BOS]
        self.eos_id = self.encoder[EOS]

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
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
                if word[i] == first and i < len(word) - 1 \
                        and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        merged = " ".join(word)
        self.cache[token] = merged
        return merged

    def tokenize(self, text: str) -> List[str]:
        text = " ".join(self.nlp.tokenize(text))
        out: List[str] = []
        for tok in self.pat.findall(text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            out.extend(self._bpe(tok).split(" "))
        return out

    def encode(self, text: str, max_length: int = 77) -> List[int]:
        ids = [self.encoder.get(t, self.eos_id) for t in self.tokenize(text)]
        ids = [self.bos_id] + ids[:max_length - 2] + [self.eos_id]
        return ids + [self.eos_id] * (max_length - len(ids))

    def __call__(self, texts: Sequence[str] | str,
                 max_length: int = 77) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        return np.asarray([self.encode(t, max_length) for t in texts],
                          dtype=np.int32)
