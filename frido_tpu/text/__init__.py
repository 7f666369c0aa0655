"""Vendored, zero-egress tokenizers.

The reference tokenizes host-side with HuggingFace (BERTEmbedder:
``/root/reference/frido/modules/encoders/modules.py:59-83``, CLIP:
``modules.py:159-185``); both hard-require a network-fetched vocab. This
package re-implements the two algorithms in pure python so the t2i / sg2i
text paths tokenize offline:

- :mod:`frido_tpu.text.wordpiece` — BERT BasicTokenizer + WordPiece,
  id-for-id compatible with ``transformers.BertTokenizer`` given the same
  ``vocab.txt``.
- :mod:`frido_tpu.text.clip_bpe` — CLIP byte-level BPE (the no-ftfy HF
  path), id-for-id compatible with ``transformers.CLIPTokenizer`` given the
  same ``vocab.json``/``merges.txt``.

Each ships a deterministic built-in fallback vocabulary (char-level /
byte-level) so from-scratch training — where the text embedding is trained
jointly and only *consistency* of ids matters — needs no files at all.
Importing a published torch checkpoint still requires the original vocab
files (point ``FRIDO_TPU_BERT_VOCAB`` / ``FRIDO_TPU_CLIP_VOCAB`` at them).
"""

from frido_tpu.text.clip_bpe import ClipBPETokenizer  # noqa: F401
from frido_tpu.text.wordpiece import WordPieceTokenizer  # noqa: F401
