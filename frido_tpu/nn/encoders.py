"""Conditioning encoders for t2i / layout2i / sg2i / label2i.

Re-design of ``/root/reference/frido/modules/encoders/modules.py``. The
jit-side modules consume integer token tensors; tokenization (HuggingFace
BertTokenizerFast for raw text) stays host-side, outside the XLA program,
exactly as the ragged-data design in SURVEY.md §7 prescribes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from frido_tpu.nn.layers import Conv2d, Dense, Embed
from frido_tpu.nn.xtransformer import TransformerWrapper


class BERTEmbedderModule(nn.Module):
    """Transformer trunk of BERTEmbedder (``modules.py:85-114``): from-scratch
    x-transformer over BERT-vocab (or raw layout/label) tokens, returning
    per-token embeddings for cross-attention."""

    n_embed: int
    n_layer: int
    vocab_size: int = 30522
    max_seq_len: int = 77

    def setup(self):
        self.transformer = TransformerWrapper(
            num_tokens=self.vocab_size, max_seq_len=self.max_seq_len,
            dim=self.n_embed, depth=self.n_layer, name="transformer")

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.transformer(tokens)


class ClassEmbedderModule(nn.Module):
    """``modules.py:21-39``: class-token embedding; multilabel max-pools
    token embeddings."""

    embed_dim: int
    n_classes: int = 1000
    multilabel: bool = False

    def setup(self):
        self.embedding = Embed(self.n_classes, self.embed_dim, name="embedding")

    def __call__(self, c: jnp.ndarray) -> jnp.ndarray:
        if self.multilabel:
            return jnp.max(self.embedding(c), axis=-2)
        return self.embedding(c[:, None])


class SpatialRescalerModule(nn.Module):
    """``modules.py:127-156``: n-stage bilinear downscale + optional 1x1
    channel map, for image-space conditioning."""

    n_stages: int = 1
    multiplier: float = 0.5
    out_channels: Optional[int] = None

    def setup(self):
        if self.out_channels is not None:
            self.channel_mapper = Conv2d(self.out_channels, 1, use_bias=False,
                                         name="channel_mapper")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax.image

        for _ in range(self.n_stages):
            n, h, w, c = x.shape
            x = jax.image.resize(
                x, (n, int(h * self.multiplier), int(w * self.multiplier), c),
                method="bilinear")
        if self.out_channels is not None:
            x = self.channel_mapper(x)
        return x


# ---------------------------------------------------------------------------
# host-side tokenization
# ---------------------------------------------------------------------------

def _fallback_vocab_notice(msg: str, warnings_mod) -> None:
    """Warn — or raise under ``FRIDO_TPU_STRICT_VOCAB=1``.

    The char/byte fallback vocabs keep zero-egress training-from-scratch
    working, but their ids do not match any trained checkpoint's embedding
    rows, so checkpoint-consuming entry points (``scripts/
    sample_diffusion.py``) set strict mode: silently sampling garbage from
    an imported checkpoint is worse than failing."""
    import os

    if os.environ.get("FRIDO_TPU_STRICT_VOCAB", "0") not in ("", "0",
                                                             "false"):
        raise RuntimeError(
            msg + " (strict mode: FRIDO_TPU_STRICT_VOCAB is set — vendor "
            "the real vocab with `python -m frido_tpu.text.vendor …`, or "
            "unset the variable to accept the non-canonical fallback)")
    warnings_mod.warn(msg)


class BERTTokenizerHost:
    """BERT tokenization host-side (``modules.py:59-83``): truncate + pad to
    max_length, returns int32 [B, L] numpy tokens.

    Resolution order (the environment has no egress):
      1. ``FRIDO_TPU_BERT_VOCAB`` — path to a ``vocab.txt``; vendored
         WordPiece, id-identical to HF given the same file.
      2. a repo-vendored vocab (``python -m frido_tpu.text.vendor
         /path/to/vocab.txt`` — one command makes the repo self-contained).
      3. ``FRIDO_TPU_BERT_TOKENIZER`` / HF cache — BertTokenizerFast.
      4. the vendored deterministic char-fallback vocab (train-from-scratch
         compatible; NOT bert-base-uncased ids — see frido_tpu.text).
    """

    def __init__(self, max_length: int = 77):
        import os
        import warnings

        from frido_tpu.text import WordPieceTokenizer, vendor

        self.max_length = max_length
        self._hf = None
        vocab = os.environ.get("FRIDO_TPU_BERT_VOCAB") \
            or vendor.bert_vocab_path()
        if vocab:
            self.tokenizer = WordPieceTokenizer(vocab)
            return
        explicit = os.environ.get("FRIDO_TPU_BERT_TOKENIZER")
        src = explicit or "bert-base-uncased"
        try:
            from transformers import BertTokenizerFast

            # implicit probe is cache-only: without local_files_only the
            # hub client retries the network for minutes in a zero-egress
            # environment before failing
            self._hf = BertTokenizerFast.from_pretrained(
                src, local_files_only=not explicit)
        except Exception as e:  # no cache, no egress -> vendored fallback
            if explicit:
                # an explicitly requested tokenizer must not silently
                # degrade to checkpoint-incompatible fallback ids
                raise RuntimeError(
                    f"FRIDO_TPU_BERT_TOKENIZER={explicit!r} was set but "
                    f"loading it failed ({type(e).__name__}: {e}); refusing "
                    "to fall back to the char vocab — fix the path or unset "
                    "the variable") from e
            _fallback_vocab_notice(
                "bert-base-uncased vocab unavailable locally — falling back "
                "to the char-fallback vocab. This trains a DIFFERENT text "
                "representation: results are NOT comparable to any "
                "published Frido number, and the ids DO NOT match any "
                "trained checkpoint's embedding rows. For canonical ids, "
                "vendor a vocab once: `python -m frido_tpu.text.vendor "
                "/path/to/vocab.txt` (or set FRIDO_TPU_BERT_VOCAB); see "
                "tools/acceptance.sh for the full runbook", warnings)
            self.tokenizer = WordPieceTokenizer()

    def __call__(self, texts):
        import numpy as np

        if self._hf is not None:
            enc = self._hf(
                texts, truncation=True, max_length=self.max_length,
                padding="max_length", return_tensors="np")
            return np.asarray(enc["input_ids"], dtype="int32")
        return self.tokenizer(texts, max_length=self.max_length)


# ---------------------------------------------------------------------------
# config-facing wrappers (string-target instantiation)
# ---------------------------------------------------------------------------

class BERTEmbedder:
    """Config entry point. Holds the flax module + host tokenizer; the
    diffusion model embeds the module under ``cond_stage_model``."""

    def __init__(self, n_embed: int, n_layer: int, vocab_size: int = 30522,
                 max_seq_len: int = 77, use_tokenizer: bool = True,
                 embedding_dropout: float = 0.0, cond_key: str = "",
                 device: str = ""):
        self.n_embed = n_embed
        self.n_layer = n_layer
        self.vocab_size = vocab_size
        self.max_seq_len = max_seq_len
        self.use_tokenizer = use_tokenizer
        self.cond_key = cond_key
        self._tokenizer = None

    def build_module(self, name: str = "cond_stage_model") -> BERTEmbedderModule:
        return BERTEmbedderModule(
            n_embed=self.n_embed, n_layer=self.n_layer,
            vocab_size=self.vocab_size, max_seq_len=self.max_seq_len,
            name=name)

    def tokenize(self, cond) -> "Any":
        """Host-side: text list -> int tokens; raw-token conds pass through
        (optionally keyed by ``cond_key``, e.g. 'objects' for label2i)."""
        import numpy as np

        if self.use_tokenizer:
            if self._tokenizer is None:
                self._tokenizer = BERTTokenizerHost(self.max_seq_len)
            return self._tokenizer(cond)
        if self.cond_key and isinstance(cond, dict):
            cond = cond[self.cond_key]
        return np.asarray(cond, dtype="int32")


class ClassEmbedder:
    def __init__(self, embed_dim: int, multilabel: bool = False,
                 padding_idx: int = 1023, n_classes: int = 1000,
                 key: str = "class"):
        self.embed_dim = embed_dim
        self.multilabel = multilabel
        self.n_classes = n_classes
        self.key = key

    def build_module(self, name: str = "cond_stage_model") -> ClassEmbedderModule:
        return ClassEmbedderModule(embed_dim=self.embed_dim,
                                   n_classes=self.n_classes,
                                   multilabel=self.multilabel, name=name)

    def tokenize(self, cond):
        import numpy as np

        if isinstance(cond, dict):
            cond = cond[self.key]
        return np.asarray(cond, dtype="int32")


class BERTEmbedderVQTInterface:
    """Tokenizer exposed through the VQ-model interface
    (``modules.py:116-125``): ``encode`` returns the tokens in the
    ``(quant, loss, (..., indices))`` slot shape so a text stream can stand
    in for a codebook stream; ``decode`` is identity."""

    def __init__(self, device: str = "", vq_interface: bool = True,
                 max_length: int = 77):
        self.max_length = max_length
        self._tokenizer = None

    def tokenize(self, texts):
        if self._tokenizer is None:
            self._tokenizer = BERTTokenizerHost(self.max_length)
        return self._tokenizer(texts)

    def encode(self, c):
        tokens = self.tokenize(c)
        return c, None, [None, None, tokens]

    def decode(self, c):
        return c


class TransformerEmbedder(BERTEmbedder):
    """``modules.py:42-56`` — raw-token transformer encoder."""

    def __init__(self, n_embed: int, n_layer: int, vocab_size: int,
                 max_seq_len: int = 77, device: str = ""):
        super().__init__(n_embed, n_layer, vocab_size, max_seq_len,
                         use_tokenizer=False)


class SpatialRescaler:
    def __init__(self, n_stages: int = 1, method: str = "bilinear",
                 multiplier: float = 0.5, in_channels: int = 3,
                 out_channels: Optional[int] = None, bias: bool = False):
        self.n_stages = n_stages
        self.multiplier = multiplier
        self.out_channels = out_channels

    def build_module(self, name: str = "cond_stage_model") -> SpatialRescalerModule:
        return SpatialRescalerModule(n_stages=self.n_stages,
                                     multiplier=self.multiplier,
                                     out_channels=self.out_channels, name=name)

    def tokenize(self, cond):
        return cond


class CLIPTokenizerHost:
    """CLIP BPE tokenization host-side, like BERTTokenizerHost.

    Resolution order (the environment has no egress):
      1. ``FRIDO_TPU_CLIP_VOCAB`` — a directory with ``vocab.json`` +
         ``merges.txt``; vendored BPE, id-identical to HF given the files.
      2. a repo-vendored pair (``python -m frido_tpu.text.vendor
         vocab.json merges.txt``).
      3. ``FRIDO_TPU_CLIP_TOKENIZER`` / HF cache — CLIPTokenizer.
      4. the vendored byte-level fallback vocab (train-from-scratch only).
    """

    def __init__(self, version: str, max_length: int = 77):
        import os
        import warnings

        from frido_tpu.text import ClipBPETokenizer, vendor

        self.max_length = max_length
        self._hf = None
        vdir = os.environ.get("FRIDO_TPU_CLIP_VOCAB")
        if vdir:
            self.tokenizer = ClipBPETokenizer(
                os.path.join(vdir, "vocab.json"),
                os.path.join(vdir, "merges.txt"))
            return
        vendored = vendor.clip_vocab_paths()
        if vendored:
            self.tokenizer = ClipBPETokenizer(*vendored)
            return
        explicit = os.environ.get("FRIDO_TPU_CLIP_TOKENIZER")
        src = explicit or version
        try:
            from transformers import CLIPTokenizer

            # implicit probe is cache-only (see BERTTokenizerHost)
            self._hf = CLIPTokenizer.from_pretrained(
                src, local_files_only=not explicit)
        except Exception as e:  # no cache, no egress -> vendored fallback
            if explicit:
                raise RuntimeError(
                    f"FRIDO_TPU_CLIP_TOKENIZER={explicit!r} was set but "
                    f"loading it failed ({type(e).__name__}: {e}); refusing "
                    "to fall back to the byte vocab — fix the path or unset "
                    "the variable") from e
            _fallback_vocab_notice(
                "CLIP BPE vocab unavailable locally — falling back to the "
                "byte-level vocab. This trains a DIFFERENT text "
                "representation: results are NOT comparable to any "
                "published Frido number, and the ids DO NOT match any "
                "trained checkpoint's embedding rows. For canonical ids, "
                "vendor the files once: `python -m frido_tpu.text.vendor "
                "vocab.json merges.txt` (or set FRIDO_TPU_CLIP_VOCAB); see "
                "tools/acceptance.sh for the full runbook", warnings)
            self.tokenizer = ClipBPETokenizer()

    def __call__(self, texts):
        import numpy as np

        if self._hf is not None:
            enc = self._hf(
                texts, truncation=True, max_length=self.max_length,
                padding="max_length", return_tensors="np")
            return np.asarray(enc["input_ids"], dtype="int32")
        return self.tokenizer(texts, max_length=self.max_length)


class FrozenCLIPEmbedder:
    """CLIP text encoder returning per-token last_hidden_state
    (``modules.py:159-185``). Used by the clip-t2i config (FID 10.74 row
    in BASELINE.md). The tower is the native flax implementation in
    ``frido_tpu.nn.clip`` (weight-compatible with the HF
    ``transformer.text_model.*`` torch key tree); tokenization needs a
    local CLIP vocab (no egress here)."""

    def __init__(self, version: str = "openai/clip-vit-large-patch14",
                 device: str = "", max_length: int = 77):
        self.version = version
        self.max_length = max_length
        self._tokenizer = None

    def build_module(self, name: str = "cond_stage_model"):
        from frido_tpu.nn.clip import CLIPTextModule

        return CLIPTextModule(max_positions=self.max_length, name=name)

    def tokenize(self, cond):
        import numpy as np

        if not isinstance(cond, (list, tuple)) or (
                cond and not isinstance(cond[0], str)):
            return np.asarray(cond, dtype="int32")
        if self._tokenizer is None:
            self._tokenizer = CLIPTokenizerHost(self.version, self.max_length)
        return self._tokenizer(cond)


class FrozenCLIPTextEmbedder(FrozenCLIPEmbedder):
    """Pooled, normalized, k-repeated CLIP text embedding
    (``modules.py:188-219``)."""

    def __init__(self, version: str = "openai/clip-vit-large-patch14",
                 device: str = "", max_length: int = 77, n_repeat: int = 1,
                 normalize: bool = True):
        super().__init__(version, device, max_length)
        self.n_repeat = n_repeat
        self.normalize = normalize

    def build_module(self, name: str = "cond_stage_model"):
        from frido_tpu.nn.clip import CLIPTextPooledModule

        return CLIPTextPooledModule(max_positions=self.max_length,
                                    n_repeat=self.n_repeat,
                                    normalize=self.normalize, name=name)


class FrozenClipImageEmbedder:
    """CLIP image encoder over [-1, 1] images (``modules.py:221-254``):
    bicubic 224 resize + CLIP normalization + ViT tower."""

    def __init__(self, model: str = "ViT-L/14", jit: bool = False,
                 device: str = "", antialias: bool = False):
        self.model = model

    def build_module(self, name: str = "cond_stage_model"):
        import flax.linen as fnn

        from frido_tpu.nn.clip import CLIPVisionTower, clip_preprocess

        class _Wrapped(fnn.Module):
            def setup(self):
                self.tower = CLIPVisionTower(name="model__visual")

            def __call__(self, x):
                return self.tower(clip_preprocess(x))

        return _Wrapped(name=name)

    def tokenize(self, cond):
        import numpy as np

        return np.asarray(cond, dtype="float32")
