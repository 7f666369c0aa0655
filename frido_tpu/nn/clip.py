"""Native flax CLIP text/vision towers (NHWC, bf16-friendly).

TPU-first rebuild of the encoders behind
``/root/reference/frido/modules/encoders/modules.py:159-254``
(FrozenCLIPEmbedder / FrozenCLIPTextEmbedder / FrozenClipImageEmbedder).
The reference wraps HuggingFace ``CLIPTextModel`` / openai ``clip``; here
the towers are implemented directly on the frido_tpu layer stack so that

  * the module tree mirrors the HF torch key tree
    (``transformer.text_model.embeddings.token_embedding`` etc.), letting
    ``frido_tpu.io.torch_import`` load the published clip-t2i checkpoint
    (FID 10.74 row in BASELINE.md) weight-for-weight, and
  * attention routes through ``dot_attention`` (Pallas flash kernel on
    TPU) like every other attention site in the framework.

CLIP specifics implemented: quick-GELU (x * sigmoid(1.702 x)), pre-LN
blocks, causal mask in the text tower, EOT-token pooling (argmax of ids)
for the projected/normalized text embedding.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from frido_tpu.nn.layers import Dense, Embed, LayerNorm


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    """Multi-head attention, HF CLIP key names (q/k/v/out_proj)."""

    hidden: int
    heads: int

    def setup(self):
        self.q_proj = Dense(self.hidden, name="q_proj")
        self.k_proj = Dense(self.hidden, name="k_proj")
        self.v_proj = Dense(self.hidden, name="v_proj")
        self.out_proj = Dense(self.hidden, name="out_proj")

    def __call__(self, x: jnp.ndarray, causal: bool = False) -> jnp.ndarray:
        b, t, _ = x.shape
        h = self.heads
        d = self.hidden // h
        q = self.q_proj(x).reshape(b, t, h, d).transpose(0, 2, 1, 3)
        k = self.k_proj(x).reshape(b, t, h, d).transpose(0, 2, 1, 3)
        v = self.v_proj(x).reshape(b, t, h, d).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhid,bhjd->bhij", q, k,
                       preferred_element_type=jnp.float32) / math.sqrt(d)
        if causal:
            mask = jnp.tril(jnp.ones((t, t), bool))
            s = jnp.where(mask, s, -1e9)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhij,bhjd->bhid", p, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, self.hidden)
        return self.out_proj(o)


class CLIPMLP(nn.Module):
    hidden: int
    intermediate: int

    def setup(self):
        self.fc1 = Dense(self.intermediate, name="fc1")
        self.fc2 = Dense(self.hidden, name="fc2")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.fc2(quick_gelu(self.fc1(x)))


class CLIPEncoderLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int

    def setup(self):
        self.layer_norm1 = LayerNorm(name="layer_norm1")
        self.self_attn = CLIPAttention(self.hidden, self.heads,
                                       name="self_attn")
        self.layer_norm2 = LayerNorm(name="layer_norm2")
        self.mlp = CLIPMLP(self.hidden, self.intermediate, name="mlp")

    def __call__(self, x: jnp.ndarray, causal: bool = False) -> jnp.ndarray:
        x = x + self.self_attn(self.layer_norm1(x), causal=causal)
        x = x + self.mlp(self.layer_norm2(x))
        return x


class CLIPTextTower(nn.Module):
    """HF ``CLIPTextModel.text_model``: embeddings -> causal encoder ->
    final LN. Defaults are clip-vit-large-patch14 text."""

    vocab_size: int = 49408
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 77

    def setup(self):
        self.token_embedding = Embed(self.vocab_size, self.hidden,
                                     name="embeddings__token_embedding")
        self.position_embedding = Embed(self.max_positions, self.hidden,
                                        name="embeddings__position_embedding")
        self.encoder_layers = [
            CLIPEncoderLayer(self.hidden, self.heads, self.intermediate,
                             name=f"encoder__layers__{i}")
            for i in range(self.layers)
        ]
        self.final_layer_norm = LayerNorm(name="final_layer_norm")

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        t = tokens.shape[1]
        x = self.token_embedding(tokens) + self.position_embedding(
            jnp.arange(t))[None]
        for layer in self.encoder_layers:
            x = layer(x, causal=True)
        return self.final_layer_norm(x)


class CLIPTextModule(nn.Module):
    """last_hidden_state for cross-attention (FrozenCLIPEmbedder
    semantics, ``modules.py:176-182``). Named so the param path is
    ``cond_stage_model/transformer/text_model/...``."""

    vocab_size: int = 49408
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 77

    def setup(self):
        self.text_model = CLIPTextTower(
            vocab_size=self.vocab_size, hidden=self.hidden,
            layers=self.layers, heads=self.heads,
            intermediate=self.intermediate,
            max_positions=self.max_positions,
            name="transformer__text_model")

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.text_model(tokens)


class CLIPTextPooledModule(nn.Module):
    """Projected + normalized pooled text embedding, repeated k times
    (FrozenCLIPTextEmbedder semantics, ``modules.py:188-219``). Pooling
    takes the EOT position = argmax of token ids (EOT has the largest id
    in the CLIP vocab)."""

    vocab_size: int = 49408
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 77
    projection_dim: int = 768
    n_repeat: int = 1
    normalize: bool = True

    def setup(self):
        self.text_model = CLIPTextTower(
            vocab_size=self.vocab_size, hidden=self.hidden,
            layers=self.layers, heads=self.heads,
            intermediate=self.intermediate,
            max_positions=self.max_positions,
            name="transformer__text_model")
        self.text_projection = Dense(self.projection_dim, use_bias=False,
                                     name="text_projection")

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        h = self.text_model(tokens)
        eot = jnp.argmax(tokens, axis=1)
        pooled = jnp.take_along_axis(h, eot[:, None, None], axis=1)[:, 0]
        z = self.text_projection(pooled)
        if self.normalize:
            z = z / jnp.linalg.norm(z, axis=1, keepdims=True)
        return jnp.repeat(z[:, None, :], self.n_repeat, axis=1)


class CLIPVisionTower(nn.Module):
    """openai/HF CLIP ViT image tower (FrozenClipImageEmbedder semantics,
    ``modules.py:221-254``): patch conv -> [CLS|patches] + pos embed ->
    pre-LN transformer -> post LN on CLS. Defaults are ViT-L/14."""

    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    intermediate: int = 4096
    patch: int = 14
    image_size: int = 224
    projection_dim: int = 768

    def setup(self):
        from frido_tpu.nn.layers import Conv2d

        n_pos = (self.image_size // self.patch) ** 2 + 1
        self.patch_embedding = Conv2d(self.hidden, self.patch,
                                      stride=self.patch, use_bias=False,
                                      name="embeddings__patch_embedding")
        self.class_embedding = self.param(
            "embeddings__class_embedding", nn.initializers.normal(0.02),
            (self.hidden,))
        self.position_embedding = Embed(n_pos, self.hidden,
                                        name="embeddings__position_embedding")
        self.pre_layrnorm = LayerNorm(name="pre_layrnorm")  # HF's typo'd key
        self.encoder_layers = [
            CLIPEncoderLayer(self.hidden, self.heads, self.intermediate,
                             name=f"encoder__layers__{i}")
            for i in range(self.layers)
        ]
        self.post_layernorm = LayerNorm(name="post_layernorm")
        self.visual_projection = Dense(self.projection_dim, use_bias=False,
                                       name="visual_projection")

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: [B, H, W, 3] already CLIP-normalized."""
        b = images.shape[0]
        p = self.patch_embedding(images)          # [B, h/14, w/14, C]
        p = p.reshape(b, -1, self.hidden)
        cls = jnp.broadcast_to(self.class_embedding, (b, 1, self.hidden))
        x = jnp.concatenate([cls, p], axis=1)
        x = x + self.position_embedding(jnp.arange(x.shape[1]))[None]
        x = self.pre_layrnorm(x)
        for layer in self.encoder_layers:
            x = layer(x, causal=False)
        pooled = self.post_layernorm(x[:, 0])
        return self.visual_projection(pooled)


# CLIP pixel normalization (modules.py:238-239)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(x: jnp.ndarray,
                    image_size: int = 224) -> jnp.ndarray:
    """[-1, 1] NHWC images -> CLIP-normalized, bicubic-resized to 224
    (``modules.py:243-250``)."""
    b, _, _, c = x.shape
    x = jax.image.resize(x, (b, image_size, image_size, c), method="bicubic")
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (x - mean) / std
