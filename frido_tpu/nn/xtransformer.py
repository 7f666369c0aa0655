"""x-transformer text encoder (flax) — the BERTEmbedder trunk.

Re-design of the lucidrains x-transformers subset actually used by the
reference (``/root/reference/frido/modules/x_transformer.py:215-641``):
token + absolute-position embeddings, pre-norm [self-attn, FF] stacks,
final LayerNorm, per-token embeddings out. No mask is applied — the
reference never passes one (``encoders/modules.py:107``), so padded
positions participate in attention; replicated for checkpoint fidelity.

torch key layout: ``token_emb.weight``, ``pos_emb.emb.weight``,
``attn_layers.layers.{i}.0.*`` (norm), ``attn_layers.layers.{i}.1.*``
(Attention to_q/to_k/to_v/to_out or FeedForward net.0.0/net.2), ``norm.*``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from frido_tpu.nn.layers import Dense, Embed, LayerNorm
from frido_tpu.nn.transformer import dot_attention


class XAttention(nn.Module):
    """``x_transformer.py:215-367`` (defaults: heads=8, dim_head=64,
    softmax attention, no talking-heads/mem-kv/sparse-topk)."""

    dim: int
    heads: int = 8
    dim_head: int = 64

    def setup(self):
        inner = self.heads * self.dim_head
        self.to_q = Dense(inner, use_bias=False, name="to_q")
        self.to_k = Dense(inner, use_bias=False, name="to_k")
        self.to_v = Dense(inner, use_bias=False, name="to_v")
        self.to_out = Dense(self.dim, name="to_out")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        q = self.to_q(x).reshape(b, n, h, d).transpose(0, 2, 1, 3)
        k = self.to_k(x).reshape(b, n, h, d).transpose(0, 2, 1, 3)
        v = self.to_v(x).reshape(b, n, h, d).transpose(0, 2, 1, 3)
        out = dot_attention(q, k, v, d ** -0.5)
        return self.to_out(out.transpose(0, 2, 1, 3).reshape(b, n, h * d))


class XFeedForward(nn.Module):
    """``x_transformer.py:194-211`` non-glu: Linear -> GELU -> Linear.

    torch keys: net.0.0 (project_in Linear), net.2 (out Linear).
    """

    dim: int
    mult: int = 4

    def setup(self):
        self.proj_in = Dense(self.dim * self.mult, name="net__0__0")
        self.proj_out = Dense(self.dim, name="net__2")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.proj_out(jax.nn.gelu(self.proj_in(x), approximate=False))


class XEncoderLayers(nn.Module):
    """Pre-norm ('a','f') x depth stack (``x_transformer.py:370-538``)."""

    dim: int
    depth: int
    heads: int = 8
    dim_head: int = 64

    def setup(self):
        layers = []
        for i in range(self.depth):
            ia, iff = 2 * i, 2 * i + 1
            layers.append((
                LayerNorm(name=f"layers__{ia}__0"),
                XAttention(self.dim, self.heads, self.dim_head,
                           name=f"layers__{ia}__1"),
            ))
            layers.append((
                LayerNorm(name=f"layers__{iff}__0"),
                XFeedForward(self.dim, name=f"layers__{iff}__1"),
            ))
        self.layers = layers

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for norm, block in self.layers:
            x = block(norm(x)) + x
        return x


class TransformerWrapper(nn.Module):
    """``x_transformer.py:548-640`` with return_embeddings=True."""

    num_tokens: int
    max_seq_len: int
    dim: int
    depth: int
    heads: int = 8
    dim_head: int = 64

    def setup(self):
        self.token_emb = Embed(self.num_tokens, self.dim, name="token_emb")
        # AbsolutePositionalEmbedding: pos_emb.emb.weight
        self.pos_emb = Embed(self.max_seq_len, self.dim, name="pos_emb__emb")
        self.attn_layers = XEncoderLayers(self.dim, self.depth, self.heads,
                                          self.dim_head, name="attn_layers")
        self.norm = LayerNorm(name="norm")

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens: [B, T] int32 -> [B, T, dim] per-token embeddings."""
        n = tokens.shape[1]
        x = self.token_emb(tokens)
        x = x + self.pos_emb(jnp.arange(n))[None]
        x = self.attn_layers(x)
        return self.norm(x)
