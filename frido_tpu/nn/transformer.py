"""Spatial transformer for cross-attention conditioning (NHWC flax).

Re-design of ``/root/reference/frido/modules/attention.py:152-326``:
CrossAttention / BasicTransformerBlock / SpatialTransformer. Attention is
expressed as batched head-major matmuls with fp32 softmax — the shape XLA
tiles directly onto the MXU; a Pallas flash-attention kernel can be slotted
into ``dot_attention`` for long sequences.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from frido_tpu.nn.layers import Conv2d, Dense, Embed, GroupNorm, LayerNorm
from frido_tpu.nn.spade import SPADE
from frido_tpu.ops.image import interpolate_nearest


# Measured on v5e (chained-dispatch timing, bq=bk=1024): the Pallas flash
# kernel beats XLA dot-softmax-dot ~1.5-2.3x for long self-attention
# (kv >= 512 latent tokens) but loses on short-kv cross-attention (77-180
# text tokens, lane padding dominates) and tiny grids.
_FLASH_MIN_KV = 512
_FLASH_MIN_SCORES = 1 << 21

# Below the flash range sits the single-pass VMEM kernel
# (smalls_attention — scores never touch HBM). Standalone microbenches
# (scripts/bench_attention_sites.py, chained-dispatch timing) showed it
# winning the UNet's mid-size sites (self 256 tokens 2.35->2.09 ms,
# self 64 1.73->1.60, cross 256q/77kv 2.14->1.75), but round-4
# IN-PROGRAM profiling (scripts/profile_step.py, docs/PERF.md) showed
# the opposite at the production config: the custom calls cost 3.6 ms
# per stage call PLUS ~2.2 ms of layout copies XLA inserts around their
# layout constraints, while XLA runs the same sites inside its fusions
# for ~1.1 ms — stage1 59.3 -> 54.8 ms with the kernel off. Chained
# microbenches are dispatch-overhead-dominated at sub-millisecond sizes
# and blind to the boundary copies, so the in-program number governs:
# smalls routes to XLA unless FRIDO_SMALLS_ATTN=1 opts the kernel back
# in for experiments. (Flash attention keeps its dispatch: its >=512-kv
# wins are 1.5-2.3x — far above overhead noise — and the XLA form of
# the 4096-token VQGAN-decoder sites OOMs HBM outright.)


def _use_smalls(nq: int, nk: int, d: int, scores: int) -> bool:
    import os

    if os.environ.get("FRIDO_SMALLS_ATTN", "0") != "1":
        return False
    # The seq cap comes from the kernel itself so dispatch and the kernel's
    # trace-time assert can never drift apart.
    from frido_tpu.ops.pallas import smalls_vmem_ok
    from frido_tpu.ops.pallas.attention import _SMALLS_MAX_SEQ

    if max(nq, nk) > _SMALLS_MAX_SEQ or scores < 1 << 19:
        return False
    if not smalls_vmem_ok(nq, nk, d):
        return False             # large-d shapes blow VMEM even at group 1
    if nq == nk:
        return nq >= 64          # self-attention (microbench floor)
    return nq >= 256             # cross-attention (microbench floor)


def dot_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  scale: float) -> jnp.ndarray:
    """softmax(q k^T * scale) v over [..., T, d] tensors, fp32 softmax.

    Large score matrices route to the Pallas flash-attention kernel
    (``frido_tpu.ops.pallas.attention``) on TPU; the einsum form is the
    reference semantics and the small-shape / CPU path.
    """
    from frido_tpu.ops.pallas import (flash_attention, smalls_attention,
                                      use_pallas)

    import os

    batch = 1
    for s in q.shape[:-2]:
        batch *= s
    scores = batch * q.shape[-2] * k.shape[-2]
    # FRIDO_FLASH=0 routes the >=512-kv sites to the XLA einsum form for
    # in-program ablations (keeps VQ argmin etc. dispatched, unlike
    # FRIDO_PALLAS=0) — the round-5 f8f4 flash on/off evidence standard.
    if (use_pallas() and k.shape[-2] >= _FLASH_MIN_KV
            and scores >= _FLASH_MIN_SCORES
            and os.environ.get("FRIDO_FLASH", "1") != "0"):
        return flash_attention(q, k, v, scale)
    if use_pallas() and _use_smalls(q.shape[-2], k.shape[-2], q.shape[-1],
                                    scores):
        return smalls_attention(q, k, v, scale)
    sim = jnp.einsum("...id,...jd->...ij", q, k,
                     preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("...ij,...jd->...id", attn, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


class CrossAttention(nn.Module):
    """``attention.py:152-193``: multi-head attention, context defaults to x."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64

    def setup(self):
        inner = self.dim_head * self.heads
        self.to_q = Dense(inner, use_bias=False, name="to_q")
        self.to_k = Dense(inner, use_bias=False, name="to_k")
        self.to_v = Dense(inner, use_bias=False, name="to_v")
        # torch: to_out = Sequential(Linear, Dropout) -> key to_out.0
        self.to_out = Dense(self.query_dim, name="to_out__0")

    def __call__(self, x: jnp.ndarray,
                 context: jnp.ndarray | None = None) -> jnp.ndarray:
        context = x if context is None else context
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        q = self.to_q(x).reshape(b, n, h, d).transpose(0, 2, 1, 3)
        k = self.to_k(context).reshape(b, context.shape[1], h, d).transpose(0, 2, 1, 3)
        v = self.to_v(context).reshape(b, context.shape[1], h, d).transpose(0, 2, 1, 3)
        out = dot_attention(q, k, v, d ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return self.to_out(out)


class GEGLUFeedForward(nn.Module):
    """``attention.py:37-64`` with glu=True: GEGLU projection + Linear.

    torch keys: ff.net.0.proj (GEGLU), ff.net.2 (Linear).
    """

    dim: int
    mult: int = 4

    def setup(self):
        inner = int(self.dim * self.mult)
        self.proj = Dense(inner * 2, name="net__0__proj")
        self.out = Dense(self.dim, name="net__2")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xg = self.proj(x)
        x1, gate = jnp.split(xg, 2, axis=-1)
        return self.out(x1 * jax.nn.gelu(gate, approximate=False))


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn(context) -> GEGLU FF (``attention.py:196-240``).

    ``use_mscond`` adds the prev-stage attention branch
    (``attention.py:229-240``); shipped configs use SPADE instead.
    """

    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    use_mscond: bool = False

    def setup(self):
        self.attn1 = CrossAttention(self.dim, None, self.n_heads, self.d_head,
                                    name="attn1")
        self.ff = GEGLUFeedForward(self.dim, name="ff")
        self.attn2 = CrossAttention(self.dim, self.context_dim, self.n_heads,
                                    self.d_head, name="attn2")
        self.norm1 = LayerNorm(name="norm1")
        self.norm2 = LayerNorm(name="norm2")
        self.norm3 = LayerNorm(name="norm3")
        if self.use_mscond:
            self.attn_prev = CrossAttention(self.dim, None, self.n_heads,
                                            self.d_head, name="attn_prev")
            self.norm_prev = LayerNorm(name="norm_prev")
            self.attn_cross = CrossAttention(self.dim, self.dim, self.n_heads,
                                             self.d_head, name="attn_cross")
            self.norm_cross = LayerNorm(name="norm_cross")

    def __call__(self, x, context=None, x_prev_stage=None):
        x = self.attn1(self.norm1(x)) + x
        if x_prev_stage is not None and self.use_mscond:
            prev = self.attn_prev(self.norm_prev(x_prev_stage)) + x_prev_stage
            x = self.attn_cross(self.norm_cross(x), context=prev) + x
        x = self.attn2(self.norm2(x), context=context) + x
        x = self.ff(self.norm3(x)) + x
        return x


class SpatialTransformer(nn.Module):
    """``attention.py:243-326``: 1x1 proj-in -> flatten -> transformer depth
    -> 1x1 proj-out, residual. Optional SPADE pre-norm, learned 2-D pos
    embedding, prev-stage cross-attention branch."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    use_spade: bool = False
    pos_embed_size: int = -1
    use_mscond: bool = False
    mscond_dim: Optional[int] = None

    def setup(self):
        inner = self.n_heads * self.d_head
        if self.use_spade:
            self.norm = SPADE(self.in_channels, norm_eps=1e-6, name="norm")
        else:
            self.norm = GroupNorm(eps=1e-6, name="norm")
        if self.pos_embed_size > 0:
            self.pos_embed = Embed(self.pos_embed_size, self.in_channels,
                                   name="pos_embed")
        self.proj_in = Conv2d(inner, 1, name="proj_in")
        self.transformer_blocks = [
            BasicTransformerBlock(inner, self.n_heads, self.d_head,
                                  self.context_dim, self.use_mscond,
                                  name=f"transformer_blocks__{d}")
            for d in range(self.depth)
        ]
        # zero-init like the reference's zero_module(proj_out)
        # (attention.py:277) — the transformer branch starts as identity;
        # was missed until round 5 (from-scratch training dynamics only;
        # checkpoint import overwrites the init either way)
        self.proj_out = Conv2d(self.in_channels, 1, zero_init=True,
                               name="proj_out")
        if self.use_mscond:
            self.cond_proj_in = Conv2d(inner, 1, name="cond_proj_in")

    def spade_tables(self, cond, hw):
        return self.norm.gamma_beta(cond, hw) if self.use_spade else None

    def __call__(self, x, context=None, feat_cond=None, spade_pre=None):
        b, h, w, c = x.shape
        x_in = x
        if self.use_spade:
            x = self.norm(x, feat_cond, spade_pre)
        else:
            x = self.norm(x)

        prev_tokens = None
        if feat_cond is not None and self.use_mscond:
            fc = interpolate_nearest(feat_cond, (h, w))
            fc = self.cond_proj_in(fc)
            prev_tokens = fc.reshape(b, h * w, -1)

        x = self.proj_in(x).reshape(b, h * w, -1)

        if self.pos_embed_size > 0:
            # reference builds meshgrid(w, h) with 'ij' indexing then
            # flattens: position (i over w, j over h) -> token i*h + j
            # (attention.py:306-315); token order itself is row-major over
            # (h, w), so emb[t] uses grid_x=t//h, grid_y=t%h.
            t_idx = jnp.arange(h * w)
            grid_x = t_idx // h
            grid_y = t_idx % h
            emb = (self.pos_embed(grid_x) + self.pos_embed(grid_y)) / 2.0
            x = x + emb[None]

        for block in self.transformer_blocks:
            x = block(x, context=context, x_prev_stage=prev_tokens)

        x = x.reshape(b, h, w, -1)
        x = self.proj_out(x)
        return x + x_in
