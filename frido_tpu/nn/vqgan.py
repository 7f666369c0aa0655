"""VQGAN conv backbone: Encoder / Decoder / MSEncoder (NHWC flax).

TPU-first re-design of the CompVis backbone the reference uses
(``/root/reference/taming/modules/diffusionmodules/model.py:38-649``):
same computation graph (so reference checkpoints import 1:1), but NHWC
layout, fp32 GroupNorm islands inside a bf16-friendly conv stream, and
attention as batched matmuls that XLA maps straight onto the MXU.

Module names follow the torch attribute tree (``down__0__block__1`` ==
``down.0.block.1``) for the checkpoint importer.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from frido_tpu.nn.layers import Conv2d, GroupNorm, silu
from frido_tpu.nn.transformer import dot_attention
from frido_tpu.ops.image import interpolate_nearest_2x, pad_nhwc


class ResnetBlock(nn.Module):
    """taming ResnetBlock (``model.py:78-137``): GN(1e-6)+swish+conv x2,
    1x1 (or 3x3) shortcut on channel change. ``temb`` is unused by the
    VQGAN encoders/decoders (temb_channels=0)."""

    in_channels: int
    out_channels: int
    conv_shortcut: bool = False
    dropout: float = 0.0

    def setup(self):
        self.norm1 = GroupNorm(eps=1e-6, name="norm1")
        self.conv1 = Conv2d(self.out_channels, 3, padding=1, name="conv1")
        self.norm2 = GroupNorm(eps=1e-6, name="norm2")
        self.conv2 = Conv2d(self.out_channels, 3, padding=1, name="conv2")
        if self.in_channels != self.out_channels:
            if self.conv_shortcut:
                self.conv_shortcut_mod = Conv2d(
                    self.out_channels, 3, padding=1, name="conv_shortcut")
            else:
                self.nin_shortcut = Conv2d(
                    self.out_channels, 1, padding=0, name="nin_shortcut")

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = self.conv1(self.norm1(x, fuse_silu=True))
        h = self.norm2(h, fuse_silu=True)
        if self.dropout > 0.0 and not deterministic:
            h = nn.Dropout(rate=self.dropout, deterministic=False, name="drop")(h)
        h = self.conv2(h)
        if self.in_channels != self.out_channels:
            if self.conv_shortcut:
                x = self.conv_shortcut_mod(x)
            else:
                x = self.nin_shortcut(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention (``model.py:140-192``).

    1x1-conv qkv, scale ``C**-0.5``, softmax over keys. The two matmuls are
    [B, HW, C] x [B, C, HW] — MXU-shaped; softmax runs in fp32.
    """

    channels: int

    def setup(self):
        self.norm = GroupNorm(eps=1e-6, name="norm")
        self.q = Conv2d(self.channels, 1, name="q")
        self.k = Conv2d(self.channels, 1, name="k")
        self.v = Conv2d(self.channels, 1, name="v")
        self.proj_out = Conv2d(self.channels, 1, name="proj_out")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        hn = self.norm(x)
        q = self.q(hn).reshape(b, h * w, c)
        k = self.k(hn).reshape(b, h * w, c)
        v = self.v(hn).reshape(b, h * w, c)
        out = dot_attention(q, k, v, c ** -0.5)
        return x + self.proj_out(out.reshape(b, h, w, c))


class Upsample(nn.Module):
    """nearest 2x + optional 3x3 conv (``model.py:38-53``)."""

    channels: int
    with_conv: bool = True

    def setup(self):
        if self.with_conv:
            self.conv = Conv2d(self.channels, 3, padding=1, name="conv")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = interpolate_nearest_2x(x)
        if self.with_conv:
            x = self.conv(x)
        return x


class Downsample(nn.Module):
    """asymmetric-pad stride-2 conv (``model.py:56-75``)."""

    channels: int
    with_conv: bool = True

    def setup(self):
        if self.with_conv:
            self.conv = Conv2d(self.channels, 3, stride=2, padding=0, name="conv")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.with_conv:
            return self.conv(pad_nhwc(x, (0, 1), (0, 1)))
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") * 0.25


def _mid_names(prefix: str):
    return (f"{prefix}__block_1", f"{prefix}__attn_1", f"{prefix}__block_2")


class Encoder(nn.Module):
    """Single-scale VQGAN encoder (``model.py:342-432``)."""

    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    resolution: int
    z_channels: int
    in_channels: int = 3
    double_z: bool = True
    dropout: float = 0.0
    resamp_with_conv: bool = True

    def setup(self):
        nres = len(self.ch_mult)
        in_ch_mult = (1,) + tuple(self.ch_mult)
        self.conv_in = Conv2d(self.ch, 3, padding=1, name="conv_in")
        blocks, attns, downs = [], {}, {}
        curr_res = self.resolution
        block_in = self.ch
        for i in range(nres):
            block_in = self.ch * in_ch_mult[i]
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks):
                blocks.append(ResnetBlock(
                    in_channels=block_in, out_channels=block_out,
                    dropout=self.dropout, name=f"down__{i}__block__{j}"))
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    attns[(i, j)] = AttnBlock(block_in, name=f"down__{i}__attn__{j}")
            if i != nres - 1:
                downs[i] = Downsample(block_in, self.resamp_with_conv,
                                      name=f"down__{i}__downsample")
                curr_res //= 2
        self.blocks, self.attns, self.downs = blocks, attns, downs
        b1, a1, b2 = _mid_names("mid")
        self.mid_block_1 = ResnetBlock(block_in, block_in, dropout=self.dropout, name=b1)
        self.mid_attn_1 = AttnBlock(block_in, name=a1)
        self.mid_block_2 = ResnetBlock(block_in, block_in, dropout=self.dropout, name=b2)
        self.norm_out = GroupNorm(eps=1e-6, name="norm_out")
        out_c = 2 * self.z_channels if self.double_z else self.z_channels
        self.conv_out = Conv2d(out_c, 3, padding=1, name="conv_out")

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        nres = len(self.ch_mult)
        h = self.conv_in(x)
        bi = 0
        for i in range(nres):
            for j in range(self.num_res_blocks):
                h = self.blocks[bi](h, deterministic)
                bi += 1
                if (i, j) in self.attns:
                    h = self.attns[(i, j)](h)
            if i in self.downs:
                h = self.downs[i](h)
        h = self.mid_block_1(h, deterministic)
        h = self.mid_attn_1(h)
        h = self.mid_block_2(h, deterministic)
        return self.conv_out(self.norm_out(h, fuse_silu=True))


class MSEncoder(nn.Module):
    """Multi-scale encoder (``model.py:435-546``): shared down trunk, taps
    the last ResnetBlock output of the final ``multiscale`` levels, runs a
    per-scale mid+out head.

    Returns latents ordered finer -> coarser (callers reverse), exactly as
    the reference: ``out_h[i] = head_i(hs_ms[-(multiscale - i)])``.
    """

    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    resolution: int
    z_channels: Sequence[int]
    in_channels: int = 3
    double_z: bool = True
    multiscale: int = 2
    dropout: float = 0.0
    resamp_with_conv: bool = True

    def setup(self):
        nres = len(self.ch_mult)
        assert len(self.z_channels) == self.multiscale, (
            "multiscale encoder: z_channels must have one entry per scale")
        in_ch_mult = (1,) + tuple(self.ch_mult)
        self.conv_in = Conv2d(self.ch, 3, padding=1, name="conv_in")
        blocks, attns, downs = [], {}, {}
        curr_res = self.resolution
        block_in = self.ch
        for i in range(nres):
            block_in = self.ch * in_ch_mult[i]
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks):
                blocks.append(ResnetBlock(
                    in_channels=block_in, out_channels=block_out,
                    dropout=self.dropout, name=f"down__{i}__block__{j}"))
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    attns[(i, j)] = AttnBlock(block_in, name=f"down__{i}__attn__{j}")
            if i != nres - 1:
                downs[i] = Downsample(block_in, self.resamp_with_conv,
                                      name=f"down__{i}__downsample")
                curr_res //= 2
        self.blocks, self.attns, self.downs = blocks, attns, downs

        # per-scale heads over the last `multiscale` trunk levels
        ms_mult = in_ch_mult[-self.multiscale:]
        mids, norms, convs = [], [], []
        for i in range(self.multiscale):
            bi_ch = self.ch * ms_mult[i]
            b1, a1, b2 = _mid_names(f"mid_ms__{i}")
            mids.append((
                ResnetBlock(bi_ch, bi_ch, dropout=self.dropout, name=b1),
                AttnBlock(bi_ch, name=a1),
                ResnetBlock(bi_ch, bi_ch, dropout=self.dropout, name=b2),
            ))
            norms.append(GroupNorm(eps=1e-6, name=f"norm_out_ms__{i}"))
            out_c = 2 * self.z_channels[i] if self.double_z else self.z_channels[i]
            convs.append(Conv2d(out_c, 3, padding=1, name=f"conv_out_ms__{i}"))
        self.mid_ms, self.norm_out_ms, self.conv_out_ms = mids, norms, convs

    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        nres = len(self.ch_mult)
        h = self.conv_in(x)
        hs_ms = []
        bi = 0
        for i in range(nres):
            for j in range(self.num_res_blocks):
                h = self.blocks[bi](h, deterministic)
                bi += 1
                if (i, j) in self.attns:
                    h = self.attns[(i, j)](h)
                if j == self.num_res_blocks - 1:
                    hs_ms.append(h)
            if i in self.downs:
                h = self.downs[i](h)

        out_h = []
        for i in range(self.multiscale):
            hh = hs_ms[-(self.multiscale - i)]
            b1, a1, b2 = self.mid_ms[i]
            hh = b1(hh, deterministic)
            hh = a1(hh)
            hh = b2(hh, deterministic)
            out_h.append(self.conv_out_ms[i](self.norm_out_ms[i](hh, fuse_silu=True)))
        return out_h


class Decoder(nn.Module):
    """VQGAN decoder (``model.py:548-649``)."""

    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    resolution: int
    z_channels: int
    out_ch: int = 3
    dropout: float = 0.0
    resamp_with_conv: bool = True
    give_pre_end: bool = False

    def setup(self):
        nres = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[nres - 1]
        curr_res = self.resolution // 2 ** (nres - 1)
        self.conv_in = Conv2d(block_in, 3, padding=1, name="conv_in")
        b1, a1, b2 = _mid_names("mid")
        self.mid_block_1 = ResnetBlock(block_in, block_in, dropout=self.dropout, name=b1)
        self.mid_attn_1 = AttnBlock(block_in, name=a1)
        self.mid_block_2 = ResnetBlock(block_in, block_in, dropout=self.dropout, name=b2)

        blocks, attns, ups = {}, {}, {}
        for i in reversed(range(nres)):
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                blocks[(i, j)] = ResnetBlock(
                    block_in, block_out, dropout=self.dropout,
                    name=f"up__{i}__block__{j}")
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    attns[(i, j)] = AttnBlock(block_in, name=f"up__{i}__attn__{j}")
            if i != 0:
                ups[i] = Upsample(block_in, self.resamp_with_conv,
                                  name=f"up__{i}__upsample")
                curr_res *= 2
        self.blocks, self.attns, self.ups = blocks, attns, ups
        self.norm_out = GroupNorm(eps=1e-6, name="norm_out")
        self.conv_out = Conv2d(self.out_ch, 3, padding=1, name="conv_out")

    def __call__(self, z: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        nres = len(self.ch_mult)
        h = self.conv_in(z)
        h = self.mid_block_1(h, deterministic)
        h = self.mid_attn_1(h)
        h = self.mid_block_2(h, deterministic)
        for i in reversed(range(nres)):
            for j in range(self.num_res_blocks + 1):
                h = self.blocks[(i, j)](h, deterministic)
                if (i, j) in self.attns:
                    h = self.attns[(i, j)](h)
            if i in self.ups:
                h = self.ups[i](h)
        if self.give_pre_end:
            return h
        return self.conv_out(self.norm_out(h, fuse_silu=True))
