"""PyUNet: the coarse-to-fine pyramid denoiser (NHWC flax).

TPU-first re-design of ``/root/reference/frido/modules/diffusionmodules/
pyunet.py:447-950`` (guided-diffusion UNet + Frido extensions):

* sinusoidal t-embedding + MLP, **stage embedding** added to it
* **split-head input**: per-stage ``pre_input_blocks`` conv over only the
  current stage's channel window; previous stages' clean channels feed a
  SPADE feature map via ``pre_input_cond_blocks``
* shared trunk of ResBlocks + (spatial-transformer) attention at the
  configured downsample rates, with skip concatenation
* **split-head output**: per-stage ``out[stage]`` conv
* optional per-stage expert trunks (``use_stage_expert``) and a codebook-id
  predictor head

``stage`` is a static Python int — the stage loop is unrolled at trace time,
so all channel-window slicing is static (no runtime tensor surgery), and XLA
sees one fixed-shape program per stage.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from frido_tpu.nn.layers import (Conv1d, Conv2d, Dense, Embed, GroupNorm,
                                 _conv_mode, silu)
from frido_tpu.nn.spade import SPADE
from frido_tpu.nn.transformer import SpatialTransformer, dot_attention
from frido_tpu.ops.image import avg_pool_2x, interpolate_nearest_2x


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal embedding, **cos first** (``pyunet`` util.py:151-171 —
    note this differs from the taming sin-first variant)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class UNetUpsample(nn.Module):
    """nearest 2x + optional 3x3 conv (``pyunet.py:94-122``)."""

    channels: int
    use_conv: bool = True

    def setup(self):
        if self.use_conv:
            self.conv = Conv2d(self.channels, 3, padding=1, name="conv")

    def __call__(self, x):
        x = interpolate_nearest_2x(x)
        if self.use_conv:
            x = self.conv(x)
        return x


class UNetDownsample(nn.Module):
    """stride-2 conv, symmetric pad 1 (``pyunet.py:137-163``) — unlike the
    taming Downsample which pads asymmetrically."""

    channels: int
    use_conv: bool = True

    def setup(self):
        if self.use_conv:
            self.op = Conv2d(self.channels, 3, stride=2, padding=1, name="op")

    def __call__(self, x):
        if self.use_conv:
            return self.op(x)
        return avg_pool_2x(x)


class ResBlock(nn.Module):
    """guided-diffusion ResBlock with optional SPADE norms
    (``pyunet.py:166-300``). Non-scale-shift emb injection (the shipped
    configs leave ``use_scale_shift_norm`` False): h += emb_out before the
    second norm."""

    channels: int
    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    use_conv_skip: bool = False
    up: bool = False
    down: bool = False
    use_spade: bool = False

    def setup(self):
        cout = self.out_channels
        if self.use_spade:
            self.in_norm = SPADE(self.channels, name="in_layers__0")
            self.out_norm = SPADE(cout, name="out_layers__0")
        else:
            self.in_norm = GroupNorm(eps=1e-5, name="in_layers__0")
            self.out_norm = GroupNorm(eps=1e-5, name="out_layers__0")
        self.in_conv = Conv2d(cout, 3, padding=1, name="in_layers__2")
        self.emb_proj = Dense(
            2 * cout if self.use_scale_shift_norm else cout,
            name="emb_layers__1")
        self.out_conv = Conv2d(cout, 3, padding=1, zero_init=True,
                               name="out_layers__3")
        if self.out_channels != self.channels:
            if self.use_conv_skip:
                self.skip = Conv2d(cout, 3, padding=1, name="skip_connection")
            else:
                self.skip = Conv2d(cout, 1, name="skip_connection")

    def _norm(self, norm, x, feat_cond, pre=None):
        return norm(x, feat_cond, pre) if self.use_spade else norm(x)

    def _norm_silu(self, norm, x, feat_cond, pre=None):
        """silu(norm(x)); GroupNorm fuses the SiLU into the Pallas kernel."""
        if self.use_spade:
            return silu(norm(x, feat_cond, pre))
        return norm(x, fuse_silu=True)

    def _norm_silu_conv(self, norm, conv, x, feat_cond, pre=None):
        """norm -> (SPADE modulation) -> SiLU -> conv. Under
        FRIDO_CONV_MODE=pallas_fused the whole prologue is folded into the
        conv's Pallas kernel (ops/pallas/conv_pallas.py); otherwise this is
        exactly ``conv(self._norm_silu(...))``."""
        if _conv_mode() != "pallas_fused":
            return conv(self._norm_silu(norm, x, feat_cond, pre))
        if self.use_spade:
            nscale, nbias = norm.param_free_norm(x, raw=True)
            if pre is not None:
                gamma, beta = pre
            elif feat_cond is not None:
                gamma, beta = norm.gamma_beta(
                    feat_cond, (x.shape[1], x.shape[2]))
            else:
                gamma = beta = None
            eps, groups = norm.norm_eps, 32
        else:
            nscale, nbias = norm(x, raw=True)
            gamma = beta = None
            eps, groups = norm.eps, norm.num_groups
        return conv(x, fused_norm=dict(
            nscale=nscale, nbias=nbias, num_groups=groups, eps=eps,
            gamma=gamma, beta=beta))

    def spade_tables(self, cond, hw):
        """Precomputed (gamma, beta) for both SPADE norms at this block's
        static resolutions (``hw`` is the input resolution; the out norm
        runs after the optional up/down resample)."""
        if not self.use_spade:
            return None
        h_in, w_in = hw
        if self.up:
            out_hw = (h_in * 2, w_in * 2)
        elif self.down:
            out_hw = (h_in // 2, w_in // 2)
        else:
            out_hw = hw
        return (self.in_norm.gamma_beta(cond, hw),
                self.out_norm.gamma_beta(cond, out_hw))

    def __call__(self, x, emb, feat_cond=None, deterministic=True,
                 spade_pre=None):
        pre_in, pre_out = spade_pre if spade_pre is not None else (None, None)
        if self.up or self.down:
            resample = interpolate_nearest_2x if self.up else avg_pool_2x
            h = self._norm_silu(self.in_norm, x, feat_cond, pre_in)
            h = resample(h)
            x = resample(x)
            h = self.in_conv(h)
        else:
            h = self._norm_silu_conv(self.in_norm, self.in_conv, x,
                                     feat_cond, pre_in)
        emb_out = self.emb_proj(silu(emb)).astype(h.dtype)[:, None, None, :]
        drop_active = self.dropout > 0 and not deterministic
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = self._norm(self.out_norm, h, feat_cond, pre_out) \
                * (1 + scale) + shift
            h = silu(h)
        elif not drop_active:
            # sampling / dropout-free: second prologue also fusable
            return (self.skip(x) if self.out_channels != self.channels
                    else x) + self._norm_silu_conv(
                        self.out_norm, self.out_conv, h + emb_out,
                        feat_cond, pre_out)
        else:
            h = self._norm_silu(self.out_norm, h + emb_out, feat_cond,
                                pre_out)
        if drop_active:
            h = nn.Dropout(rate=self.dropout, deterministic=False,
                           name="drop")(h)
        h = self.out_conv(h)
        if self.out_channels != self.channels:
            x = self.skip(x)
        return x + h


def qkv_attention_legacy(qkv: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """``QKVAttentionLegacy`` (``pyunet.py:381-406``): channel layout is
    head-major triplets [h0:(q k v), h1:(q k v), ...]; scale applied to both
    q and k as 1/sqrt(sqrt(ch)); softmax in fp32.

    qkv: [N, T, 3*H*c] -> [N, T, H*c]
    """
    n, t, width = qkv.shape
    ch = width // (3 * n_heads)
    x = qkv.reshape(n, t, n_heads, 3, ch)
    q = x[:, :, :, 0].transpose(0, 2, 1, 3)  # [N, H, T, c]
    k = x[:, :, :, 1].transpose(0, 2, 1, 3)
    v = x[:, :, :, 2].transpose(0, 2, 1, 3)
    a = dot_attention(q, k, v, 1.0 / math.sqrt(ch))
    return a.transpose(0, 2, 1, 3).reshape(n, t, n_heads * ch)


def qkv_attention_new(qkv: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """``QKVAttention`` new order (``pyunet.py:413-440``): layout is
    [all q heads | all k heads | all v heads]."""
    n, t, width = qkv.shape
    ch = width // (3 * n_heads)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(n, t, n_heads, ch).transpose(0, 2, 1, 3)
    k = k.reshape(n, t, n_heads, ch).transpose(0, 2, 1, 3)
    v = v.reshape(n, t, n_heads, ch).transpose(0, 2, 1, 3)
    a = dot_attention(q, k, v, 1.0 / math.sqrt(ch))
    return a.transpose(0, 2, 1, 3).reshape(n, t, n_heads * ch)


class AttentionBlock(nn.Module):
    """Spatial self-attention with conv-qkv (``pyunet.py:303-358``)."""

    channels: int
    num_heads: int = 1
    use_new_attention_order: bool = False
    use_spade: bool = False

    def setup(self):
        if self.use_spade:
            self.norm = SPADE(self.channels, name="norm")
        else:
            self.norm = GroupNorm(eps=1e-5, name="norm")
        self.qkv = Conv1d(self.channels * 3, 1, name="qkv")
        self.proj_out = Conv1d(self.channels, 1, zero_init=True,
                               name="proj_out")

    def spade_tables(self, cond, hw):
        return self.norm.gamma_beta(cond, hw) if self.use_spade else None

    def __call__(self, x, feat_cond=None, spade_pre=None):
        b, h, w, c = x.shape
        if self.use_spade:
            xn = self.norm(x, feat_cond, spade_pre).reshape(b, h * w, c)
        else:
            xn = self.norm(x.reshape(b, h * w, c))
        qkv = self.qkv(xn)
        attn = (qkv_attention_new if self.use_new_attention_order
                else qkv_attention_legacy)
        out = self.proj_out(attn(qkv, self.num_heads))
        return (x.reshape(b, h * w, c) + out).reshape(b, h, w, c)


def _heads_for(ch: int, num_heads: int, num_head_channels: int, legacy: bool,
               use_spatial_transformer: bool) -> Tuple[int, int]:
    """Replicates the head-count logic at ``pyunet.py:632-640,686-693``."""
    if num_head_channels == -1:
        heads, dim_head = num_heads, ch // num_heads
    else:
        heads, dim_head = ch // num_head_channels, num_head_channels
    if legacy:
        heads = 1
        dim_head = ch // heads if use_spatial_transformer else num_head_channels
    return heads, dim_head


class PyUNetModel(nn.Module):
    """See module docstring. Config fields mirror the reference yaml params
    (``configs/frido/t2i/frido_f16f8_coco.yaml:22-46``)."""

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = -1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    use_embed: bool = False
    num_stage: int = 1
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    n_embed: Optional[int] = None
    legacy: bool = True
    use_split_head: bool = False
    split_embed_dim_list: Sequence[int] = ()
    use_SPADE_norm: bool = False
    use_pos_embed: bool = False
    use_mscond: bool = False
    use_stage_expert: bool = False

    def _attn_layer(self, ch: int, name: str, upsample: bool = False):
        heads, dim_head = _heads_for(
            ch, self.num_heads_upsample if upsample and not
            self.use_spatial_transformer else self.num_heads,
            self.num_head_channels, self.legacy, self.use_spatial_transformer)
        if self.use_spatial_transformer:
            return ("xattn", SpatialTransformer(
                ch, heads, dim_head, depth=self.transformer_depth,
                context_dim=self.context_dim, use_spade=self.use_SPADE_norm,
                pos_embed_size=self.image_size if self.use_pos_embed else -1,
                use_mscond=self.use_mscond, mscond_dim=self.model_channels,
                name=name))
        return ("attn", AttentionBlock(
            ch, num_heads=heads if self.num_head_channels == -1 else ch // dim_head,
            use_new_attention_order=self.use_new_attention_order,
            use_spade=self.use_SPADE_norm, name=name))

    def _build_trunk(self, suffix: str = ""):
        """Build (input_blocks, middle_block, output_blocks) module lists.

        Layer indices replicate the reference constructor loops so torch
        keys line up (``pyunet.py:600-809``). Each block is a list of
        (kind, module) with kind in {res, attn, xattn, down, up, conv}.
        """
        mc = self.model_channels
        in_name = f"input_blocks{suffix}"
        mid_name = f"middle_block{suffix}"
        out_name = f"output_blocks{suffix}"
        input_blocks = []
        block_idx = 0
        if not self.use_split_head:
            input_blocks.append([("conv", Conv2d(
                mc, 3, padding=1, name=f"{in_name}__0__0"))])
            block_idx = 1
        input_block_chans = [mc]
        ch = mc
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                layers = [("res", ResBlock(
                    ch, mult * mc, dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    use_spade=self.use_SPADE_norm,
                    name=f"{in_name}__{block_idx}__0"))]
                ch = mult * mc
                if ds in self.attention_resolutions:
                    layers.append(self._attn_layer(
                        ch, f"{in_name}__{block_idx}__1"))
                input_blocks.append(layers)
                input_block_chans.append(ch)
                block_idx += 1
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    input_blocks.append([("res", ResBlock(
                        ch, ch, dropout=self.dropout,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        down=True, use_spade=self.use_SPADE_norm,
                        name=f"{in_name}__{block_idx}__0"))])
                else:
                    input_blocks.append([("down", UNetDownsample(
                        ch, self.conv_resample,
                        name=f"{in_name}__{block_idx}__0"))])
                input_block_chans.append(ch)
                ds *= 2
                block_idx += 1

        middle_block = [
            ("res", ResBlock(ch, ch, dropout=self.dropout,
                             use_scale_shift_norm=self.use_scale_shift_norm,
                             use_spade=self.use_SPADE_norm,
                             name=f"{mid_name}__0")),
            self._attn_layer(ch, f"{mid_name}__1"),
            ("res", ResBlock(ch, ch, dropout=self.dropout,
                             use_scale_shift_norm=self.use_scale_shift_norm,
                             use_spade=self.use_SPADE_norm,
                             name=f"{mid_name}__2")),
        ]

        output_blocks = []
        block_idx = 0
        chans = list(input_block_chans)
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                ich = chans.pop()
                layers = [("res", ResBlock(
                    ch + ich, mc * mult, dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    use_spade=self.use_SPADE_norm,
                    name=f"{out_name}__{block_idx}__0"))]
                ch = mc * mult
                li = 1
                if ds in self.attention_resolutions:
                    layers.append(self._attn_layer(
                        ch, f"{out_name}__{block_idx}__{li}", upsample=True))
                    li += 1
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        layers.append(("res", ResBlock(
                            ch, ch, dropout=self.dropout,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            up=True, use_spade=self.use_SPADE_norm,
                            name=f"{out_name}__{block_idx}__{li}")))
                    else:
                        layers.append(("up", UNetUpsample(
                            ch, self.conv_resample,
                            name=f"{out_name}__{block_idx}__{li}")))
                    ds //= 2
                output_blocks.append(layers)
                block_idx += 1
        return input_blocks, middle_block, output_blocks, ch

    def setup(self):
        mc = self.model_channels
        ted = mc * 4
        if self.use_spatial_transformer:
            assert self.context_dim is not None, (
                "context_dim required with use_spatial_transformer")
        if self.use_split_head:
            assert self.split_embed_dim_list, "specify split head embed dims"
            assert sum(self.split_embed_dim_list) == self.in_channels

        # time_embed = Sequential(linear, SiLU, linear) -> keys .0 and .2
        self.time_embed_0 = Dense(ted, name="time_embed__0")
        self.time_embed_2 = Dense(ted, name="time_embed__2")

        if self.num_classes is not None:
            if self.use_embed:
                self.label_emb = Embed(self.num_classes, ted, name="label_emb")
            else:
                self.label_emb = Dense(ted, name="label_emb")
        if self.num_stage > 1:
            self.stage_emb = Embed(self.num_stage, ted, name="stage_emb")

        if self.use_split_head:
            split = list(self.split_embed_dim_list)
            if self.use_SPADE_norm:
                self.pre_input_cond_blocks = [
                    Conv2d(mc, 3, padding=1,
                           name=f"pre_input_cond_blocks__{i}__0")
                    for i in range(len(split) - 1)
                ]
                self.pre_input_blocks = [
                    Conv2d(mc, 3, padding=1, name=f"pre_input_blocks__{i}__0")
                    for i in range(len(split))
                ]
            else:
                self.pre_input_blocks = [
                    Conv2d(mc, 3, padding=1, name=f"pre_input_blocks__{i}__0")
                    for i in range(len(split))
                ]

        if self.use_stage_expert:
            trunks = []
            for s in range(len(self.split_embed_dim_list)):
                trunks.append(self._build_trunk(suffix=f"_expert__{s}"))
            self.expert_trunks = trunks
            last_ch = trunks[0][3]
        else:
            ib, mb, ob, last_ch = self._build_trunk()
            self.input_blocks, self.middle_block, self.output_blocks = ib, mb, ob

        if self.use_split_head:
            self.out_heads = [
                (GroupNorm(eps=1e-5, name=f"out__{i}__0"),
                 Conv2d(self.split_embed_dim_list[i], 3, padding=1,
                        zero_init=True, name=f"out__{i}__2"))
                for i in range(len(self.split_embed_dim_list))
            ]
        else:
            self.out_norm = GroupNorm(eps=1e-5, name="out__0")
            self.out_conv = Conv2d(self.out_channels, 3, padding=1,
                                   zero_init=True, name="out__2")

        if self.n_embed is not None:
            assert not self.use_SPADE_norm and not self.use_split_head
            self.id_predictor_norm = GroupNorm(eps=1e-5, name="id_predictor__0")
            self.id_predictor_conv = Conv2d(self.n_embed, 1,
                                            name="id_predictor__1")

    def init_all(self, x: jnp.ndarray, timesteps: jnp.ndarray,
                 context: jnp.ndarray | None = None,
                 y: jnp.ndarray | None = None) -> jnp.ndarray:
        """Touch every stage so ``module.init(..., method='init_all')``
        creates all per-stage heads/trunks."""
        out = None
        for s in range(max(self.num_stage, 1)):
            out = self(x, timesteps, context, y, stage=s)
        return out

    def _run_layer(self, kind, mod, h, emb, context, feat_cond, deterministic,
                   spade_pre=None):
        pre = spade_pre.get(mod.name) if spade_pre is not None else None
        if kind == "res":
            return mod(h, emb, feat_cond, deterministic, pre)
        if kind == "xattn":
            return mod(h, context, feat_cond, pre)
        if kind == "attn":
            return mod(h, feat_cond, pre)
        return mod(h)  # conv / down / up

    def spade_tables(self, x_cond: jnp.ndarray, stage: int):
        """Precompute every SPADE site's (gamma, beta) from the previous
        stages' channels ``x_cond`` ([N, H, W, sum(split[:stage])]).

        During sampling those channels are frozen for the whole stage, so
        the tables — ~37% of a stage-1 UNet call's FLOPs at the flagship
        config — are computed once per stage instead of per step x CFG
        branch. Keyed by module name; resolution per site is replayed from
        the static down/upsample schedule (mirrors ``__call__``'s layer
        order exactly). Numerically identical to the in-line computation.
        """
        if not (self.use_split_head and self.use_SPADE_norm) or stage == 0:
            return None
        h_cond = self.pre_input_cond_blocks[stage - 1](x_cond)
        if self.use_stage_expert:
            input_blocks, middle_block, output_blocks, _ = (
                self.expert_trunks[stage])
        else:
            input_blocks, middle_block, output_blocks = (
                self.input_blocks, self.middle_block, self.output_blocks)

        tables = {}
        hw = (x_cond.shape[1], x_cond.shape[2])

        def visit(kind, mod, hw):
            if kind == "res":
                tables[mod.name] = mod.spade_tables(h_cond, hw)
                if mod.down:
                    return (hw[0] // 2, hw[1] // 2)
                if mod.up:
                    return (hw[0] * 2, hw[1] * 2)
                return hw
            if kind in ("xattn", "attn"):
                tables[mod.name] = mod.spade_tables(h_cond, hw)
                return hw
            if kind == "down":
                return (hw[0] // 2, hw[1] // 2)
            if kind == "up":
                return (hw[0] * 2, hw[1] * 2)
            return hw  # conv

        for layers in input_blocks:
            for kind, mod in layers:
                hw = visit(kind, mod, hw)
        for kind, mod in middle_block:
            hw = visit(kind, mod, hw)
        for layers in output_blocks:
            for kind, mod in layers:
                hw = visit(kind, mod, hw)
        return tables

    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray,
                 context: jnp.ndarray | None = None,
                 y: jnp.ndarray | None = None, stage: int = 0,
                 deterministic: bool = True, spade_pre=None) -> jnp.ndarray:
        """x: [N, H, W, C] latent; timesteps: [N]; context: [N, T, D] tokens;
        stage: static python int selecting the pyramid stage; ``spade_pre``:
        optional precomputed SPADE tables from :meth:`spade_tables`."""
        assert (y is not None) == (self.num_classes is not None)
        emb = timestep_embedding(timesteps, self.model_channels)
        emb = self.time_embed_2(silu(self.time_embed_0(emb)))
        if self.num_classes is not None:
            emb = emb + self.label_emb(y)
        if self.num_stage > 1:
            stage_ids = jnp.full((x.shape[0],), stage, dtype=jnp.int32)
            emb = emb + self.stage_emb(stage_ids)

        h_cond = None
        if self.use_split_head:
            split = list(self.split_embed_dim_list)
            cond_dim = sum(split[:stage]) if self.use_SPADE_norm else 0
            input_dim = sum(split[:stage + 1])
            h = self.pre_input_blocks[stage](x[..., cond_dim:input_dim])
            if cond_dim != 0:
                h_cond = self.pre_input_cond_blocks[stage - 1](
                    x[..., :cond_dim])
            hs = [h]
        else:
            h = x
            hs = []

        if self.use_stage_expert:
            input_blocks, middle_block, output_blocks, _ = (
                self.expert_trunks[stage])
        else:
            input_blocks, middle_block, output_blocks = (
                self.input_blocks, self.middle_block, self.output_blocks)

        for layers in input_blocks:
            for kind, mod in layers:
                h = self._run_layer(kind, mod, h, emb, context, h_cond,
                                    deterministic, spade_pre)
            hs.append(h)
        for kind, mod in middle_block:
            h = self._run_layer(kind, mod, h, emb, context, h_cond,
                                deterministic, spade_pre)
        for layers in output_blocks:
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for kind, mod in layers:
                h = self._run_layer(kind, mod, h, emb, context, h_cond,
                                    deterministic, spade_pre)

        if self.n_embed is not None:
            return self.id_predictor_conv(self.id_predictor_norm(h))
        if self.use_split_head:
            norm, conv = self.out_heads[stage]
            return conv(norm(h, fuse_silu=True))
        return self.out_conv(self.out_norm(h, fuse_silu=True))


def pyunet_from_config(params: Dict[str, Any], name: str = "diffusion_model"
                       ) -> PyUNetModel:
    """Build PyUNetModel from a reference-format unet_config ``params``."""
    p = dict(params)
    # remat is applied at train-step level (make_train_step(remat=True),
    # driven by this flag in main.py) rather than per-block
    p.pop("use_checkpoint", None)
    p.pop("use_fp16", None)        # dtype policy handled by caller
    p.pop("dims", None)
    return PyUNetModel(
        image_size=p["image_size"],
        in_channels=p["in_channels"],
        model_channels=p["model_channels"],
        out_channels=p["out_channels"],
        num_res_blocks=p["num_res_blocks"],
        attention_resolutions=tuple(p["attention_resolutions"]),
        dropout=p.get("dropout", 0),
        channel_mult=tuple(p.get("channel_mult", (1, 2, 4, 8))),
        conv_resample=p.get("conv_resample", True),
        num_classes=p.get("num_classes"),
        num_heads=p.get("num_heads", -1),
        num_head_channels=p.get("num_head_channels", -1),
        num_heads_upsample=p.get("num_heads_upsample", -1),
        use_scale_shift_norm=p.get("use_scale_shift_norm", False),
        use_embed=p.get("use_embed", False),
        num_stage=p.get("num_stage", 1),
        resblock_updown=p.get("resblock_updown", False),
        use_new_attention_order=p.get("use_new_attention_order", False),
        use_spatial_transformer=p.get("use_spatial_transformer", False),
        transformer_depth=p.get("transformer_depth", 1),
        context_dim=p.get("context_dim"),
        n_embed=p.get("n_embed"),
        legacy=p.get("legacy", True),
        use_split_head=p.get("use_split_head", False),
        split_embed_dim_list=tuple(p.get("split_embed_dim_list", ())),
        use_SPADE_norm=p.get("use_SPADE_norm", False),
        use_pos_embed=p.get("use_pos_embed", False),
        use_mscond=p.get("use_mscond", False),
        use_stage_expert=p.get("use_stage_expert", False),
        name=name,
    )
