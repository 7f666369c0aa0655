"""MS-VQGAN: multi-scale feature-pyramid VQGAN first stage.

Re-design of ``/root/reference/taming/models/msvqgan.py`` (MSFPNVQModel +
VQModelInterface) as a single flax module with two calling conventions:

* ``encode`` / ``decode`` — training semantics: per-scale quantization with
  cross-scale fusion, channel-stacked **[fine | coarse]** quantized latent
  (``msvqgan.py:116-159``).
* ``encode_interface`` / ``decode_interface`` — diffusion semantics: encode
  returns the **pre-quantization** per-scale latents upsampled to the finest
  grid and stacked **[coarse | fine]** (``msvqgan.py:326-374``, including the
  double-reverse); decode quantizes each channel block through its codebook,
  reverses the stack to [fine | coarse], then post_quant_conv + Decoder
  (``msvqgan.py:376-399``).

The channel-order asymmetry is load-bearing: the diffusion latent is
[coarse f16 | fine f8] (stage 0 == coarse == ``ms_quantize[0]``) while the
trained Decoder consumes [fine | coarse].
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from frido_tpu.nn.layers import Conv2d, ConvTranspose2d
from frido_tpu.nn.quantize import VectorQuantizer
from frido_tpu.nn.vqgan import Decoder, MSEncoder
from frido_tpu.ops.image import interpolate_nearest_2x


def _decoder_from_config(cfg: Dict[str, Any], name: str) -> Decoder:
    return Decoder(
        ch=cfg["ch"],
        ch_mult=tuple(cfg["ch_mult"]),
        num_res_blocks=cfg["num_res_blocks"],
        attn_resolutions=tuple(cfg["attn_resolutions"]),
        resolution=cfg["resolution"],
        z_channels=cfg["z_channels"],
        out_ch=cfg["out_ch"],
        dropout=cfg.get("dropout", 0.0),
        name=name,
    )


class MSVQGAN(nn.Module):
    """The MS-VQGAN network. Param paths mirror the torch attribute tree."""

    edconfig: Dict[str, Any]
    ddconfig: Dict[str, Any]
    n_embed: Sequence[int]
    embed_dim: Sequence[int]
    quant_beta: float = 0.25
    legacy: bool = True
    channel_range: Sequence[int] = ()

    def setup(self):
        ed = self.edconfig
        assert len(self.n_embed) == ed["multiscale"], (
            "multiscale mode: n_embed must have one entry per scale")
        assert len(self.n_embed) == len(self.embed_dim)
        self.encoder = MSEncoder(
            ch=ed["ch"],
            ch_mult=tuple(ed["ch_mult"]),
            num_res_blocks=ed["num_res_blocks"],
            attn_resolutions=tuple(ed["attn_resolutions"]),
            resolution=ed["resolution"],
            z_channels=tuple(ed["z_channels"]),
            in_channels=ed.get("in_channels", 3),
            double_z=ed.get("double_z", False),
            multiscale=ed["multiscale"],
            dropout=ed.get("dropout", 0.0),
            name="encoder",
        )
        self.decoder = _decoder_from_config(self.ddconfig, "decoder")

        n = len(self.n_embed)
        self.ms_quantize = [
            VectorQuantizer(self.n_embed[i], self.embed_dim[i],
                            beta=self.quant_beta, legacy=self.legacy,
                            name=f"ms_quantize__{i}")
            for i in range(n)
        ]
        self.ms_quant_conv = [
            Conv2d(self.embed_dim[i], 1, name=f"ms_quant_conv__{i}")
            for i in range(n)
        ]
        self.post_quant_conv = Conv2d(self.ddconfig["z_channels"], 1,
                                      name="post_quant_conv")

        # cross-scale fusion heads (msvqgan.py:77-87)
        ups, spqc, sdec = [], [], []
        for i in range(n - 1):
            ups.append(ConvTranspose2d(self.embed_dim[0], 4, 2, 1,
                                       name=f"upsample__{i}"))
            spqc.append(Conv2d(ed["z_channels"][0], 1,
                               name=f"shared_post_quant_conv__{i}"))
            sdec.append(Decoder(
                ch=128, ch_mult=(1,), num_res_blocks=2,
                attn_resolutions=(2, 4, 8, 16, 32, 64), resolution=256,
                z_channels=sum(self.embed_dim[: i + 2]),
                out_ch=self.embed_dim[0], dropout=0.0,
                name=f"shared_decoder__{i}"))
        self.upsample, self.shared_post_quant_conv, self.shared_decoder = (
            ups, spqc, sdec)

    # ---- shared pre-quant pipeline -------------------------------------
    def _fused_prequant(self, x: jnp.ndarray, deterministic: bool = True):
        """Run the encoder and cross-scale fusion; yield per-scale
        (pre-quant latent, quantized latent, loss, indices), coarsest first.
        """
        h_ms = self.encoder(x, deterministic)[::-1]  # coarse -> fine
        prev_h = []
        per_scale = []
        for ii in range(len(h_ms)):
            if prev_h:
                fused_inputs = []
                for j in range(ii):
                    prev_h[j] = self.upsample[ii - 1](prev_h[j])
                    prev_h[j] = self.shared_post_quant_conv[ii - 1](prev_h[j])
                    fused_inputs.append(prev_h[j])
                fused = jnp.concatenate(fused_inputs + [h_ms[ii]], axis=-1)
                fused = self.shared_decoder[ii - 1](fused, deterministic)
            else:
                fused = h_ms[ii]
            h = self.ms_quant_conv[ii](fused)
            quant, emb_loss, idx = self.ms_quantize[ii](h)
            per_scale.append((h, quant, emb_loss, idx))
            prev_h.append(quant)
        return per_scale

    # ---- training convention (MSFPNVQModel) ----------------------------
    def encode(self, x: jnp.ndarray, deterministic: bool = True):
        """Quantized encode: [fine | coarse] channel stack at the finest
        grid (``msvqgan.py:116-154``)."""
        per_scale = self._fused_prequant(x, deterministic)
        quants = [q for (_, q, _, _) in per_scale][::-1]  # fine -> coarse
        for i in range(len(quants)):
            for _ in range(i):
                quants[i] = interpolate_nearest_2x(quants[i])
        quant = jnp.concatenate(quants, axis=-1)
        emb_loss = sum(l for (_, _, l, _) in per_scale)
        indices = [idx for (_, _, _, idx) in per_scale]
        return quant, emb_loss, indices

    def decode(self, quant: jnp.ndarray, deterministic: bool = True):
        return self.decoder(self.post_quant_conv(quant), deterministic)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        quant, diff, indices = self.encode(x, deterministic)
        dec = self.decode(quant, deterministic)
        return dec, diff, indices

    def forward_with_aux(self, x: jnp.ndarray, deterministic: bool = True):
        """Training forward incl. the two aux decodes with one channel group
        zeroed (``msvqgan.py:166-179``)."""
        quant, diff, indices = self.encode(x, deterministic)
        fine_ch = quant.shape[-1] - self.embed_dim[-1]
        aux1 = quant.at[..., :fine_ch].set(0.0)   # keep coarse group only
        aux2 = quant.at[..., self.embed_dim[-1]:].set(0.0)  # keep fine group
        dec = self.decode(quant, deterministic)
        dec_aux = [self.decode(aux1, deterministic),
                   self.decode(aux2, deterministic)]
        return dec, dec_aux, diff, indices

    # ---- diffusion convention (VQModelInterface) -----------------------
    def encode_interface(self, x: jnp.ndarray, deterministic: bool = True):
        """Pre-quant per-scale latents, upsampled to the finest grid and
        stacked [coarse | fine] (``msvqgan.py:326-374``)."""
        per_scale = self._fused_prequant(x, deterministic)
        h_out = [h for (h, _, _, _) in per_scale]  # coarse -> fine
        if len(self.channel_range) == 2:
            lo = self.channel_range[0] // self.embed_dim[0]
            hi = self.channel_range[1] // self.embed_dim[0]
            h_out = h_out[lo:hi]
        h_out = h_out[::-1]  # fine -> coarse
        for i in range(len(h_out)):
            for _ in range(i):
                h_out[i] = interpolate_nearest_2x(h_out[i])
        h_out = h_out[::-1]  # back to coarse -> fine
        return jnp.concatenate(h_out, axis=-1)

    def decode_interface(self, h: jnp.ndarray, deterministic: bool = True,
                         return_code: bool = False):
        """Per-scale re-quantization then decode (``msvqgan.py:376-399``)."""
        blocks = []
        start = 0
        for i in range(len(self.embed_dim)):
            blocks.append(h[..., start:start + self.embed_dim[i]])
            start += self.embed_dim[i]
        quants, codes = [], []
        for ii, blk in enumerate(blocks):
            q, _, idx = self.ms_quantize[ii](blk)
            quants.append(q)
            codes.append(idx)
        quant = jnp.concatenate(quants[::-1], axis=-1)  # [fine | coarse]
        dec = self.decode(quant, deterministic)
        if return_code:
            return dec, codes
        return dec

    def quantize_latent(self, h: jnp.ndarray):
        """Quantize a [coarse|fine] diffusion latent in place (per-scale),
        used by quantize_denoised sampling."""
        blocks = []
        start = 0
        for i in range(len(self.embed_dim)):
            q, _, _ = self.ms_quantize[i](h[..., start:start + self.embed_dim[i]])
            blocks.append(q)
            start += self.embed_dim[i]
        return jnp.concatenate(blocks, axis=-1)


def msvqgan_from_config(params: Dict[str, Any], name: str = "first_stage_model") -> MSVQGAN:
    """Build MSVQGAN from a reference-format config node's ``params``."""
    return MSVQGAN(
        edconfig=dict(params["edconfig"]),
        ddconfig=dict(params["ddconfig"]),
        n_embed=tuple(params["n_embed"]),
        embed_dim=tuple(params["embed_dim"]),
        quant_beta=params.get("quant_beta", 0.25),
        legacy=params.get("legacy", True),
        channel_range=tuple(params.get("channel_range", ()) or ()),
        name=name,
    )


class _StandaloneWrapper:
    """Plain-python convenience wrapper: init/apply helpers around MSVQGAN
    for standalone (non-diffusion) use, e.g. MS-VQGAN training/eval CLIs."""

    def __init__(self, **params):
        self.ckpt_path = params.pop("ckpt_path", None)
        params.pop("lossconfig", None)
        params.pop("ignore_keys", None)
        params.pop("image_key", None)
        params.pop("colorize_nlabels", None)
        params.pop("monitor", None)
        params.pop("remap", None)
        params.pop("sane_index_shape", None)
        params.pop("on_vit", None)
        params.pop("use_aux_loss", None)
        params.pop("unsample_type", None)
        params.pop("init_normal", None)
        params.pop("fusion", None)
        self.module = msvqgan_from_config(params, name=None)
        self.config_params = params

    def init(self, rng, image_shape: Tuple[int, ...] = (1, 256, 256, 3)):
        import jax

        return self.module.init(rng, jnp.zeros(image_shape, jnp.float32))


class MSFPNVQModel(_StandaloneWrapper):
    """Training-convention entry point (config target
    ``taming.models.msvqgan.MSFPNVQModel``)."""


class VQModelInterface(_StandaloneWrapper):
    """Diffusion-convention entry point (config target
    ``taming.models.msvqgan.VQModelInterface``)."""
