"""Single-scale first stages: VQModel / AutoencoderKL / IdentityFirstStage.

Re-design of ``/root/reference/frido/models/autoencoder.py:14-451``. No
shipped Frido config uses these (all use the multi-scale
``taming.models.msvqgan.*``), but they complete the LDM-compatible first
stage surface for single-scale experiments.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from frido_tpu.nn.distributions import DiagonalGaussianDistribution
from frido_tpu.nn.layers import Conv2d
from frido_tpu.nn.quantize import VectorQuantizer
from frido_tpu.nn.vqgan import Decoder, Encoder


def _enc_dec_from(ddconfig: Dict[str, Any]):
    enc = Encoder(
        ch=ddconfig["ch"], ch_mult=tuple(ddconfig["ch_mult"]),
        num_res_blocks=ddconfig["num_res_blocks"],
        attn_resolutions=tuple(ddconfig["attn_resolutions"]),
        resolution=ddconfig["resolution"], z_channels=ddconfig["z_channels"],
        in_channels=ddconfig.get("in_channels", 3),
        double_z=ddconfig.get("double_z", True),
        dropout=ddconfig.get("dropout", 0.0), name="encoder")
    dec = Decoder(
        ch=ddconfig["ch"], ch_mult=tuple(ddconfig["ch_mult"]),
        num_res_blocks=ddconfig["num_res_blocks"],
        attn_resolutions=tuple(ddconfig["attn_resolutions"]),
        resolution=ddconfig["resolution"], z_channels=ddconfig["z_channels"],
        out_ch=ddconfig.get("out_ch", 3),
        dropout=ddconfig.get("dropout", 0.0), name="decoder")
    return enc, dec


class VQModelModule(nn.Module):
    """Single-scale VQGAN (``autoencoder.py:14-118``)."""

    ddconfig: Dict[str, Any]
    n_embed: int
    embed_dim: int

    def setup(self):
        self.encoder, self.decoder = _enc_dec_from(self.ddconfig)
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim,
                                        beta=0.25, name="quantize")
        self.quant_conv = Conv2d(self.embed_dim, 1, name="quant_conv")
        self.post_quant_conv = Conv2d(self.ddconfig["z_channels"], 1,
                                      name="post_quant_conv")

    def encode(self, x, deterministic: bool = True):
        h = self.quant_conv(self.encoder(x, deterministic))
        return self.quantize(h)

    def encode_prequant(self, x, deterministic: bool = True):
        return self.quant_conv(self.encoder(x, deterministic))

    def decode(self, quant, deterministic: bool = True):
        return self.decoder(self.post_quant_conv(quant), deterministic)

    def __call__(self, x, deterministic: bool = True):
        quant, diff, idx = self.encode(x, deterministic)
        return self.decode(quant, deterministic), diff, idx

    # diffusion-interface semantics (autoencoder.py VQModelInterface):
    # encode returns pre-quant h; decode quantizes first
    def encode_interface(self, x, deterministic: bool = True):
        return self.encode_prequant(x, deterministic)

    def decode_interface(self, h, deterministic: bool = True,
                         force_not_quantize: bool = False):
        if not force_not_quantize:
            h, _, _ = self.quantize(h)
        return self.decode(h, deterministic)


class AutoencoderKLModule(nn.Module):
    """KL-VAE (``autoencoder.py:286-412``)."""

    ddconfig: Dict[str, Any]
    embed_dim: int

    def setup(self):
        assert self.ddconfig.get("double_z", True)
        self.encoder, self.decoder = _enc_dec_from(self.ddconfig)
        self.quant_conv = Conv2d(2 * self.embed_dim, 1, name="quant_conv")
        self.post_quant_conv = Conv2d(self.ddconfig["z_channels"], 1,
                                      name="post_quant_conv")

    def encode(self, x, deterministic: bool = True):
        moments = self.quant_conv(self.encoder(x, deterministic))
        return DiagonalGaussianDistribution(moments)

    def decode(self, z, deterministic: bool = True):
        return self.decoder(self.post_quant_conv(z), deterministic)

    def __call__(self, x, rng=None, sample_posterior: bool = True,
                 deterministic: bool = True):
        posterior = self.encode(x, deterministic)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z, deterministic), posterior


class _Wrapper:
    def __init__(self, **params):
        params.pop("ckpt_path", None)
        params.pop("lossconfig", None)
        params.pop("ignore_keys", None)
        params.pop("image_key", None)
        params.pop("colorize_nlabels", None)
        params.pop("monitor", None)
        self.config_params = params
        self.module = self._build(params)


class VQModel(_Wrapper):
    def _build(self, p):
        return VQModelModule(ddconfig=dict(p["ddconfig"]),
                             n_embed=p["n_embed"], embed_dim=p["embed_dim"])


class VQModelInterface(VQModel):
    pass


class AutoencoderKL(_Wrapper):
    def _build(self, p):
        return AutoencoderKLModule(ddconfig=dict(p["ddconfig"]),
                                   embed_dim=p["embed_dim"])


class IdentityFirstStage:
    """``autoencoder.py:415-451``: pass-through first stage."""

    def __init__(self, *a, vq_interface: bool = False, **k):
        self.vq_interface = vq_interface

    def encode(self, x):
        return x

    def decode(self, x):
        return x

    def quantize(self, x):
        if self.vq_interface:
            return x, None, [None, None, None]
        return x

    def __call__(self, x):
        return x
