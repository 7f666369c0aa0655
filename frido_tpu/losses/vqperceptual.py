"""VQ-GAN training loss: L1 + LPIPS + PatchGAN with adaptive weight.

Re-design of ``/root/reference/taming/modules/losses/vqperceptual.py:37-150``
(the variant all shipped msvqgan configs use). The adaptive generator weight
``|grad nll| / |grad g|`` w.r.t. the decoder's last conv kernel
(``vqperceptual.py:67-78``) is computed with ``jax.grad`` over that single
leaf inside the jitted step — see ``frido_tpu.training.vqgan_trainer``.
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from frido_tpu.losses.discriminator import NLayerDiscriminator
from frido_tpu.losses.lpips import LPIPS, lpips_available


class DummyLoss:
    """Placeholder loss (``vqperceptual.py:11-13``) — used whenever the
    first stage is frozen under the diffusion model."""

    def __init__(self, *a, **k):
        pass


def adopt_weight(weight, global_step, threshold=0, value=0.0):
    return jnp.where(global_step < threshold, value, weight)


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - logits_real))
                  + jnp.mean(jax.nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


class VQLPIPSWithDiscriminatorModule(nn.Module):
    """flax module holding the discriminator (+ LPIPS when weights exist)."""

    disc_in_channels: int = 3
    disc_num_layers: int = 3
    disc_ndf: int = 64
    use_lpips: bool = True
    use_actnorm: bool = False

    def setup(self):
        self.discriminator = NLayerDiscriminator(
            input_nc=self.disc_in_channels, ndf=self.disc_ndf,
            n_layers=self.disc_num_layers, use_actnorm=self.use_actnorm,
            name="discriminator")
        if self.use_lpips:
            self.perceptual_loss = LPIPS(name="perceptual_loss")

    def disc(self, x, train=True):
        return self.discriminator(x, train=train)

    def perceptual(self, x, y):
        assert self.use_lpips
        return self.perceptual_loss(x, y)


class VQLPIPSWithDiscriminator:
    """Config-facing wrapper: hyperparameters + the flax module. The loss
    arithmetic lives in ``frido_tpu.training.vqgan_trainer`` where the
    generator/discriminator phases and adaptive weight are assembled."""

    def __init__(self, disc_start, codebook_weight=1.0, pixelloss_weight=1.0,
                 disc_num_layers=3, disc_in_channels=3, disc_factor=1.0,
                 disc_weight=1.0, perceptual_weight=1.0, use_actnorm=False,
                 disc_conditional=False, disc_ndf=64, disc_loss="hinge",
                 aux_downscale=4.0, aux_loss_weight=(1.0, 0.0)):
        assert disc_loss in ("hinge", "vanilla")
        self.disc_start = disc_start
        self.codebook_weight = codebook_weight
        self.pixel_weight = pixelloss_weight
        self.disc_factor = disc_factor
        self.discriminator_weight = disc_weight
        self.perceptual_weight = perceptual_weight
        self.disc_conditional = disc_conditional
        self.disc_loss = hinge_d_loss if disc_loss == "hinge" else vanilla_d_loss
        self.aux_loss_weight = list(aux_loss_weight)
        self.use_lpips = self.perceptual_weight > 0 and lpips_available()
        if self.perceptual_weight > 0 and not self.use_lpips:
            warnings.warn(
                "LPIPS weights unavailable (set FRIDO_TPU_VGG16 / "
                "FRIDO_TPU_LPIPS); training with perceptual_weight=0.")
        self.module = VQLPIPSWithDiscriminatorModule(
            disc_in_channels=disc_in_channels,
            disc_num_layers=disc_num_layers, disc_ndf=disc_ndf,
            use_lpips=self.use_lpips, use_actnorm=use_actnorm)

    def init_params(self, rng, image_shape=(1, 64, 64, 3),
                    sample_images=None):
        x = (jnp.asarray(sample_images) if sample_images is not None
             else jnp.zeros(image_shape))

        def init_all(mod, x):
            out = [mod.disc(x)]
            if self.use_lpips:
                out.append(mod.perceptual(x, x))
            return out

        return self.module.init(rng, x, method=init_all)

    # --- pieces used by the trainer -----------------------------------
    def nll_loss(self, variables, inputs, recons, xrec_aux=None):
        rec = jnp.abs(inputs - recons)
        p_loss = jnp.zeros(())
        if self.use_lpips:
            p = self.module.apply(variables, inputs, recons,
                                  method="perceptual")
            rec = rec + self.perceptual_weight * p
            p_loss = p.mean()
        aux_loss = jnp.zeros(())
        if xrec_aux is not None:
            for ii, xa in enumerate(xrec_aux):
                aux_loss = aux_loss + jnp.mean(
                    jnp.abs(inputs - xa)) * self.aux_loss_weight[ii]
            rec = rec + 0.5 * aux_loss
        return rec.mean(), {"rec_loss": rec.mean(), "p_loss": p_loss,
                            "rec_aux_loss": aux_loss}

    def logits(self, variables, x, train=True):
        out, updates = self.module.apply(
            variables, x, train, method="disc", mutable=["batch_stats"])
        return out, updates
