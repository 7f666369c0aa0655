"""PatchGAN discriminator (Pix2Pix NLayerDiscriminator).

Re-design of ``/root/reference/taming/modules/discriminator/model.py:17-67``
with torch-matching key layout ``main.{i}.*`` and BatchNorm running stats in
a flax ``batch_stats`` collection.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from frido_tpu.nn.layers import Conv2d


class TorchBatchNorm(nn.Module):
    """BatchNorm2d over NHWC channels: batch stats in training, running
    stats at eval; params scale/bias, running mean/var in `batch_stats`."""

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.normal(0.02), (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "running_mean",
                                lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "running_var",
                               lambda: jnp.ones((c,)))
        if train:
            mean = x.mean(axis=(0, 1, 2))
            var = x.var(axis=(0, 1, 2))
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value \
                    + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value \
                    + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias


class ActNorm(nn.Module):
    """Per-channel affine with data-dependent init
    (``/root/reference/taming/modules/util.py:10-93``, the discriminator's
    ``use_actnorm`` variant; the logdet path is flow-only and unused here).

    Torch initializes loc/scale from the first training batch and then
    freezes them behind an ``initialized`` flag; the JAX equivalent is to
    compute them from the batch ``module.init`` sees — params are
    immutable afterwards, which IS the post-first-batch torch behavior.
    For that to hold, callers must init with REAL images
    (``create_vqgan_train_state(sample_images=...)``); a constant init
    batch (e.g. ``jnp.zeros``) has zero std, where 1/std would start the
    discriminator at a ~1e6 per-layer gain — that case falls back to the
    identity transform (loc=0, scale=1) instead. Torch ckpt leaves
    ``loc``/``scale`` [1, C, 1, 1] import as flat [C] (see
    ``convert_leaf``).
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        # torch .std() is unbiased (ddof=1)
        std = jnp.std(x, axis=(0, 1, 2), ddof=1)
        real = std > 1e-5  # constant init batch -> identity, not 1/0
        loc = self.param("loc", lambda rng: jnp.where(
            real, -jnp.mean(x, axis=(0, 1, 2)), 0.0))
        scale = self.param("scale_v", lambda rng: jnp.where(
            real, 1.0 / (std + 1e-6), 1.0))
        return scale * (x + loc)


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False

    def setup(self):
        kw, padw = 4, 1
        # pix2pix: convs keep their bias with ActNorm, drop it with BN
        # (model.py:28-33)
        norm = (lambda name: ActNorm(name=name)) if self.use_actnorm \
            else (lambda name: TorchBatchNorm(name=name))
        bias = self.use_actnorm
        layers = []  # (conv, norm_or_None, torch_index)
        idx = 0
        layers.append((Conv2d(self.ndf, kw, stride=2, padding=padw,
                              name=f"main__{idx}"), None))
        idx += 2  # conv + leaky
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            layers.append((
                Conv2d(self.ndf * nf_mult, kw, stride=2, padding=padw,
                       use_bias=bias, name=f"main__{idx}"),
                norm(f"main__{idx + 1}")))
            idx += 3
        nf_mult = min(2 ** self.n_layers, 8)
        layers.append((
            Conv2d(self.ndf * nf_mult, kw, stride=1, padding=padw,
                   use_bias=bias, name=f"main__{idx}"),
            norm(f"main__{idx + 1}")))
        idx += 3
        layers.append((Conv2d(1, kw, stride=1, padding=padw,
                              name=f"main__{idx}"), None))
        self.layers = layers

    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        n_total = len(self.layers)
        for i, (conv, norm) in enumerate(self.layers):
            x = conv(x)
            if norm is not None:
                x = norm(x, train=train)
            if i < n_total - 1:
                x = jax.nn.leaky_relu(x, 0.2)
        return x
