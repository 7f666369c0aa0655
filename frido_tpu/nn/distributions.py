"""Diagonal Gaussian posterior for KL-VAE first stages.

Re-design of ``/root/reference/frido/modules/distributions/distributions.py``
as pure functions over NHWC moment tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class DiagonalGaussianDistribution:
    def __init__(self, parameters: jnp.ndarray, deterministic: bool = False):
        self.parameters = parameters
        self.mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)
        if deterministic:
            self.std = jnp.zeros_like(self.mean)
            self.var = jnp.zeros_like(self.mean)

    def sample(self, rng) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self, other: "DiagonalGaussianDistribution | None" = None):
        if self.deterministic:
            return jnp.zeros(())
        if other is None:
            return 0.5 * jnp.sum(
                self.mean**2 + self.var - 1.0 - self.logvar, axis=(1, 2, 3))
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var - 1.0 - self.logvar + other.logvar,
            axis=(1, 2, 3))

    def nll(self, sample, dims=(1, 2, 3)):
        if self.deterministic:
            return jnp.zeros(())
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=dims)


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two gaussians (``distributions.py:79-92``)."""
    return 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))
