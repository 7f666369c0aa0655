"""Codebook vector quantizer (flax).

Re-design of ``VectorQuantizer2``
(``/root/reference/taming/modules/vqvae/quantize.py:206-325``) for NHWC
latents: the distance matrix is one MXU matmul, the straight-through
estimator is baked into the returned latent, and both commitment-loss
conventions (legacy / fixed beta) are supported.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from frido_tpu.nn.layers import Embed
from frido_tpu.ops.vq import vq_lookup


class VectorQuantizer(nn.Module):
    n_e: int
    e_dim: int
    beta: float = 0.25
    legacy: bool = True

    def setup(self):
        # torch key: embedding.weight (quantize.py:222-226)
        self.embedding = Embed(self.n_e, self.e_dim, name="embedding")

    def __call__(self, z: jnp.ndarray):
        """Quantize an [..., e_dim] latent.

        Returns (z_q, loss, indices), mirroring ``quantize.py:267-308``.
        """
        codebook = self.embedding.embedding
        z_q, idx = vq_lookup(z, codebook)

        z32 = z.astype(jnp.float32)
        zq32 = z_q.astype(jnp.float32)
        codebook_term = jnp.mean((jax.lax.stop_gradient(zq32) - z32) ** 2)
        commit_term = jnp.mean((zq32 - jax.lax.stop_gradient(z32)) ** 2)
        if self.legacy:
            loss = codebook_term + self.beta * commit_term
        else:
            loss = self.beta * codebook_term + commit_term

        z_q = z + jax.lax.stop_gradient(z_q - z)  # straight-through
        return z_q, loss, idx

    def get_codebook_entry(self, indices: jnp.ndarray) -> jnp.ndarray:
        return self.embedding(indices)


class GumbelQuantize(nn.Module):
    """Gumbel-softmax relaxed quantizer
    (``quantize.py:103-203``; unused by shipped configs, kept for the
    component inventory). Soft codebook mixture in training, hard argmax in
    eval; KL-to-uniform regularizer weighted by ``kl_weight``."""

    n_e: int          # codebook size
    e_dim: int        # embedding dim
    num_hiddens: int  # input channels to the logit projection
    straight_through: bool = True
    kl_weight: float = 5e-4
    temperature: float = 1.0

    def setup(self):
        from frido_tpu.nn.layers import Conv2d

        self.proj = Conv2d(self.n_e, 1, name="proj")
        self.embed = Embed(self.n_e, self.e_dim, name="embed")

    def __call__(self, z: jnp.ndarray, deterministic: bool = True,
                 temperature: float | None = None):
        temp = self.temperature if temperature is None else temperature
        logits = self.proj(z)  # [..., n_e]
        if deterministic:
            idx = jnp.argmax(logits, axis=-1)
            one_hot = jax.nn.one_hot(idx, self.n_e, dtype=z.dtype)
        else:
            rng = self.make_rng("gumbel")
            g = jax.random.gumbel(rng, logits.shape, logits.dtype)
            soft = jax.nn.softmax((logits + g) / temp, axis=-1)
            idx = jnp.argmax(soft, axis=-1)
            if self.straight_through:
                hard = jax.nn.one_hot(idx, self.n_e, dtype=soft.dtype)
                one_hot = hard + soft - jax.lax.stop_gradient(soft)
            else:
                one_hot = soft
        z_q = jnp.einsum("...k,kd->...d", one_hot, self.embed.embedding)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        kl = self.kl_weight * jnp.mean(
            jnp.sum(probs * jnp.log(probs * self.n_e + 1e-10), axis=-1))
        return z_q, kl, idx.astype(jnp.int32)

    def get_codebook_entry(self, indices: jnp.ndarray) -> jnp.ndarray:
        return self.embed(indices)


class EMAVectorQuantizer(nn.Module):
    """Codebook maintained by exponential moving averages of cluster
    assignments instead of gradients (``quantize.py:357-430``; unused by
    shipped configs). EMA state lives in the ``ema`` variable collection;
    it mutates only when the collection is marked mutable (training)."""

    n_e: int
    e_dim: int
    beta: float = 0.25
    decay: float = 0.99
    eps: float = 1e-5

    def setup(self):
        init = nn.initializers.normal(0.02)
        self.embedding = self.variable(
            "ema", "embedding", init, self.make_rng("params")
            if self.is_initializing() else None, (self.n_e, self.e_dim))
        self.cluster_size = self.variable(
            "ema", "cluster_size", jnp.zeros, (self.n_e,))
        self.embed_avg = self.variable(
            "ema", "embed_avg", lambda: self.embedding.value.copy())

    def __call__(self, z: jnp.ndarray, deterministic: bool = True):
        codebook = self.embedding.value
        z_q, idx = vq_lookup(z, codebook)

        if not deterministic and not self.is_initializing():
            flat = z.reshape(-1, self.e_dim).astype(jnp.float32)
            one_hot = jax.nn.one_hot(idx.reshape(-1), self.n_e,
                                     dtype=jnp.float32)
            counts = one_hot.sum(axis=0)
            sums = one_hot.T @ flat
            d = self.decay
            self.cluster_size.value = (
                d * self.cluster_size.value + (1 - d) * counts)
            self.embed_avg.value = d * self.embed_avg.value + (1 - d) * sums
            n = self.cluster_size.value.sum()
            smoothed = ((self.cluster_size.value + self.eps)
                        / (n + self.n_e * self.eps) * n)
            self.embedding.value = self.embed_avg.value / smoothed[:, None]

        commit = self.beta * jnp.mean(
            (z.astype(jnp.float32)
             - jax.lax.stop_gradient(z_q.astype(jnp.float32))) ** 2)
        z_q = z + jax.lax.stop_gradient(z_q - z)
        return z_q, commit, idx

    def get_codebook_entry(self, indices: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.embedding.value, indices, axis=0)
