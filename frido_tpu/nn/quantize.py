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
