"""Vector-quantization codebook lookup.

The hot op of the MS-VQGAN first stage
(``/root/reference/taming/modules/vqvae/quantize.py:267-308``): for every
latent vector find the nearest codebook entry by L2 distance and gather it.

The distance matrix ``|z|^2 + |e|^2 - 2 z.e^T`` is a single [N, D] x [D, K]
matmul — ideal MXU work — but the [N, K] distance tensor round-trips HBM;
the fused Pallas variant (tiled distance + running argmin in VMEM) in
``frido_tpu.ops.pallas.vq_pallas`` is selected automatically on TPU for
large N*K.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# distance tensor below this many f32 elements fits comfortably in cache /
# fusion buffers; the pallas kernel only wins above it
_PALLAS_MIN_NK = 1 << 22


def vq_distances(z_flat: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 distances [N, K] between z [N, D] and codebook [K, D]."""
    z32 = z_flat.astype(jnp.float32)
    e32 = codebook.astype(jnp.float32)
    d = (
        jnp.sum(z32**2, axis=1, keepdims=True)
        + jnp.sum(e32**2, axis=1)[None, :]
        - 2.0 * jnp.dot(z32, e32.T, preferred_element_type=jnp.float32)
    )
    return d


def vq_lookup(z: jnp.ndarray, codebook: jnp.ndarray):
    """Nearest-codebook quantization of an NHWC latent.

    Args:
      z: [..., D] latent (typically [B, H, W, D]).
      codebook: [K, D] embedding table.

    Returns:
      (z_q, indices): quantized latent of z's shape and int32 indices of
      shape z.shape[:-1].
    """
    from frido_tpu.ops.pallas import use_pallas, vq_argmin

    d = z.shape[-1]
    lead = z.shape[:-1]
    z_flat = z.reshape(-1, d)
    n, k = z_flat.shape[0], codebook.shape[0]
    if use_pallas() and n * k >= _PALLAS_MIN_NK:
        # argmin is piecewise-constant (zero tangent everywhere); cutting
        # the inputs' tangents states that exactly and keeps autodiff from
        # attempting a JVP of the Pallas kernel when a caller differentiates
        # through the quantizer (codebook/z grads flow via the take below
        # and the straight-through estimator, never through the argmin)
        idx = vq_argmin(jax.lax.stop_gradient(z_flat),
                        jax.lax.stop_gradient(codebook))
    else:
        dist = vq_distances(z_flat, codebook)
        idx = jnp.argmin(dist, axis=1)
    z_q = jnp.take(codebook, idx, axis=0).astype(z.dtype)
    return z_q.reshape(z.shape), idx.reshape(lead).astype(jnp.int32)
