"""Fused VQ nearest-codebook argmin Pallas kernel.

The hot op of MS-VQGAN (``/root/reference/taming/modules/vqvae/
quantize.py:279-284``): for N latent vectors find the L2-nearest of K
codebook entries. The jnp form materializes the [N, K] distance matrix in
HBM (N = B*64*64 latents, K up to 8192 -> hundreds of MB per decode); here
distances are computed one [bn, bk] VMEM tile at a time with a running
(min, argmin) carried across codebook blocks, so only the [N] index vector
ever reaches HBM.

``|z|^2`` is constant per row and dropped — argmin_k(|z|^2 + |e_k|^2 -
2 z.e_k) == argmin_k(|e_k|^2 - 2 z.e_k). The embedding gather stays outside
(XLA gather from HBM is optimal).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from frido_tpu.ops.pallas.dispatch import interpret_mode

_BIG = 1e30


def _vq_kernel(z_ref, e_ref, esq_ref, idx_ref, mind_ref, mini_ref,
               *, block_k: int, k_total: int):
    jk = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(jk == 0)
    def _init():
        mind_ref[...] = jnp.full_like(mind_ref, _BIG)
        mini_ref[...] = jnp.zeros_like(mini_ref)

    z = z_ref[...]          # [bn, d]
    e = e_ref[...]          # [bk, d]
    esq = esq_ref[...]      # [1, bk]

    # d(n, k) = |e_k|^2 - 2 z_n . e_k   (MXU matmul, f32)
    d = esq - 2.0 * jax.lax.dot_general(
        z, e, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bn, bk]
    if k_total % block_k != 0:  # mask codebook padding
        col = jk * block_k + jax.lax.broadcasted_iota(
            jnp.int32, d.shape, dimension=1)
        d = jnp.where(col < k_total, d, _BIG)

    cur_min = jnp.min(d, axis=1, keepdims=True)                 # [bn, 1]
    cur_idx = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None] + jk * block_k

    prev_min = mind_ref[:, :1]
    prev_idx = mini_ref[:, :1]
    better = cur_min < prev_min
    new_min = jnp.where(better, cur_min, prev_min)
    new_idx = jnp.where(better, cur_idx, prev_idx)
    mind_ref[...] = jnp.broadcast_to(new_min, mind_ref.shape)
    mini_ref[...] = jnp.broadcast_to(new_idx, mini_ref.shape)

    @pl.when(jk == nk - 1)
    def _finalize():
        idx_ref[...] = jnp.broadcast_to(mini_ref[:, :1], idx_ref.shape)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def vq_argmin(z_flat: jnp.ndarray, codebook: jnp.ndarray, *,
              block_n: int = 512, block_k: int = 8192) -> jnp.ndarray:
    """Index of the L2-nearest codebook row for each latent vector.

    Default blocks measured on v5e: bn=512/bk=8192 runs a whole production
    codebook in one VMEM pass, ~25% faster than the fused XLA form.

    Args:
      z_flat: [N, D] latents.
      codebook: [K, D] embedding table.

    Returns: int32 [N].
    """
    n, d = z_flat.shape
    k = codebook.shape[0]
    z32 = z_flat.astype(jnp.float32)
    e32 = codebook.astype(jnp.float32)
    esq = jnp.sum(e32 * e32, axis=1)[None, :]  # [1, K]

    bn = min(block_n, _round_up(n, 8))
    bk = min(block_k, _round_up(k, 128))
    n_pad = _round_up(n, bn)
    k_pad = _round_up(k, bk)
    if n_pad != n:
        z32 = jnp.pad(z32, ((0, n_pad - n), (0, 0)))
    if k_pad != k:
        e32 = jnp.pad(e32, ((0, k_pad - k), (0, 0)))
        esq = jnp.pad(esq, ((0, 0), (0, k_pad - k)))

    grid = (n_pad // bn, k_pad // bk)
    idx = pl.pallas_call(
        functools.partial(_vq_kernel, block_k=bk, k_total=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, d), lambda i, j: (i, 0)),
            pl.BlockSpec((bk, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, bk), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bn, 128), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((bn, 128), jnp.float32),
            pltpu.VMEM((bn, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k_pad * d,
            bytes_accessed=(z32.size + e32.size) * 4 + n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(z32, e32, esq)
    return idx[:n, 0]
