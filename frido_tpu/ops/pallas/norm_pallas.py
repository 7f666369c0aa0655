"""Fused GroupNorm(+SiLU) Pallas kernel.

GroupNorm dominates the non-matmul time of the PyUNet/VQGAN res-blocks:
the jnp formulation reshapes NHWC to [..., G, C/G] (a 10-lane minor dim for
C=320/G=32 — hostile to TPU tiling) and runs multiple HBM passes; measured
~97 GB/s effective on the UNet shapes. This kernel does one read + one
write per sample block:

  * group sums via an MXU matmul against a [C, G] one-hot matrix (no
    reshape, lanes stay on C),
  * normalize + affine + optional SiLU in VMEM, fp32 math (GroupNorm32
    semantics, ``/root/reference/frido/modules/diffusionmodules/
    util.py:199-216``), cast back on store.

Grid is over the batch; one sample's [HW, C] must fit VMEM, which holds for
every latent-space GN in the UNet (<= 64x64x320). Larger decoder
activations fall back to the jnp form via the dispatch in
``frido_tpu.ops.norm``.

Backward: custom_vjp recomputing the jnp reference (one extra forward;
training GNs are a small fraction of the step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from frido_tpu.ops.pallas.dispatch import interpret_mode

# per-sample f32 bytes that must fit VMEM (x + y + slack)
_VMEM_SAMPLE_BUDGET = 4 * 1024 * 1024


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int,
               eps: float, fuse_silu: bool):
    x = x_ref[...].astype(jnp.float32)          # [bb, HW, C]
    bb, hw, c = x.shape
    cpg = c // groups
    cids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    onehot = (cids // cpg == gids).astype(jnp.float32)  # [C, G]

    n = hw * cpg
    # reduce HW on the VPU first, then a tiny [bb, C] x [C, G] matmul
    xs = jnp.sum(x, axis=1)                                 # [bb, C]
    xs2 = jnp.sum(x * x, axis=1)                            # [bb, C]
    s1 = jax.lax.dot_general(
        xs, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [bb, G]
    s2 = jax.lax.dot_general(
        xs2, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [bb, G]
    mean = s1 / n
    var = s2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)                          # [bb, G]

    mean_c = jax.lax.dot_general(                            # [bb, C]
        mean, onehot, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot_general(
        inv, onehot, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    scale = scale_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)
    a = inv_c * scale[None, :]                               # [bb, C]
    b = bias[None, :] - mean_c * a
    y = x * a[:, None, :] + b[:, None, :]
    if fuse_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.astype(o_ref.dtype)


def fits_pallas_gn(shape) -> bool:
    """One sample (fp32 in + out) must fit the VMEM budget."""
    per_sample = 1
    for s in shape[1:]:
        per_sample *= s
    return per_sample * 4 * 2 <= _VMEM_SAMPLE_BUDGET


def _gn_forward(x, scale, bias, num_groups, eps, fuse_silu, interpret):
    shape = x.shape
    b = shape[0]
    c = shape[-1]
    hw = 1
    for s in shape[1:-1]:
        hw *= s
    x3 = x.reshape(b, hw, c)
    # samples per grid step: enough VMEM work to hide pipeline overhead
    per_sample = hw * c * 4 * 2
    bb = max(1, min(b, _VMEM_SAMPLE_BUDGET // per_sample))
    while b % bb:
        bb -= 1
    out = pl.pallas_call(
        functools.partial(_gn_kernel, groups=num_groups, eps=eps,
                          fuse_silu=fuse_silu),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, hw, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hw * c * num_groups,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * hw * c if fuse_silu else 0,
        ),
        interpret=interpret,
    )(x3, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(shape)


def _reference_gn(x, scale, bias, num_groups, eps, fuse_silu):
    # MUST be the dispatch-free jnp form: this runs inside the kernel's
    # backward, and re-entering the dispatcher would nest custom_vjps
    # unboundedly under higher-order grad (GAN adaptive weight)
    from frido_tpu.ops.norm import group_norm_jnp

    return group_norm_jnp(x, scale, bias, num_groups=num_groups, eps=eps,
                          cast_fp32=True, fuse_silu=fuse_silu)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm_pallas(x, scale, bias, num_groups: int = 32,
                      eps: float = 1e-6, fuse_silu: bool = False):
    """Fused GroupNorm(32-style fp32 math)(+SiLU) on NHWC tensors."""
    return _gn_forward(x, scale, bias, num_groups, eps, fuse_silu,
                       interpret=interpret_mode())


def _gn_fwd(x, scale, bias, num_groups, eps, fuse_silu):
    return group_norm_pallas(x, scale, bias, num_groups, eps,
                             fuse_silu), (x, scale, bias)


def _gn_bwd(num_groups, eps, fuse_silu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda a, s, b: _reference_gn(a, s, b, num_groups, eps, fuse_silu),
        x, scale, bias)
    return vjp(g)


group_norm_pallas.defvjp(_gn_fwd, _gn_bwd)
