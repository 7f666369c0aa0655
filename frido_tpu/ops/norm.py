"""GroupNorm with torch-matching semantics on NHWC tensors.

Two epsilon conventions coexist in the reference and both matter for
checkpoint fidelity:

* taming/CompVis ``Normalize`` -> ``nn.GroupNorm(32, C, eps=1e-6)``
  (``/root/reference/taming/modules/diffusionmodules/model.py:34-35``)
* guided-diffusion ``normalization`` -> ``GroupNorm32(32, C)`` with the torch
  default ``eps=1e-5`` and an fp32 compute cast
  (``/root/reference/frido/modules/diffusionmodules/util.py:199-216``)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-6,
    cast_fp32: bool = True,
    fuse_silu: bool = False,
) -> jnp.ndarray:
    """Normalize an NHWC (or N...C) tensor over (spatial, group-channel) dims.

    ``cast_fp32=True`` reproduces GroupNorm32's ``x.float()`` upcast so bf16
    activations are normalized in fp32 and cast back. ``fuse_silu`` appends
    SiLU.

    Dispatch (round 4): the Pallas GN+SiLU kernel won its standalone
    microbenches (0.57 vs 0.68 ms at 64x32^2x320) but LOSES in-program at
    the production config — with every Pallas kernel disabled the t2i
    headline measured 3.40 vs 2.97 img/s (docs/r4_chip/), the same
    custom-call + boundary-layout-copy tax that retired the smalls
    attention kernel. XLA fuses the normalize+SiLU into the consumer conv
    and only the statistics stay separate (made lane-aligned in
    ``group_norm_jnp``), so XLA is the default; ``FRIDO_GN_PALLAS=1``
    opts the kernel back in for shapes where a standalone-norm workload
    dominates."""
    import os

    from frido_tpu.ops.pallas import use_pallas
    from frido_tpu.ops.pallas.norm_pallas import (fits_pallas_gn,
                                                  group_norm_pallas)

    hw = 1
    for s in x.shape[1:-1]:
        hw *= s
    if (os.environ.get("FRIDO_GN_PALLAS", "0") == "1" and use_pallas()
            and hw >= 256 and fits_pallas_gn(x.shape)):
        return group_norm_pallas(x, scale, bias, num_groups, eps, fuse_silu)
    return group_norm_jnp(x, scale, bias, num_groups, eps, cast_fp32,
                          fuse_silu)


def group_norm_jnp(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-6,
    cast_fp32: bool = True,
    fuse_silu: bool = False,
) -> jnp.ndarray:
    """Pure jnp GroupNorm — never dispatches to Pallas. This is the form
    the Pallas kernel's custom_vjp recomputes in its backward; routing it
    through the dispatcher would nest kernels unboundedly under
    grad-of-grad (e.g. the GAN adaptive weight)."""
    import os

    orig_dtype = x.dtype
    # Native-dtype reads for the bf16 path (round 5): the GroupNorm32-style
    # ``x.astype(f32)`` upcast BEFORE the stats/apply makes XLA materialize
    # an fp32 copy of the activation (the convert fuses into the producer
    # conv's epilogue, so the conv writes 2x the bytes and both the stats
    # and the apply re-read them at 2x) — the round-5 train-step trace
    # shows the frozen-encoder 256^2 stat fusions reading f32 (512-768
    # MiB/site at ~220 GB/s realized, docs/r5_chip/profile_train_b16_
    # step.txt). Instead keep x in its native dtype: the stats accumulate
    # in fp32 FROM bf16 reads (sum(dtype=f32); square via an exact
    # bf16->f32 convert that fuses into the reduce), and the apply's
    # promotion (bf16 x times f32 scale) converts x inline inside the
    # multiply-add fusion — the math is still fp32 end-to-end (converts
    # are exact), only the HBM reads shrink to native width. fp32 inputs
    # are bit-exact unchanged. Off until measured in-program (the round-4
    # standard); opt in via FRIDO_GN_STATS_NATIVE=1.
    native_stats = (
        cast_fp32 and x.dtype != jnp.float32
        and os.environ.get("FRIDO_GN_STATS_NATIVE", "0") == "1")
    if cast_fp32 and not native_stats:
        x = x.astype(jnp.float32)
    shape = x.shape
    n, c = shape[0], shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    cg = c // num_groups
    # One-pass statistics: E[x] and E[x^2] reduce over the SAME input, so
    # XLA multi-output-fuses them into a single read of x (jnp.var's
    # two-pass form costs an extra full activation read per site).
    #
    # Lane-aligned reduction order: reduce spatial dims in the natural
    # [..., C] layout to per-channel sums [N, C], THEN group-reduce the
    # tiny result. Reshaping to [..., G, C/G] before the big reduce (the
    # obvious form) puts C/G = 6..30 channels in the minor/lane dim, and
    # the round-4 device trace measured those stats fusions at only
    # ~145 GB/s realized (docs/PERF.md) — lane-padding waste on a
    # bandwidth-bound op. The group reduce on [N, C] is O(N*C) and free.
    spatial_axes = tuple(range(1, len(shape) - 1))
    count = cg
    for s in shape[1:-1]:
        count *= s
    if native_stats:
        s1 = jnp.sum(x, axis=spatial_axes, dtype=jnp.float32)  # [N, C]
        s2 = jnp.sum(jnp.square(x.astype(jnp.float32)),
                     axis=spatial_axes)                        # [N, C]
    else:
        s1 = x.sum(axis=spatial_axes)        # [N, C]
        s2 = (x * x).sum(axis=spatial_axes)  # [N, C]
    mean = s1.reshape(n, num_groups, cg).sum(-1) / count   # [N, G]
    m2 = s2.reshape(n, num_groups, cg).sum(-1) / count
    var = jnp.maximum(m2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)                         # [N, G]
    # fold the group stats and the affine into per-channel vectors so the
    # apply is a single fused multiply-add over x
    inv_c = jnp.broadcast_to(inv[:, :, None], (n, num_groups, cg)) \
        .reshape(n, c)
    mean_c = jnp.broadcast_to(mean[:, :, None], (n, num_groups, cg)) \
        .reshape(n, c)
    # stat/affine math stays fp32 whenever cast_fp32 asked for it (the
    # [N, C] vectors are tiny); only the big-tensor apply reads x native
    stat_dtype = jnp.float32 if cast_fp32 else x.dtype
    w = inv_c * scale.astype(stat_dtype)[None, :]          # [N, C]
    b = bias.astype(stat_dtype)[None, :] - mean_c * w
    bshape = (n,) + (1,) * len(spatial_axes) + (c,)
    x = x * w.reshape(bshape) + b.reshape(bshape)
    if fuse_silu:
        x = jax.nn.silu(x)
    return x.astype(orig_dtype) if cast_fp32 else x
