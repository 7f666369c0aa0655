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
    SiLU (fused into the Pallas kernel on TPU; measured faster than XLA's
    GN when the spatial extent is >= 16x16)."""
    from frido_tpu.ops.pallas import use_pallas
    from frido_tpu.ops.pallas.norm_pallas import (fits_pallas_gn,
                                                  group_norm_pallas)

    hw = 1
    for s in x.shape[1:-1]:
        hw *= s
    if use_pallas() and hw >= 256 and fits_pallas_gn(x.shape):
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
    orig_dtype = x.dtype
    if cast_fp32:
        x = x.astype(jnp.float32)
    shape = x.shape
    c = shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    group_shape = shape[:-1] + (num_groups, c // num_groups)
    xg = x.reshape(group_shape)
    # reduce over all dims except batch and group
    axes = tuple(range(1, len(group_shape) - 2)) + (len(group_shape) - 1,)
    # One-pass statistics: E[x] and E[x^2] reduce over the SAME input, so
    # XLA multi-output-fuses them into a single read of x. jnp.var's
    # two-pass form costs an extra full activation read per site — the
    # round-4 step profile measured the stats fusions at ~7 ms of the
    # 60 ms stage call (docs/PERF.md). Cancellation in E[x^2] - mean^2 is
    # benign here: stats are fp32 and GN inputs are O(1) activations
    # (golden parity suites pin the numerics).
    mean = xg.mean(axis=axes, keepdims=True)
    m2 = (xg * xg).mean(axis=axes, keepdims=True)
    var = jnp.maximum(m2 - mean * mean, 0.0)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(shape)
    x = x * scale.astype(x.dtype) + bias.astype(x.dtype)
    if fuse_silu:
        x = jax.nn.silu(x)
    return x.astype(orig_dtype) if cast_fp32 else x
