"""Image resampling primitives (NHWC).

Semantics match the torch calls used throughout the reference:
``F.interpolate(mode='nearest')``, ``F.avg_pool2d(2, 2)``, ``F.pad``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interpolate_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample of an NHWC tensor.

    Equivalent to ``F.interpolate(x, scale_factor=2, mode='nearest')``
    (e.g. ``/root/reference/taming/models/msvqgan.py:150``).
    """
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def interpolate_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize to (H, W); matches
    ``F.interpolate(x, size=size, mode='nearest')`` — used by SPADE
    (``/root/reference/frido/modules/diffusionmodules/spade_norm.py:52``).

    torch nearest uses ``src = floor(dst * scale)`` with scale = in/out.
    """
    n, h, w, c = x.shape
    out_h, out_w = size
    if (out_h, out_w) == (h, w):
        return x
    rows = jnp.floor(jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    rows = jnp.clip(rows, 0, h - 1)
    cols = jnp.clip(cols, 0, w - 1)
    return x[:, rows][:, :, cols]


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """``F.avg_pool2d(x, 2, 2)`` on NHWC."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * 0.25


def pad_nhwc(x: jnp.ndarray, pad_h: tuple[int, int], pad_w: tuple[int, int],
             value: float = 0.0) -> jnp.ndarray:
    """Constant pad the spatial dims of an NHWC tensor.

    The taming Downsample uses asymmetric ``F.pad(x, (0,1,0,1))``
    (``/root/reference/taming/modules/diffusionmodules/model.py:68-72``),
    i.e. one extra row/col on the bottom/right.
    """
    return jnp.pad(
        x,
        ((0, 0), pad_h, pad_w, (0, 0)),
        mode="constant",
        constant_values=value,
    )
