"""Tiled (patched) application of spatial ops — the TPU redesign of the
reference's fold/unfold convolutional sampling
(``/root/reference/frido/models/diffusion/frido.py:714-764,840-877,
1076-1160``, enabled by ``split_input_params``; used to run the UNet /
first stage on images larger than the training resolution).

The torch version materializes every patch via ``F.unfold`` (a [B, C*ks*ks,
L] gather) and re-folds with a normalization map. Here tile positions are
static (config ks/stride + input shape), each tile is a static slice — XLA
sees a fixed small loop of fixed-shape calls — and the overlap
normalization map is precomputed once per shape.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax.numpy as jnp


def tile_positions(size: int, ks: int, stride: int) -> List[int]:
    """Static 1-D tile starts covering [0, size) — last tile is clamped
    flush to the edge so the whole extent is covered."""
    if ks >= size:
        return [0]
    pos = list(range(0, size - ks + 1, stride))
    if pos[-1] != size - ks:
        pos.append(size - ks)
    return pos


def tiled_apply(fn: Callable[[jnp.ndarray], jnp.ndarray], x: jnp.ndarray,
                ks: Tuple[int, int], stride: Tuple[int, int],
                out_ch: int | None = None,
                scale: int = 1) -> jnp.ndarray:
    """Apply ``fn`` per overlapping tile and blend by overlap count.

    Args:
      fn: [B, ks_h, ks_w, C] -> [B, ks_h*scale, ks_w*scale, out_ch].
      x: [B, H, W, C].
      ks / stride: tile size and step in input pixels.
      out_ch: output channels (defaults to input channels).
      scale: spatial scale of fn's output (e.g. vqf for a latent decoder).

    Returns [B, H*scale, W*scale, out_ch].
    """
    import jax

    b, h, w, c = x.shape
    kh, kw = ks
    sh, sw = stride
    if out_ch is None:  # infer from fn without running it
        out_ch = jax.eval_shape(
            fn, jax.ShapeDtypeStruct((b, kh, kw, c), x.dtype)).shape[-1]
    oc = out_ch
    ys = tile_positions(h, kh, sh)
    xs = tile_positions(w, kw, sw)

    out = jnp.zeros((b, h * scale, w * scale, oc), jnp.float32)
    norm = jnp.zeros((h * scale, w * scale, 1), jnp.float32)
    for y0 in ys:
        for x0 in xs:
            tile = x[:, y0:y0 + kh, x0:x0 + kw, :]
            res = fn(tile).astype(jnp.float32)
            oy, ox = y0 * scale, x0 * scale
            oh, ow = kh * scale, kw * scale
            out = out.at[:, oy:oy + oh, ox:ox + ow, :].add(res)
            norm = norm.at[oy:oy + oh, ox:ox + ow, :].add(1.0)
    return (out / norm[None]).astype(x.dtype)
