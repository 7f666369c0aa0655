"""Primitive layers with exact torch semantics, NHWC layout.

Parameter shapes are chosen for TPU friendliness; the torch importer
(``frido_tpu.io.torch_import``) performs the OIHW->HWIO style conversions:

* ``Conv2d.kernel``  [kH, kW, Cin, Cout]  <- torch [Cout, Cin, kH, kW]
* ``Conv1d.kernel``  [k, Cin, Cout]       <- torch [Cout, Cin, k]
* ``Dense.kernel``   [in, out]            <- torch [out, in] (transposed)
* ``ConvTranspose2d.kernel_t`` [kH, kW, Cin, Cout]
  <- torch [Cin, Cout, kH, kW] spatially flipped (see class docstring)
* norm layers use ``scale``/``bias``; ``Embed`` uses ``embedding``
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from frido_tpu.ops.norm import group_norm

Dtype = Any


def silu(x: jnp.ndarray) -> jnp.ndarray:
    """swish / SiLU — the reference's ``nonlinearity``."""
    return x * jax.nn.sigmoid(x)


def _conv_mode() -> str:
    """Conv lowering selector for the 3x3/stride-1 hot sites (the UNet
    trunk is >=98% of sampling time at ~36% per-call MFU, docs/PERF.md).

    FRIDO_CONV_MODE:
      ``conv``  (default) — XLA's conv emitter (conv_general_dilated)
      ``im2col``          — conv_general_dilated_patches + one matmul
      ``shift9``          — nine shifted [M, Cin] @ [Cin, Cout] dots
      ``pad128``/``pad256`` — zero-pad Cin/Cout to the next multiple of
                            128/256, run the conv emitter, slice back
                            (MXU-tile channel rounding; same value — the
                            padded channels contribute exact zeros)
      ``pallas``          — VMEM-resident shift9 Pallas kernel (one HBM
                            read/write per call; ops/pallas/conv_pallas.py)
      ``pallas_fused``    — ``pallas`` plus the ResBlock prologue
                            (GroupNorm -> SPADE modulation -> SiLU) folded
                            into the conv kernel at eligible sites
      ``auto``            — per-site winner from the measured v5e dispatch
                            table (``_AUTO_TABLE`` below); at ResBlock
                            prologue sites listed in ``_AUTO_FUSED_TABLE``
                            it runs the fused GN/SPADE/SiLU+conv kernel;
                            unmeasured shapes use the conv emitter

    All are the same math (tests/test_layers.py pins equivalence); the env
    var exists so scripts/bench_conv_sites.py's per-site findings can be
    validated end-to-end on the full pipeline with one flag.
    """
    import os

    return os.environ.get("FRIDO_CONV_MODE", "conv")


# EXPERIMENTAL ONLY — the default mode is (and should stay) ``conv``.
# This table was built from scripts/bench_conv_sites.py standalone
# per-site timings (bf16, batch 128, two chip sessions), but round 4's
# in-program profiling (scripts/profile_step.py, docs/PERF.md "round 4"
# section) showed those microbenches were dominated by per-dispatch
# overhead: the (4,960,960) conv that microbenched at 3.07 ms costs
# 0.11 ms inside the compiled stage call, where XLA also fuses the whole
# GN->SPADE->SiLU prologue into the conv and picks a batch-minor
# emitter. Measured end-to-end (docs/r4_chip/flags_*.json): conv 2.7913
# vs auto 2.7932 img/s — within noise — and forcing the Pallas kernels
# everywhere is strictly worse (stage call 60.1 -> 74.6 ms pallas,
# 77.7 ms pallas_fused). The table is kept so the modes stay exercisable
# end-to-end with one flag, not because any row is a validated win.
_AUTO_TABLE = {
    (16, 384, 384): "pallas",   # 1.299 vs conv 1.527 ms (r4: consistent)
    (4, 960, 960): "pad256",    # 1.194 vs conv 3.069 (2.6x, both rounds)
    (32, 384, 192): "pad128",   # 1.928 vs conv 2.069 (both rounds)
    (16, 768, 384): "pallas",   # 1.728 vs conv 1.860 (both rounds)
    (4, 1920, 960): "pad256",   # 1.260 vs conv 2.221 (pad won both)
    (16, 192, 384): "pallas",   # 1.207 vs conv 1.411 (conv lost both)
}

# Fused-prologue sites for FRIDO_CONV_MODE=auto — same caveat as
# _AUTO_TABLE above: the standalone microbench wins recorded here did
# not survive in-program profiling (XLA already fuses the full
# GN -> SPADE -> SiLU prologue into each conv fusion, so the Pallas
# kernel's only remaining edge — the in-VMEM statistics — doesn't pay
# for its slower conv). Kept for one-flag experimentation; spade-gated
# and b >= 64 as originally measured.
_AUTO_FUSED_TABLE: set = {
    (8, 576, 576),    # spade prologue 1.789 vs 3.071 (1.7x)
    (32, 384, 192),   # spade prologue 2.455 vs 2.673
}


def _smalls_conv_mode() -> tuple[str, int]:
    """Small-spatial conv re-lowering experiment (round 4).

    The in-program device trace (docs/PERF.md round-4 section) shows
    11% of the stage call in "data formatting" — layout copies XLA
    inserts because its small-spatial conv emitter picks a batch-minor
    output layout ({0,3,2,1}, "OutputBatchInLanes") while the rest of
    the program is channel-minor. Lowering those convs as dots (shift9 /
    im2col) keeps everything channel-minor, trading emitter efficiency
    for zero boundary copies — a trade only the in-program profile can
    judge, hence the env knob.

    FRIDO_CONV_SMALLS = '' (off, default) | shift9 | im2col | pad128 |
    pad256 — applied to 3x3/stride-1 sites with h,w <=
    FRIDO_CONV_SMALLS_HW (default 8) when the resolved mode is ``conv``.
    1x1/stride-1 sites at those spatials are lowered to a plain reshaped
    matmul whenever FRIDO_CONV_SMALLS is set (any value).
    """
    import os

    return (os.environ.get("FRIDO_CONV_SMALLS", ""),
            int(os.environ.get("FRIDO_CONV_SMALLS_HW", "8")))


def _auto_conv_mode(shape, cout: int) -> str:
    b, h, w, cin = shape
    if h != w:
        return "conv"
    mode = _AUTO_TABLE.get((h, cin, cout), "conv")
    if mode == "pallas" and b < 64:
        return "conv"
    return mode


def _auto_fused(shape, cout: int, spade: bool) -> bool:
    """Should ``auto`` run the fused GN/SPADE/SiLU+conv kernel here?

    Only at SPADE-modulated prologues: every measured fused win comes
    from folding the per-pixel modulation's extra HBM round-trip into
    the conv; plain-GN prologues are faster chained (see table above).
    """
    b, h, w, cin = shape
    return (spade and h == w and b >= 64
            and (h, cin, cout) in _AUTO_FUSED_TABLE)


def _conv3x3_padq(x, kernel, pad, q):
    """Conv with Cin/Cout zero-rounded to multiples of ``q``.

    Numerically equivalent: padded input channels multiply zero kernel
    rows (contributing exact zeros) and padded output channels are sliced
    off. XLA may tile — and therefore order — the channel reduction
    differently, so low-bit float differences vs the unpadded conv are
    possible (tests pin 1e-5-level agreement, not bit equality).
    """
    cin, cout = kernel.shape[2], kernel.shape[3]
    cip, cop = (-cin) % q, (-cout) % q
    if cip:
        x = jnp.pad(x, ((0, 0),) * 3 + ((0, cip),))
    if cip or cop:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cip), (0, cop)))
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[..., :cout] if cop else y


def _conv3x3_im2col(x, kernel, pad):
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    patches = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [B,H,W,Cin*9]
    # patches channel order is Cin-major; reorder kernel to match
    wmat = jnp.transpose(kernel, (2, 0, 1, 3)).reshape(cin * 9, cout)
    oh, ow = patches.shape[1], patches.shape[2]
    return (patches.reshape(-1, cin * 9) @ wmat).reshape(b, oh, ow, cout)


def _conv3x3_shift9(x, kernel, pad):
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
    oh = xp.shape[1] - 2
    ow = xp.shape[2] - 2
    out = None
    for dy in range(3):
        for dx in range(3):
            win = jax.lax.slice(
                xp, (0, dy, dx, 0), (b, dy + oh, dx + ow, cin))
            d = win.reshape(-1, cin) @ kernel[dy, dx]
            out = d if out is None else out + d
    return out.reshape(b, oh, ow, cout)


class Conv2d(nn.Module):
    """torch-style Conv2d on NHWC input.

    ``padding`` is the symmetric int padding of torch; ``stride`` likewise.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | Sequence[tuple[int, int]] = 0
    use_bias: bool = True
    zero_init: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 fused_norm: dict | None = None) -> jnp.ndarray:
        k = self.kernel_size
        cin = x.shape[-1]
        init = (nn.initializers.zeros if self.zero_init else
                nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"))
        kernel = self.param("kernel", init, (k, k, cin, self.features))
        if isinstance(self.padding, int):
            pad = [(self.padding, self.padding)] * 2
        else:
            pad = list(self.padding)
        dtype = self.dtype or x.dtype
        mode = _conv_mode()
        if fused_norm is not None:
            # norm -> (SPADE) -> SiLU -> conv requested as one kernel
            # (ResBlock prologue; see ops/pallas/conv_pallas.py)
            from frido_tpu.ops.norm import group_norm_jnp
            from frido_tpu.ops.pallas import use_pallas
            from frido_tpu.ops.pallas.conv_pallas import (
                conv3x3_norm_silu_pallas, fits_fused_conv)

            gamma = fused_norm.get("gamma")
            beta = fused_norm.get("beta")
            xd = x.astype(dtype)
            want_fused = (mode == "pallas_fused"
                          or (mode == "auto"
                              and _auto_fused(xd.shape, self.features,
                                              gamma is not None)))
            if (want_fused and k == 3 and self.stride == 1
                    and pad == [(1, 1), (1, 1)] and use_pallas()
                    and fits_fused_conv(xd.shape, self.features,
                                        gamma is not None)):
                bias = (self.param("bias", nn.initializers.zeros,
                                   (self.features,))
                        if self.use_bias else
                        jnp.zeros((self.features,), dtype))
                return conv3x3_norm_silu_pallas(
                    xd, kernel.astype(dtype), bias.astype(dtype),
                    fused_norm["nscale"], fused_norm["nbias"],
                    fused_norm["num_groups"], fused_norm["eps"],
                    gamma=gamma, beta=beta)
            # ineligible site (or non-fused mode): same math, unfused
            xn = group_norm_jnp(x, fused_norm["nscale"], fused_norm["nbias"],
                                num_groups=fused_norm["num_groups"],
                                eps=fused_norm["eps"])
            if gamma is not None:
                xn = xn * (1.0 + gamma.astype(xn.dtype)) \
                    + beta.astype(xn.dtype)
            x = silu(xn)
        if mode == "pallas_fused":
            mode = "pallas"  # plain conv sites fall through to the kernel
        if mode == "auto":
            mode = (_auto_conv_mode(x.shape, self.features)
                    if k == 3 and self.stride == 1
                    and pad == [(1, 1), (1, 1)] else "conv")
        smalls, smalls_hw = _smalls_conv_mode()
        if (smalls and x.shape[1] <= smalls_hw and x.shape[2] <= smalls_hw
                and self.stride == 1):
            if mode == "conv" and k == 3 and pad == [(1, 1), (1, 1)]:
                mode = smalls
            elif k == 1 and pad == [(0, 0), (0, 0)]:
                # 1x1 conv as a reshaped matmul: channel-minor by
                # construction, no emitter layout choice to fight
                b, hh, ww, _ = x.shape
                y = (x.astype(dtype).reshape(-1, cin)
                     @ kernel[0, 0].astype(dtype)).reshape(
                         b, hh, ww, self.features)
                if self.use_bias:
                    bias = self.param("bias", nn.initializers.zeros,
                                      (self.features,))
                    y = y + bias.astype(dtype)
                return y
        if (mode == "pallas" and k == 3 and self.stride == 1
                and pad == [(1, 1), (1, 1)]):
            from frido_tpu.ops.pallas import use_pallas
            from frido_tpu.ops.pallas.conv_pallas import (conv3x3_pallas,
                                                          fits_pallas_conv)

            xd = x.astype(dtype)
            if use_pallas() and fits_pallas_conv(xd.shape, self.features):
                bias = (self.param("bias", nn.initializers.zeros,
                                   (self.features,))
                        if self.use_bias else
                        jnp.zeros((self.features,), dtype))
                return conv3x3_pallas(xd, kernel.astype(dtype),
                                      bias.astype(dtype))
            mode = "conv"  # ineligible site: XLA emitter
        if k == 3 and self.stride == 1 and mode not in ("conv", "pallas"):
            lower = {"im2col": _conv3x3_im2col, "shift9": _conv3x3_shift9,
                     "pad128": functools.partial(_conv3x3_padq, q=128),
                     "pad256": functools.partial(_conv3x3_padq, q=256)}
            y = lower[mode](x.astype(dtype), kernel.astype(dtype), pad)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                window_strides=(self.stride, self.stride),
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dtype)
        return y


class Conv1d(nn.Module):
    """torch-style Conv1d on (N, T, C) input (torch uses (N, C, T))."""

    features: int
    kernel_size: int = 1
    padding: int = 0
    use_bias: bool = True
    zero_init: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        cin = x.shape[-1]
        init = (nn.initializers.zeros if self.zero_init else
                nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"))
        kernel = self.param("kernel", init, (k, cin, self.features))
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(1,),
            padding=[(self.padding, self.padding)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dtype)
        return y


class ConvTranspose2d(nn.Module):
    """torch-style ConvTranspose2d (kernel k, stride s, padding p) on NHWC.

    Implemented as an input-dilated convolution:
    ``kernel_t[h, w, ci, co] = W_torch[ci, co, kH-1-h, kW-1-w]``,
    lhs_dilation = stride, padding = k - 1 - p per side.

    Used by the MS-VQGAN cross-scale ``upsample`` heads
    (``/root/reference/taming/models/msvqgan.py:82-84``: k=4, s=2, p=1).
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel_t",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (k, k, cin, self.features),
        )
        pad = k - 1 - self.padding
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(1, 1),
            padding=[(pad, pad)] * 2,
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dtype)
        return y


class Dense(nn.Module):
    """torch-style Linear; kernel stored [in, out]."""

    features: int
    use_bias: bool = True
    zero_init: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        init = (nn.initializers.zeros if self.zero_init else
                nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"))
        kernel = self.param("kernel", init, (cin, self.features))
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype),
                    preferred_element_type=dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dtype)
        return y


class GroupNorm(nn.Module):
    """GroupNorm over the channel (last) axis; fp32 compute.

    ``eps=1e-6`` for the taming ``Normalize`` convention; pass ``eps=1e-5``
    for the guided-diffusion ``GroupNorm32`` convention.
    """

    num_groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray, fuse_silu: bool = False,
                 raw: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if raw:
            # param accessor for fused norm+conv callers (Conv2d
            # ``fused_norm``): creates the params without applying the norm
            return scale, bias
        return group_norm(x, scale, bias, num_groups=self.num_groups,
                          eps=self.eps, fuse_silu=fuse_silu)


class LayerNorm(nn.Module):
    """torch-style LayerNorm over the last axis (eps=1e-5), fp32 compute."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        orig = x.dtype
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=-1, keepdims=True)
        var = x32.var(axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(orig)


class Embed(nn.Module):
    """torch-style Embedding; param ``embedding`` of shape [num, dim].

    The table is exposed as ``.embedding`` so callers (e.g. the VQ codebook
    lookup) can read it without an id gather.
    """

    num_embeddings: int
    features: int

    def setup(self):
        self.embedding = self.param(
            "embedding", nn.initializers.normal(0.02),
            (self.num_embeddings, self.features),
        )

    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.embedding, ids, axis=0)
