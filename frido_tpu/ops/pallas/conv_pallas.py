"""3x3/stride-1 convolution as clean MXU dots (Pallas).

Why: the UNet conv trunk is >=98% of sampling time at ~36% per-call MFU
under XLA's conv emitter (docs/PERF.md). The arithmetic intensity of these
sites is high (e.g. 87 GFLOP vs ~100 MB of activation traffic at the
32^2 x 192 site, batch 128), so the emitter is compute/tiling-bound, not
HBM-bound. This kernel reformulates the conv as nine shifted
[M, Cin] @ [Cin, TN] matmuls accumulated in fp32 — the shift9 form — but
unlike the XLA-level ``FRIDO_CONV_MODE=shift9`` (which re-reads the
activation from HBM for every one of the nine dots) it keeps the whole
padded sample block resident in VMEM: one HBM read of x, one write of y,
nine MXU dots from VMEM.

Grid: (batch tiles x Cout tiles). The x block depends only on the batch
index, so consecutive Cout tiles reuse the resident block (Pallas skips
the re-copy when the index map is unchanged). Weights are tiled over Cout
so deep sites (e.g. 3x3x1920x960 = 33 MB bf16) fit VMEM.

Eligibility (``fits_pallas_conv``): whole samples must fit VMEM alongside
a weight tile — true for every UNet latent site (<= 32^2 spatial), false
for the 256^2 VQGAN decoder tail, which stays on the XLA emitter.

Backward: custom_vjp recomputing through ``lax.conv_general_dilated``'s
VJP (the kernel targets the sampling hot path; training convs keep XLA's
fused conv gradients).

Reference hot loop this accelerates:
``/root/reference/frido/modules/diffusionmodules/pyunet.py:166-300``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from frido_tpu.ops.pallas.dispatch import interpret_mode

# VMEM working-set budget. v5e's scoped-vmem limit is a hard 16 MiB per
# kernel (this XLA build rejects --xla_tpu_scoped_vmem_limit_kib as an
# unknown flag — verified on chip 2026-08-19, so the limit cannot be
# raised). Mosaic's actual stack allocation exceeds any naive
# "sum of my buffers" model: the plain kernel at (128,32,32,192)->128
# with bb=4 allocates 16.54M where the old model said 9.1M (the gap is
# double-buffered IO blocks plus Mosaic's staging of dot operands and
# fp32 temporaries). Rather than enumerate Mosaic internals, the pickers
# use an EMPIRICAL per-pixel stack model calibrated against every
# chip-compiled config:
#
#   stack ~= bb*h*w*(A*cin + B*tn [+ S*cin if spade]) + padded-x + 2*wtile
#
# with (A, B) fit so that the measured OOM (plain, 32^2x192->128, bb=4,
# 16.54M) is rejected and every config that compiled and ran on chip
# (plain bb=4 at 16^2x384->384, bb=2 at 32^2x192->192; fused bb=8 at
# 8^2x576->576, bb=1 at 32^2x384->192+SPADE) stays eligible. The fused
# kernel carries more live fp32 temporaries per pixel, hence its larger
# A. If a new shape ever OOMs, tighten the coefficients with that point.
_VMEM_LIMIT = int(15.9 * 1024 * 1024)
_STACK_A_PLAIN, _STACK_B = 13, 10
_STACK_A_FUSED, _STACK_SPADE = 22, 4
_W_TILE_BUDGET = 4 * 1024 * 1024


def _stack_fits(bb, h, w, cin, tn, itemsize, wbytes, a, spade=False):
    per_px = a * cin + _STACK_B * tn + (_STACK_SPADE * cin if spade else 0)
    stack = (bb * h * w * per_px
             + (h + 2) * (w + 2) * cin * itemsize
             + 2 * wbytes)
    return stack <= _VMEM_LIMIT


def _conv_kernel(x_ref, w_ref, b_ref, o_ref, *, h: int, w: int):
    # pad in VMEM: blocks are whole samples, so no cross-block halo
    xb = jnp.pad(x_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    bb = xb.shape[0]
    cin = xb.shape[-1]
    tn = w_ref.shape[-1]
    acc = jnp.zeros((bb * h * w, tn), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = jax.lax.slice(
                xb, (0, dy, dx, 0), (bb, dy + h, dx + w, cin))
            acc = acc + jax.lax.dot_general(
                win.reshape(bb * h * w, cin), w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)[None, :]
    o_ref[...] = acc.reshape(bb, h, w, tn).astype(o_ref.dtype)


def _tn_options(cout):
    """Mosaic-legal (cout_padded, tn) candidates, most-preferred first.

    The Mosaic lowering requires the last dim of every block be a multiple
    of 128 or the full array dim (first real-chip run rejected tn=288 at
    the 576-wide site). Preference: full width unpadded (no wasted FLOPs,
    weight tile stays resident longest), then 128-multiple tiles of the
    128-rounded width, largest first.
    """
    opts = [(cout, cout)]
    cp = -(-cout // 128) * 128
    for k in range(cp // 128, 0, -1):
        t = k * 128
        if cp % t == 0 and (cp, t) != (cout, cout):
            opts.append((cp, t))
    return opts


def _pick_tiles(b, h, w, cin, cout, itemsize):
    """(bb, tn, cout_padded) sized to the VMEM stack model; None if no
    fit. Picks the largest batch block the empirical model admits."""
    for cp, tn in _tn_options(cout):
        wbytes = 9 * cin * tn * itemsize
        if wbytes > _W_TILE_BUDGET:
            continue
        bb = b
        while bb and not (b % bb == 0 and _stack_fits(
                bb, h, w, cin, tn, itemsize, wbytes, _STACK_A_PLAIN)):
            bb -= 1
        if not bb:
            continue
        # MXU wants >= ~256 rows per dot; tiny spatial extents need
        # bigger bb
        if bb * h * w < 256 and bb < b:
            continue
        return bb, tn, cp
    return None


def fits_pallas_conv(shape, cout) -> bool:
    b, h, w, cin = shape
    itemsize = 2  # bf16 compute path; fp32 inputs also fit at these sites
    return _pick_tiles(b, h, w, cin, cout, itemsize) is not None


def _pad_cout(kernel, bias, cout, cp):
    """Zero-pad kernel/bias Cout -> cp (Mosaic tile legality)."""
    if cp == cout:
        return kernel, bias
    return (jnp.pad(kernel, ((0, 0), (0, 0), (0, 0), (0, cp - cout))),
            jnp.pad(bias, ((0, cp - cout),)))


def _conv_forward(x, kernel, bias, interpret):
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    tiles = _pick_tiles(b, h, w, cin, cout, x.dtype.itemsize)
    assert tiles is not None, "dispatch must check fits_pallas_conv"
    bb, tn, cp = tiles
    kernel, bias = _pad_cout(kernel, bias, cout, cp)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, h=h, w=w),
        grid=(b // bb, cp // tn),
        in_specs=[
            # x depends only on the batch index -> stays resident across
            # the Cout tiles of one batch block
            pl.BlockSpec((bb, h, w, cin), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, cin, tn), lambda i, j: (0, 0, 0, j)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bb, h, w, tn), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cp), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * cin * cp,
            bytes_accessed=(x.size + b * h * w * cp + 9 * cin * cp)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, kernel.astype(x.dtype), bias.reshape(1, cp))
    return out[..., :cout] if cp != cout else out


@jax.custom_vjp
def conv3x3_pallas(x, kernel, bias):
    """3x3 stride-1 pad-1 conv on NHWC via VMEM-resident shifted dots."""
    return _conv_forward(x, kernel, bias, interpret=interpret_mode())


# ---------------------------------------------------------------------------
# fused norm+SiLU+conv: the ResBlock prologue folded into the conv's
# VMEM residency
# ---------------------------------------------------------------------------
#
# Every UNet ResBlock conv is fed by GroupNorm (-> optional SPADE
# modulation) -> SiLU (``/root/reference/frido/modules/diffusionmodules/
# pyunet.py:178-186,209-233``; SPADE ``spade_norm.py:40-59``). Run
# separately, that chain costs ~5 activation-sized HBM transfers per site
# (norm write, modulate read+write, conv read, plus the gamma/beta reads);
# each pallas block here holds *whole samples*, so the group statistics
# are computable in-kernel and the whole prologue collapses into the one
# HBM read of x the conv already does. Stats use the E[x^2]-E[x]^2 form in
# fp32 via two [bb, Cin] @ [Cin, G] dots with a group-membership matrix
# (reshaping the minor dim to (G, cg) does not lower well on Mosaic).


def _fused_kernel(*refs, h: int, w: int, groups: int, eps: float,
                  spade: bool):
    if spade:
        x_ref, nb_ref, g_ref, b2_ref, w_ref, b_ref, o_ref = refs
    else:
        x_ref, nb_ref, w_ref, b_ref, o_ref = refs
    xb = x_ref[...].astype(jnp.float32)
    bb, _, _, cin = xb.shape
    cg = cin // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (cin, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (cin, groups), 1)
    m = (ch // cg == gr).astype(jnp.float32)  # [Cin, G] group membership
    cnt = h * w * cg
    xs = jnp.sum(xb, axis=(1, 2))  # [bb, Cin]
    xss = jnp.sum(xb * xb, axis=(1, 2))
    mean_g = jax.lax.dot_general(
        xs, m, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / cnt
    var_g = jax.lax.dot_general(
        xss, m, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / cnt - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # broadcast per-group back to channels: [bb, G] @ [G, Cin]
    mean_c = jax.lax.dot_general(
        mean_g, m.T, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(
        rstd_g, m.T, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    nscale = nb_ref[0].astype(jnp.float32)
    nbias = nb_ref[1].astype(jnp.float32)
    xn = (xb - mean_c[:, None, None, :]) * rstd_c[:, None, None, :]
    xn = xn * nscale + nbias
    if spade:
        xn = (xn * (1.0 + g_ref[...].astype(jnp.float32))
              + b2_ref[...].astype(jnp.float32))
    xn = xn * jax.nn.sigmoid(xn)  # SiLU in fp32, as GroupNorm32 computes
    xn = xn.astype(o_ref.dtype)
    xp = jnp.pad(xn, ((0, 0), (1, 1), (1, 1), (0, 0)))
    tn = w_ref.shape[-1]
    acc = jnp.zeros((bb * h * w, tn), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = jax.lax.slice(xp, (0, dy, dx, 0), (bb, dy + h, dx + w, cin))
            acc = acc + jax.lax.dot_general(
                win.reshape(bb * h * w, cin), w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)[None, :]
    o_ref[...] = acc.reshape(bb, h, w, tn).astype(o_ref.dtype)


def _pick_tiles_fused(b, h, w, cin, cout, itemsize, spade):
    """(bb, tn, cout_padded) for the fused kernel; None if no fit."""
    for cp, tn in _tn_options(cout):
        wbytes = 9 * cin * tn * itemsize
        if wbytes > _W_TILE_BUDGET:
            continue
        bb = b
        while bb and not (b % bb == 0 and _stack_fits(
                bb, h, w, cin, tn, itemsize, wbytes, _STACK_A_FUSED,
                spade=spade)):
            bb -= 1
        if not bb:
            continue
        if bb * h * w < 256 and bb < b:
            continue
        return bb, tn, cp
    return None


def fits_fused_conv(shape, cout, spade) -> bool:
    b, h, w, cin = shape
    return _pick_tiles_fused(b, h, w, cin, cout, 2, spade) is not None


def _fused_forward(x, kernel, bias, nscale, nbias, gamma, beta,
                   num_groups, eps, interpret):
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    spade = gamma is not None
    tiles = _pick_tiles_fused(b, h, w, cin, cout, x.dtype.itemsize, spade)
    assert tiles is not None, "dispatch must check fits_fused_conv"
    bb, tn, cp = tiles
    kernel, bias = _pad_cout(kernel, bias, cout, cp)
    nb = jnp.stack([nscale, nbias]).astype(jnp.float32)  # [2, Cin]
    operands = [x, nb]
    in_specs = [
        pl.BlockSpec((bb, h, w, cin), lambda i, j: (i, 0, 0, 0)),
        pl.BlockSpec((2, cin), lambda i, j: (0, 0)),
    ]
    if spade:
        operands += [gamma.astype(x.dtype), beta.astype(x.dtype)]
        in_specs += [
            pl.BlockSpec((bb, h, w, cin), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((bb, h, w, cin), lambda i, j: (i, 0, 0, 0)),
        ]
    operands += [kernel.astype(x.dtype), bias.reshape(1, cp)]
    in_specs += [
        pl.BlockSpec((3, 3, cin, tn), lambda i, j: (0, 0, 0, j)),
        pl.BlockSpec((1, tn), lambda i, j: (0, j)),
    ]
    out = pl.pallas_call(
        functools.partial(_fused_kernel, h=h, w=w, groups=num_groups,
                          eps=eps, spade=spade),
        grid=(b // bb, cp // tn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, h, w, tn), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cp), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * cin * cp,
            bytes_accessed=(x.size * (3 if spade else 1)
                            + b * h * w * cp + 9 * cin * cp)
            * x.dtype.itemsize,
            transcendentals=b * h * w * cin,
        ),
        interpret=interpret,
    )(*operands)
    return out[..., :cout] if cp != cout else out


def _reference_fused(x, kernel, bias, nscale, nbias, gamma, beta,
                     num_groups, eps):
    from frido_tpu.ops.norm import group_norm_jnp

    xn = group_norm_jnp(x, nscale, nbias, num_groups=num_groups, eps=eps)
    if gamma is not None:
        xn = (xn.astype(jnp.float32) * (1.0 + gamma.astype(jnp.float32))
              + beta.astype(jnp.float32)).astype(x.dtype)
    xn = jax.nn.silu(xn.astype(jnp.float32)).astype(x.dtype)
    return _reference_conv(xn, kernel, bias)


@functools.lru_cache(maxsize=None)
def _make_fused(num_groups: int, eps: float, spade: bool):
    if spade:

        @jax.custom_vjp
        def fused(x, kernel, bias, nscale, nbias, gamma, beta):
            return _fused_forward(x, kernel, bias, nscale, nbias, gamma,
                                  beta, num_groups, eps, interpret_mode())

        def fwd(x, kernel, bias, nscale, nbias, gamma, beta):
            return (fused(x, kernel, bias, nscale, nbias, gamma, beta),
                    (x, kernel, bias, nscale, nbias, gamma, beta))

        def bwd(res, g):
            def ref(x, kernel, bias, nscale, nbias, gamma, beta):
                return _reference_fused(x, kernel, bias, nscale, nbias,
                                        gamma, beta, num_groups, eps)

            _, vjp = jax.vjp(ref, *res)
            return vjp(g)

    else:

        @jax.custom_vjp
        def fused(x, kernel, bias, nscale, nbias):
            return _fused_forward(x, kernel, bias, nscale, nbias, None,
                                  None, num_groups, eps, interpret_mode())

        def fwd(x, kernel, bias, nscale, nbias):
            return (fused(x, kernel, bias, nscale, nbias),
                    (x, kernel, bias, nscale, nbias))

        def bwd(res, g):
            def ref(x, kernel, bias, nscale, nbias):
                return _reference_fused(x, kernel, bias, nscale, nbias,
                                        None, None, num_groups, eps)

            _, vjp = jax.vjp(ref, *res)
            return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def conv3x3_norm_silu_pallas(x, kernel, bias, nscale, nbias, num_groups,
                             eps, gamma=None, beta=None):
    """GroupNorm (-> optional SPADE gamma/beta modulation) -> SiLU -> 3x3
    conv as ONE Pallas kernel. ``gamma``/``beta`` are per-pixel [B,H,W,C]
    modulation tables (both or neither)."""
    fn = _make_fused(int(num_groups), float(eps), gamma is not None)
    if gamma is not None:
        return fn(x, kernel, bias, nscale, nbias, gamma, beta)
    return fn(x, kernel, bias, nscale, nbias)


def _reference_conv(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(y.dtype)


def _conv_fwd(x, kernel, bias):
    return conv3x3_pallas(x, kernel, bias), (x, kernel, bias)


def _conv_bwd(res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(_reference_conv, x, kernel, bias)
    return vjp(g)


conv3x3_pallas.defvjp(_conv_fwd, _conv_bwd)
