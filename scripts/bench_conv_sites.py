"""Microbench the UNet's conv-trunk sites: XLA's conv emitter vs matmul
reformulations and the Pallas kernels, at the flagship t2i f16f8 shapes.

docs/PERF.md puts the remaining headline headroom in per-call conv MFU
(~36% at batch 64); this measures whether hand-lowering the 3x3 convs to
MXU matmuls beats the conv emitter at the shapes the sampler actually
runs (sequential-CFG batch 128, NHWC, bf16):

- ``conv``    — ``lax.conv_general_dilated`` NHWC/HWIO (what
                ``frido_tpu.nn.layers.Conv2d`` emits today)
- ``im2col``  — extract 3x3 patches, one [B*H*W, 9*Cin] @ [9*Cin, Cout]
- ``shift9``  — 9 shifted [B*H*W, Cin] @ [Cin, Cout] dots accumulated
                (keeps activations un-duplicated: 1x the HBM reads of
                im2col's 9x)
- ``convpad128/256`` — channel dims zero-rounded to MXU tile multiples
- ``pallas``  — VMEM-resident shift9 kernel (ops/pallas/conv_pallas.py)

Per site it then times the ResBlock *prologue* three ways — the winner
populates ``frido_tpu.nn.layers._AUTO_FUSED_TABLE`` (what ``auto`` runs
at fused_norm sites):

- ``chain+conv``   — GroupNorm -> SiLU -> XLA conv emitter
- ``chain+best``   — GroupNorm -> SiLU -> this run's fastest plain conv
                     (what ``auto`` does when the site is NOT in the
                     fused table)
- ``fused``        — the whole prologue as ONE Pallas kernel
  (``conv3x3_norm_silu_pallas``), with and without the SPADE per-pixel
  modulation the stage>0 ResBlocks apply

Chained-dispatch timing (scalar fetch as the barrier) like
``bench_attention_sites.py``. Run on the real chip:
``python scripts/bench_conv_sites.py [--batch 128] [--iters 30]``.
``--batch 8/16`` measures the training shapes (scripts/bench_train.py
configs) the round-3 table never covered.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# (label, H=W, Cin, Cout) — flagship UNet levels: latent 32^2,
# model_channels 192, mult (1, 2, 3, 5), plus the widest up-path concat
# convs. Batch comes from --batch (128 = sequential-CFG headline;
# 8/16 = the train-step configs).
SITES = [
    ("lvl0 32^2 192->192", 32, 192, 192),
    ("lvl1 16^2 384->384", 16, 384, 384),
    ("lvl2  8^2 576->576", 8, 576, 576),
    ("lvl3  4^2 960->960", 4, 960, 960),
    ("up0  32^2 384->192", 32, 384, 192),
    ("up1  16^2 768->384", 16, 768, 384),
    ("up2   8^2 1152->576", 8, 1152, 576),
    ("up3   4^2 1920->960", 4, 1920, 960),
    ("skip 32^2 576->192", 32, 576, 192),
    ("down 16^2 192->384", 16, 192, 384),
    ("down  8^2 384->576", 8, 384, 576),
]


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def im2col(x, w):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    patches = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [B,H,W,9*Cin]
    # patches channel order is Cin-major (I then HW); reorder w to match.
    wmat = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin * 9, cout)
    return (patches.reshape(-1, cin * 9) @ wmat).reshape(b, h, wd, cout)


def shift9(x, w):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((b * h * wd, cout), x.dtype)
    for dy in range(3):
        for dx in range(3):
            win = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, wd, cin))
            out = out + win.reshape(-1, cin) @ w[dy, dx]
    return out.reshape(b, h, wd, cout)


def compile_retry(jfn, *args, attempts: int = 3):
    """The remote-compile tunnel occasionally drops the response body
    mid-stream; retry from this process before giving up (same pattern as
    bench.py's warmup)."""
    for a in range(attempts):
        try:
            return jfn(*args)
        except jax.errors.JaxRuntimeError:
            if a == attempts - 1:
                raise
            time.sleep(10)


def timed(fn, *args, iters: int = 30) -> float:
    out = compile_retry(fn, *args)
    float(out.ravel()[0])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--only", default="",
                    help="substring filter on site labels (resume a "
                         "partial run after a tunnel drop)")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}  batch={args.batch} "
          f"dtype={args.dtype}")
    dtype = jnp.dtype(args.dtype)
    b = args.batch
    for label, h, cin, cout in SITES:
        if args.only and args.only not in label:
            continue
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        x = jax.random.normal(ks[0], (b, h, h, cin), dtype)
        w = jax.random.normal(ks[1], (3, 3, cin, cout), dtype) * 0.02
        fns = {"conv": conv, "im2col": im2col, "shift9": shift9}
        # channel rounding to MXU-tile multiples (VERDICT r2 #2b):
        # zero-pad Cin/Cout to a quantum and slice back — measures whether
        # XLA's conv emitter tiles the rounded widths better.
        def make_convpad(q, _co=cout):
            def convpad(x_, w_):
                ci = x_.shape[-1]
                cip = (-ci) % q
                cop = (-_co) % q
                xpad = jnp.pad(x_, ((0, 0),) * 3 + ((0, cip),))
                wpad = jnp.pad(w_, ((0, 0), (0, 0), (0, cip), (0, cop)))
                return conv(xpad, wpad)[..., :_co]
            return convpad
        if cin % 128 or cout % 128:
            fns["convpad128"] = make_convpad(128)
        if cin % 256 or cout % 256:
            fns["convpad256"] = make_convpad(256)

        from frido_tpu.ops.pallas.conv_pallas import (conv3x3_pallas,
                                                      fits_pallas_conv)
        if fits_pallas_conv(x.shape, cout):
            zeros = jnp.zeros((cout,), dtype)
            fns["pallas"] = lambda x_, w_: conv3x3_pallas(x_, w_, zeros)
        ref = None
        parts = []
        best_name, best_t, best_fn = None, None, None
        tflop = b * h * h * 9 * cin * cout * 2 / 1e12
        for name, fn in fns.items():
            jfn = jax.jit(fn)
            y = compile_retry(jfn, x, w)
            if ref is None:
                ref = y
            else:  # same math, bf16 tolerance
                err = float(jnp.max(jnp.abs(
                    y.astype(jnp.float32) - ref.astype(jnp.float32))))
                assert err < 0.5, (label, name, err)
            t = timed(jfn, x, w, iters=args.iters)
            if best_t is None or t < best_t:
                best_name, best_t, best_fn = name, t, fn
            parts.append(f"{name} {t:6.3f} ms ({tflop / t * 1e3:5.1f} TF/s)")
        print(f"{label:22s} " + "  ".join(parts), flush=True)

        # ResBlock prologue at this site: GN -> (SPADE) -> SiLU -> conv.
        # ``auto``'s fused-table decision = fused kernel vs unfused
        # prologue + this run's winning conv lowering (chain+best).
        from frido_tpu.ops.norm import group_norm_jnp
        from frido_tpu.ops.pallas.conv_pallas import (
            conv3x3_norm_silu_pallas, fits_fused_conv)
        nscale = jnp.ones((cin,), dtype)
        nbias = jnp.zeros((cin,), dtype)
        zeros = jnp.zeros((cout,), dtype)
        kg = jax.random.split(jax.random.PRNGKey(1), 2)
        gamma = jax.random.normal(kg[0], x.shape, dtype) * 0.1
        beta = jax.random.normal(kg[1], x.shape, dtype) * 0.1

        for spade in (False, True):
            if not fits_fused_conv(x.shape, cout, spade):
                continue

            def prologue(x_, g=None, b2=None):
                xn = group_norm_jnp(x_, nscale, nbias, num_groups=32,
                                    eps=1e-5)
                if g is not None:
                    xn = xn * (1.0 + g) + b2
                return jax.nn.silu(xn)

            sargs = (gamma, beta) if spade else ()

            def chained_conv(x_, w_):
                return conv(prologue(x_, *sargs), w_)

            def chained_best(x_, w_, _f=best_fn):
                return _f(prologue(x_, *sargs), w_)

            def fused(x_, w_):
                return conv3x3_norm_silu_pallas(
                    x_, w_, zeros, nscale, nbias, 32, 1e-5,
                    gamma=gamma if spade else None,
                    beta=beta if spade else None)

            rows = [("chain+conv", chained_conv), ("fused", fused)]
            if best_name != "conv":
                rows.insert(1, (f"chain+{best_name}", chained_best))
            parts = []
            for name, fn in rows:
                jfn = jax.jit(fn)
                compile_retry(jfn, x, w)
                t = timed(jfn, x, w, iters=args.iters)
                parts.append(
                    f"{name} {t:6.3f} ms ({tflop / t * 1e3:5.1f} TF/s)")
            tag = "spade" if spade else "plain"
            print(f"  prologue/{tag:18s} " + "  ".join(parts), flush=True)


if __name__ == "__main__":
    main()
