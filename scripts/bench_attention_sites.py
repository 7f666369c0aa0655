"""Microbench the UNet's attention sites: XLA dot-softmax-dot vs the
Pallas kernels, at the flagship t2i f16f8 shapes.

The sampler runs CFG batch 128; attention lives at ds 2/4/8 => 256/64/16
spatial tokens with d_head 32 (num_head_channels: 32), plus 77-token text
cross-attention. Chained-dispatch timing (N iterations queued back to
back, scalar fetch as the barrier) like docs/PERF.md's kernel table.

Run on the real chip: ``python scripts/bench_attention_sites.py``.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from frido_tpu.ops.pallas.attention import (
    _reference_attention,
    flash_attention,
    smalls_attention,
)

# (label, batch*heads, nq, nk, d) — CFG batch 128
SITES = [
    ("self ds2 (16x16, 12h)", 128 * 12, 256, 256, 32),
    ("self ds4 (8x8, 18h)", 128 * 18, 64, 64, 32),
    ("self ds8 (4x4, 30h)", 128 * 30, 16, 16, 32),
    ("cross ds2 (kv=77)", 128 * 12, 256, 77, 32),
    ("cross ds4 (kv=77)", 128 * 18, 64, 77, 32),
]
ITERS = 30


def timed(fn, *args) -> float:
    out = fn(*args)
    float(out.ravel()[0])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    print("backend:", jax.default_backend())
    dtype = jnp.bfloat16
    for label, bh, nq, nk, d in SITES:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (bh, nq, d), dtype)
        k = jax.random.normal(ks[1], (bh, nk, d), dtype)
        v = jax.random.normal(ks[2], (bh, nk, d), dtype)
        scale = d ** -0.5
        xla = jax.jit(functools.partial(_reference_attention, scale=scale))
        sm = jax.jit(functools.partial(smalls_attention, scale=scale))
        t_xla = timed(xla, q, k, v)
        t_sm = timed(sm, q, k, v)
        line = (f"{label:28s} bh={bh:5d} S={nq:4d}/{nk:4d}: "
                f"xla {t_xla:6.3f} ms  smalls {t_sm:6.3f} ms")
        if nk >= 512:
            fl = jax.jit(functools.partial(flash_attention, scale=scale))
            line += f"  flash {timed(fl, q, k, v):6.3f} ms"
        print(line, flush=True)


if __name__ == "__main__":
    main()
