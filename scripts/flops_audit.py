"""FLOPs audit for the headline pipeline (one reconciled figure).

Round-1 published two contradictory numbers (~10.5 TFLOP/image in bench.py
vs 5.06 TFLOP per batch-64 UNet forward in PERF.md, which implies ~63
TFLOP/image at 800 CFG calls). This script measures each component with
XLA's HLO cost analysis on the lowered computation — no estimates — and
prints the per-image total for the eval configuration (PLMS 200 steps,
CFG 1.5, 2 pyramid stages: 2 x 200 x 2 = 800 UNet calls + 2 cond encodes +
1 decode per image).

Run on the CPU backend (FLOP counts are backend-independent up to fusion
bookkeeping):

    JAX_PLATFORMS=cpu python scripts/flops_audit.py [--steps 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _flops(jitted, *args) -> float:
    c = jitted.lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return float(ca["flops"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from frido_tpu.config import load_yaml
    from frido_tpu.models.frido import FridoDiffusion

    cfg = load_yaml(g.FLAGSHIP_CONFIG)["model"]["params"]
    model = FridoDiffusion(
        first_stage_config=cfg["first_stage_config"],
        cond_stage_config=cfg["cond_stage_config"],
        unet_config=cfg["unet_config"],
        **{k: v for k, v in cfg.items()
           if k not in ("first_stage_config", "cond_stage_config",
                        "unet_config")})
    params = model.init_params(jax.random.PRNGKey(0), context_len=77)

    b = args.batch
    lat = model.image_size
    z = jnp.zeros((b, lat, lat, model.channels))
    t = jnp.zeros((b,), jnp.int32)
    ctx = jnp.zeros((b, 77, 640))
    tokens = jnp.zeros((b, 77), jnp.int32)

    unet = jax.jit(lambda p, x, tt, c: model.apply_model(p, x, tt, c, 0))
    unet_fl = _flops(unet, params, z, t, ctx)

    dec = jax.jit(lambda p, zz: model.decode_first_stage(p, zz))
    dec_fl = _flops(dec, params, z)

    cond = jax.jit(lambda p, tk: model.get_learned_conditioning(p, tk))
    cond_fl = _flops(cond, params, tokens)

    calls = model.num_stage * args.steps * 2  # stage loop x steps x CFG
    per_image = (calls * unet_fl + dec_fl + 2 * cond_fl) / b
    out = {
        "unet_tflop_per_call_per_image": unet_fl / b / 1e12,
        "decode_tflop_per_image": dec_fl / b / 1e12,
        "cond_tflop_per_encode_per_image": cond_fl / b / 1e12,
        "unet_calls_per_image": calls,
        "steps": args.steps,
        "total_tflop_per_image": per_image / 1e12,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
