"""FLOPs audit for the headline pipeline (one reconciled figure).

Measures every component of the eval pipeline with XLA's HLO cost
analysis on the lowered computation — no estimates — and composes the
per-image total for the eval configuration (PLMS 200 steps, CFG 1.5,
2 pyramid stages). Cost analysis counts a ``lax.scan`` body once
regardless of trip count, so the composition (not a whole-pipeline
lowering) is the only correct accounting. Components:

* per-stage UNet call — stage 1 measured WITH precomputed SPADE tables
  (``spade_pre``), matching what the sampler actually executes since the
  per-stage hoist (samplers.py module docstring);
* per-stage SPADE table build — once per stage, not per step;
* sequential-CFG pair — the cond+uncond calls lowered together, so XLA
  CSE dedupes the context-independent ops exactly as in the step scan
  (this is why the pair costs less than 2x a single call);
* PLMS call count — steps + 1 (the step-0 pseudo improved Euler makes
  one extra model call, plms.py:286-290);
* first-stage decode + 2 cond encodes.

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

    # the axon sitecustomize imports jax at interpreter startup, locking in
    # the TPU platform — the JAX_PLATFORMS env var alone is ignored, and
    # the eager spade_tables call below must not dispatch through the
    # tunnel (one RTT per op)
    jax.config.update("jax_platforms", "cpu")
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
    uctx = jnp.ones((b, 77, 640))
    tokens = jnp.zeros((b, 77), jnp.int32)
    splits = list(model.embed_dim_list)
    use_spade = bool(cfg["unet_config"]["params"].get("use_SPADE_norm"))

    def tables_for(s):
        return model.spade_tables(params, z[..., :sum(splits[:s])], s)

    report = {"steps": args.steps, "stages": model.num_stage}
    total = 0.0
    for s in range(model.num_stage):
        aux = tables_for(s) if use_spade and s > 0 else None

        def call(p, x, tt, c, _s=s, _aux=aux):
            return model.apply_model(p, x, tt, c, _s, spade_pre=_aux)

        def seq_pair(p, x, tt, c, u, _call=call):
            # the sampler's sequential-CFG combine; lowering both calls in
            # one program lets XLA CSE the context-independent ops, which
            # is what the step scan executes
            e_u = _call(p, x, tt, u)
            e_c = _call(p, x, tt, c)
            return e_u + 1.5 * (e_c - e_u)

        single = _flops(jax.jit(call), params, z, t, ctx)
        pair = _flops(jax.jit(seq_pair), params, z, t, ctx, uctx)
        table_fl = 0.0
        if use_spade and s > 0:
            table_fl = _flops(
                jax.jit(lambda p, zz, _s=s: model.spade_tables(
                    p, zz[..., :sum(splits[:_s])], _s)), params, z)
        calls = args.steps + 1  # PLMS step-0 improved Euler extra call
        report[f"stage{s}_tflop_per_call_per_image"] = single / b / 1e12
        report[f"stage{s}_tflop_per_cfg_pair_per_image"] = pair / b / 1e12
        report[f"stage{s}_cfg_pair_vs_2x_single"] = pair / (2 * single)
        report[f"stage{s}_spade_tables_tflop_per_image"] = table_fl / b / 1e12
        total += calls * pair + table_fl

    dec_fl = _flops(jax.jit(
        lambda p, zz: model.decode_first_stage(p, zz)), params, z)
    cond_fl = _flops(jax.jit(
        lambda p, tk: model.get_learned_conditioning(p, tk)), params, tokens)
    total += dec_fl + 2 * cond_fl

    report["decode_tflop_per_image"] = dec_fl / b / 1e12
    report["cond_tflop_per_encode_per_image"] = cond_fl / b / 1e12
    report["model_calls_per_image"] = model.num_stage * (args.steps + 1) * 2
    report["total_tflop_per_image"] = total / b / 1e12
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
