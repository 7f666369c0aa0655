"""Per-op device-time decomposition of the production sampling step.

Round-3's headline analysis attributed the remaining headroom to conv-trunk
MFU from *standalone* per-site microbenches (scripts/bench_conv_sites.py).
Round 4 found those do not transfer: inside the compiled pipeline XLA's
emitter already runs the measured sites at the padded/pallas speed, and
end-to-end conv modes are within noise (docs/PERF.md round-4 table). This
tool replaces guessing with measurement: it captures a jax.profiler device
trace of the exact step units the headline pipeline executes —

- ``stage0``: one sequential-CFG eps call on stage 0 (batch B, bf16)
- ``stage1``: one stage-1 eps call with the SPADE tables hoisted
  (``spade_pre``), exactly as ``FridoDiffusion.sample`` runs it in-scan
- ``cond``: the BERT cond encode (runs once per batch, not per step)
- ``decode``: one 32-image MS-VQGAN decode chunk (once per batch)

and aggregates device-side HLO events by ``hlo_category`` plus the top
individual ops (shape + bytes from the HLO ``long_name``). The axon tunnel
does serve device traces (verified 2026-08-19: events carry
``device_duration_ps``/``hlo_category``; a 2048^3 bf16 matmul shows
~190 TF/s, i.e. the trace numbers are credible).

Run on the real chip: ``python scripts/profile_step.py [--batch 128]
[--units stage0,stage1] [--iters 5] [--top 15]``.

Reference hot loop this decomposes:
/root/reference/frido/modules/diffusionmodules/pyunet.py:166-300 driven by
/root/reference/frido/models/diffusion/plms.py:116-194.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def capture(fn, args, iters: int) -> list[dict]:
    """Trace ``iters`` executions; return device-side HLO events."""
    f = jax.jit(fn)
    float(f(*args))  # compile + tunnel barrier (scalar fetch)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(iters):
                out = f(*args)
            float(out)
        paths = glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                          recursive=True)
        assert paths, "profiler produced no trace"
        d = json.load(gzip.open(paths[0]))
    # drop the enclosing per-program event (name jit_<fn>) — it spans all
    # children and would double every total
    return [e for e in d.get("traceEvents", [])
            if e.get("ph") == "X"
            and "device_duration_ps" in e.get("args", {})
            and not e.get("name", "").startswith("jit_")]


_SHAPE = re.compile(r"(?:bf16|f32|s32|u32|pred|s8)\[[0-9,]*\]")


def summarize(events: list[dict], iters: int, label: str, top: int) -> float:
    by_cat = collections.Counter()
    by_op = collections.defaultdict(float)
    op_meta = {}
    total = 0.0
    for e in events:
        us = int(e["args"]["device_duration_ps"]) / 1e6
        total += us
        by_cat[e["args"].get("hlo_category", "?")] += us
        name = e["name"]
        by_op[name] += us
        if name not in op_meta:
            ln = e["args"].get("long_name", "")
            shape = _SHAPE.search(ln)
            op_meta[name] = (shape.group(0) if shape else "",
                             int(e["args"].get("bytes_accessed", 0)), ln)
    per_iter_ms = total / iters / 1e3
    gib = sum(int(e["args"].get("bytes_accessed", 0))
              for e in events) / iters / 2**30
    # v5e: ~819 GB/s HBM, ~197 TF/s bf16 — how much of the call is
    # explainable by pure HBM traffic?
    hbm_ms = gib * 2**30 / 819e9 * 1e3
    print(f"\n== {label}: {per_iter_ms:.2f} ms/call device time "
          f"({iters} iters); {gib:.2f} GiB/call accessed "
          f"(~{hbm_ms:.1f} ms at 819 GB/s => "
          f"{hbm_ms / per_iter_ms * 100:.0f}% HBM-bound) ==")
    for cat, us in by_cat.most_common():
        print(f"  {cat:28s} {us / iters / 1e3:8.3f} ms  "
              f"{us / total * 100:5.1f}%")
    print(f"  top {top} ops:")
    long = os.environ.get("PROFILE_LONG", "0") == "1"
    for name, us in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        shape, nbytes, ln = op_meta[name]
        print(f"    {name:28s} {us / iters / 1e3:8.3f} ms  "
              f"{us / total * 100:5.1f}%  {shape}  "
              f"{nbytes / 2**20:.1f} MiB/iter")
        if long and ln:
            print(f"        {ln[:400]}")
    return per_iter_ms


def mxu_by_shape(events: list[dict], iters: int, top: int) -> None:
    """Attribute the MXU ('convolution fusion') time by root op kind and
    output shape — the in-program ground truth the standalone conv
    microbenches (bench_conv_sites.py) failed to predict."""
    agg = collections.defaultdict(lambda: [0.0, 0])
    seen = set()
    for e in events:
        if e["args"].get("hlo_category") != "convolution fusion":
            continue
        ln = e["args"].get("long_name", "")
        shape = _SHAPE.search(ln)
        stxt = shape.group(0) if shape else "?"
        # fusion names carry the root op when XLA auto-names them
        # (convolution_add_fusion.N); otherwise rank-4 [B,H,W,C] outputs
        # are trunk convs, rank-3 [B,T,C] are attention/FF dots
        name = e["name"]
        kind = ("conv" if "convolution" in name
                else "dot" if "dot" in name
                else "rank4" if stxt.count(",") == 3
                else "rank3" if stxt.count(",") == 2 else "other")
        key = (kind, stxt)
        a = agg[key]
        a[0] += int(e["args"]["device_duration_ps"]) / 1e6
        if e["name"] not in seen:
            seen.add(e["name"])
            a[1] += 1
    total = sum(a[0] for a in agg.values())
    print(f"  MXU-fusion time by (root kind, output shape) — "
          f"{total / iters / 1e3:.2f} ms total:")
    for (kind, shape), (us, n) in sorted(
            agg.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"    {kind:5s} {shape:28s} x{n:3d}  "
              f"{us / iters / 1e3:8.3f} ms  {us / total * 100:5.1f}%")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--units", default="stage0,stage1")
    ap.add_argument("--params-dtype", default=None,
                    help="cast float params to this dtype on device "
                         "(e.g. bfloat16) — measures the param-read-"
                         "traffic share; fusions otherwise read fp32 "
                         "kernels (seen in the optimized HLO)")
    args = ap.parse_args()

    import __graft_entry__ as g
    from frido_tpu.config import load_yaml
    from frido_tpu.models.frido import FridoDiffusion
    from frido_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    print(f"backend={jax.default_backend()} batch={args.batch} "
          f"conv_mode={os.environ.get('FRIDO_CONV_MODE', 'conv')} "
          f"pallas={os.environ.get('FRIDO_PALLAS', '1')}")

    cfg = load_yaml(g.FLAGSHIP_CONFIG)["model"]["params"]
    model = FridoDiffusion(
        first_stage_config=cfg["first_stage_config"],
        cond_stage_config=cfg["cond_stage_config"],
        unet_config=cfg["unet_config"],
        **{k: v for k, v in cfg.items()
           if k not in ("first_stage_config", "cond_stage_config",
                        "unet_config")})
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init_params(jax.random.PRNGKey(0), context_len=77)
    if args.params_dtype:
        pd = jnp.dtype(args.params_dtype)
        params = jax.tree.map(
            lambda a: a.astype(pd)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            params)
    params = jax.device_put(params, jax.devices()[0])

    B = args.batch
    BF = jnp.bfloat16
    rng = jax.random.PRNGKey(7)
    z = jax.random.normal(rng, (B, 32, 32, 8), BF)
    t = jnp.full((B,), 500, jnp.int32)
    tokens = jnp.zeros((B, 77), jnp.int32)
    ctx = model.get_learned_conditioning(params, tokens).astype(BF)

    units = {}

    def stage0(params, z, t, ctx):
        return model.apply_model(params, z, t, ctx, 0) \
            .astype(jnp.float32).mean()

    # SPADE tables hoisted OUTSIDE the step, like the sampler's
    # stage_invariants — the step unit must not pay for them
    pre = jax.jit(
        lambda p, zz: model.spade_tables(p, zz[..., :4], 1))(params, z)

    def stage1(params, z, t, ctx, pre):
        e = model.apply_model(params, z, t, ctx, 1, spade_pre=pre)
        return e.astype(jnp.float32).mean()

    def cond(params, tokens):
        return model.get_learned_conditioning(params, tokens) \
            .astype(jnp.float32).mean()

    def decode(params, z):
        img = model.decode_first_stage(params, z[:32].astype(jnp.float32))
        return img.mean()

    units["stage0"] = (stage0, (params, z, t, ctx))
    units["stage1"] = (stage1, (params, z, t, ctx, pre))
    units["cond"] = (cond, (params, tokens))
    units["decode"] = (decode, (params, z))

    results = {}
    for name in args.units.split(","):
        fn, a = units[name]
        ev = capture(fn, a, args.iters)
        results[name] = summarize(ev, args.iters, name, args.top)
        mxu_by_shape(ev, args.iters, args.top)

    if "stage0" in results and "stage1" in results:
        pair = results["stage0"] + results["stage1"]
        # sequential CFG runs each stage twice per step (cond + uncond)
        print(f"\nper-step (sequential CFG, both stages): {2 * pair:.2f} ms"
              f" -> {B / (2 * pair * 200 / 1e3):.3f} img/s at 200 steps"
              f" (device-time bound, excludes fixed costs)")


if __name__ == "__main__":
    main()
