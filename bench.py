"""Headline benchmark: 256x256 images/sec/chip, 200-step PLMS, CFG 1.5.

Matches the reference's eval configuration (``tools/frido/eval_t2i.sh``:
PLMS 200 steps, guidance 1.5) and its throughput metric — wall-clock around
sampling + first-stage decode per batch
(``/root/reference/scripts/sample_diffusion.py:198-205``). Runs on the real
TPU chip; prints ONE JSON line.

Wedge-proofing (the axon tunnel can wedge after a killed/OOM'd client —
round 2's driver bench died with "Unable to initialize backend 'axon'"):
the default invocation is an ORCHESTRATOR that (1) probes the TPU backend
in a fresh, time-bounded subprocess, retrying with backoff, then (2) runs
the actual benchmark in another fresh subprocess with its own timeout,
also retried. A wedged attempt is killed and retried from a clean process;
on persistent failure the orchestrator still prints one parseable JSON
line whose ``error`` field names the tunnel state (so the driver records a
diagnostic artifact instead of an rc=1 traceback). See docs/PERF.md
("Tunnel wedge & recovery").

Baseline anchor: the reference publishes no V100 throughput number
(BASELINE.md). We anchor to its runtime claim that the mini t2i eval —
1000 images at PLMS 100 steps (``tools/frido/eval_t2i_minival.sh``) —
finishes "within 1 hour on 1*V100" (``README.md:242``). That bounds V100
throughput FROM BELOW: >= 0.28 img/s at 100 steps => >= ~0.14 img/s at the
200-step eval configuration (UNet calls scale linearly in steps and
dominate: measured 38.4 TFLOP/image executed at 200 steps via
scripts/flops_audit.py; ~5 effective V100 fp32 TFLOPS, a plausible ~1/3 of
its 15.7 peak). 0.14 is therefore the SLOWEST V100 consistent with the
claim — any slack in "within 1 hour" (and the hour covering dataloading/
decode/IO, not pure sampling) means the real V100 is faster — so
``vs_baseline`` is an UPPER BOUND on the true multiple, not a conservative
estimate. We report the absolute img/s alongside it so the anchor can be
re-based if a measured V100 number ever surfaces.

Env overrides: BENCH_BATCH (default 128), BENCH_CFG_MODE (default
'sequential' — two half-size UNet calls instead of one 2B-batched call;
numerically identical, halves the sampler's peak activation memory so
batch 128 fits HBM: measured 2.80 img/s vs 2.18 at batched/64),
BENCH_STEPS (default 200; for dpmpp default 25), BENCH_SAMPLER (default
'plms'; 'dpmpp' benchmarks the beyond-parity DPM-Solver++(2M) serving
path), BENCH_REPEATS (default 2), BENCH_DECODE_CHUNK (default 32 — bounds
the 256x256 decoder's peak HBM so larger batches fit; numerically
identical), BENCH_PROBE_TIMEOUT (s, default 240), BENCH_TIMEOUT (worker
wall-clock s, default 2400 — a cold run through the tunnel takes 13-15
min and prints nothing until done), BENCH_ATTEMPTS (default 3),
BENCH_INPROCESS=1 (skip the orchestrator; run probe+bench in this
process — used by the orchestrator itself).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

# reference README.md:242 anchor (see module docstring): 1000 imgs / 3600 s
# at 100 steps, halved for the 200-step eval config. This is a LOWER bound
# on V100 throughput, making vs_baseline an UPPER bound on the multiple.
V100_EST_IMG_PER_S = 0.14


def _task() -> str:
    """Benchmark task: 't2i' (flagship f16f8, default) or 'layout2i_f8f4'
    (the COCO-seg f8f4 config — 64² latents, raw bbox-token conditioning;
    reference config configs/frido/layout2i/frido_f8f4_coco_seg.yaml)."""
    return os.environ.get("BENCH_TASK", "t2i")


_TASK_CONFIGS = {
    "t2i": "configs/frido/t2i/frido_f16f8_coco.yaml",
    "layout2i_f8f4": "configs/frido/layout2i/frido_f8f4_coco_seg.yaml",
}


def _metric_name() -> str:
    sampler = os.environ.get("BENCH_SAMPLER", "plms")
    steps = os.environ.get(
        "BENCH_STEPS", "25" if sampler == "dpmpp" else "200")
    label = "DPM-Solver++(2M)" if sampler == "dpmpp" else sampler.upper()
    task = _task().replace("_", " ")
    return (f"{task} 256x256 images/sec/chip "
            f"({label} {steps} steps, CFG 1.5)")


# ---------------------------------------------------------------------------
# probe: can a fresh process reach the chip and execute one tiny matmul?
# ---------------------------------------------------------------------------

_PROBE_SRC = r"""
import time, sys
t0 = time.time()
import jax, jax.numpy as jnp
dev = jax.devices()[0]
x = jnp.ones((256, 256))
v = float((x @ x).mean())  # scalar fetch = the only reliable tunnel barrier
print(f"probe ok: {dev.platform} matmul={v:.1f} in {time.time()-t0:.1f}s",
      file=sys.stderr)
"""


def probe(timeout: float) -> tuple[bool, str]:
    """Run a device probe in a fresh subprocess. Returns (ok, detail)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC], timeout=timeout,
            capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return False, (f"probe timed out after {timeout:.0f}s — tunnel "
                       "wedged (device init or matmul hung)")
    if r.returncode != 0:
        tail = (r.stderr or r.stdout or "").strip().splitlines()[-3:]
        return False, "probe rc=%d: %s" % (r.returncode, " | ".join(tail))
    return True, (r.stderr or "").strip().splitlines()[-1]


# ---------------------------------------------------------------------------
# worker: the actual benchmark (runs in-process; orchestrator subprocesses it)
# ---------------------------------------------------------------------------

def run_bench() -> dict:
    import jax
    import jax.numpy as jnp

    from frido_tpu.utils.compilation_cache import enable as enable_xla_cache

    enable_xla_cache()
    sampler = os.environ.get("BENCH_SAMPLER", "plms")
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    steps = int(os.environ.get(
        "BENCH_STEPS", "25" if sampler == "dpmpp" else "200"))
    repeats = int(os.environ.get("BENCH_REPEATS", "2"))
    decode_chunk = int(os.environ.get("BENCH_DECODE_CHUNK", "32")) or None
    if decode_chunk and batch > decode_chunk and batch % decode_chunk != 0:
        # decode_first_stage only chunks when batch > chunk AND divides;
        # otherwise it silently runs one full-batch decode — make that
        # visible since the knob exists to bound decoder HBM.
        print(f"WARNING: BENCH_BATCH={batch} not divisible by "
              f"BENCH_DECODE_CHUNK={decode_chunk}; decode runs unchunked "
              f"(full-batch decoder HBM peak)", file=sys.stderr)

    from frido_tpu.config import instantiate_from_config, load_yaml

    repo = os.path.dirname(os.path.abspath(__file__))
    cfg_path = os.environ.get("BENCH_CONFIG")
    if cfg_path is None:
        # only resolved when BENCH_CONFIG is absent — an unknown
        # BENCH_TASK with an explicit config must not KeyError (it would
        # burn 3 orchestrator retries misclassified as a tunnel failure)
        if _task() not in _TASK_CONFIGS:
            raise SystemExit(
                f"unknown BENCH_TASK={_task()!r} and no BENCH_CONFIG set; "
                f"known tasks: {sorted(_TASK_CONFIGS)}")
        cfg_path = os.path.join(repo, _TASK_CONFIGS[_task()])
    model_cfg = load_yaml(cfg_path)["model"]
    cfg = model_cfg["params"]
    # same path main.py uses: the reference target string resolves to
    # frido_tpu.models.frido.FridoDiffusion via the config aliases
    model = instantiate_from_config(model_cfg)
    # raw-token conditioning (layout2i/label2i) has a config max_seq_len;
    # the t2i tokenizer path is fixed at the 77-token BERT window
    ctx_len = cfg["cond_stage_config"]["params"].get("max_seq_len", 77)

    rng = jax.random.PRNGKey(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init_params(jax.random.PRNGKey(0),
                                   context_len=ctx_len)
    params = jax.device_put(params, jax.devices()[0])

    tokens = jnp.zeros((batch, ctx_len), jnp.int32)
    utokens = jnp.zeros((batch, ctx_len), jnp.int32)

    def pipeline(params, rng, tokens, utokens):
        ctx = model.get_learned_conditioning(params, tokens)
        uctx = model.get_learned_conditioning(params, utokens)
        z = model.sample(params, rng, batch, context=ctx,
                         uncond_context=uctx, steps=steps, eta=0.0,
                         guidance_scale=1.5, sampler=sampler,
                         compute_dtype=jnp.bfloat16,
                         cfg_mode=os.environ.get("BENCH_CFG_MODE",
                                                 "sequential"))
        img = model.decode_first_stage(params, z, chunk=decode_chunk)
        # scalar output: on the remote-TPU (axon) platform block_until_ready
        # does not synchronize and full-image device_get crosses the tunnel;
        # a scalar fetch (~30 ms RTT) is the reliable timing barrier.
        return img.mean().astype(jnp.float32)

    fn = jax.jit(pipeline)

    # warmup/compile — the remote-compile tunnel occasionally drops the
    # response mid-stream on very large programs; retry before giving up
    for attempt in range(3):
        try:
            float(fn(params, rng, tokens, utokens))
            break
        except jax.errors.JaxRuntimeError:
            if attempt == 2:
                raise
            time.sleep(10)

    times = []
    for i in range(repeats):
        r = jax.random.fold_in(rng, i)
        t0 = time.perf_counter()
        float(fn(params, r, tokens, utokens))
        times.append(time.perf_counter() - t0)

    best = min(times)
    ips = batch / best
    return {
        "metric": _metric_name(),
        "value": round(ips, 4),
        "unit": "img/s",
        # vs_baseline divides by a LOWER bound on V100 throughput derived
        # from README.md:242 ("within 1 hour"), so this is an UPPER bound
        # on the true multiple — see module docstring. The anchor is the
        # t2i mini-eval claim measured on the DEFAULT t2i config; for
        # other tasks, or an arbitrary BENCH_CONFIG override (whose model
        # the anchor knows nothing about), it is null.
        "vs_baseline": (round(ips / V100_EST_IMG_PER_S, 3)
                        if _task() == "t2i"
                        and "BENCH_CONFIG" not in os.environ else None),
        # provenance: the resolved configuration this number was measured
        # under (VERDICT r3 #3 — bench artifacts must be self-describing)
        "config": {
            "task": _task(),
            "config_path": os.path.relpath(cfg_path, repo),
            "batch": batch,
            "steps": steps,
            "sampler": sampler,
            "cfg_mode": os.environ.get("BENCH_CFG_MODE", "sequential"),
            # resolved through layers._conv_mode() so the recorded value
            # tracks the library default, not just the env override
            "conv_mode": __import__(
                "frido_tpu.nn.layers", fromlist=["_conv_mode"]
            )._conv_mode(),
            "pallas": os.environ.get("FRIDO_PALLAS", "1"),
            "flash": os.environ.get("FRIDO_FLASH", "1"),
            "gn_stats_native": os.environ.get("FRIDO_GN_STATS_NATIVE", "0"),
            "decode_chunk": decode_chunk,
            "repeats": repeats,
            "times_s": [round(t, 3) for t in times],
            "backend": jax.default_backend(),
            "xla_flags": os.environ.get("XLA_FLAGS", ""),
        },
    }


# ---------------------------------------------------------------------------
# orchestrator: fresh-subprocess probe + bench with bounded retries
# ---------------------------------------------------------------------------

def orchestrate() -> int:
    probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "240"))
    bench_timeout = float(os.environ.get("BENCH_TIMEOUT", "2400"))
    attempts = int(os.environ.get("BENCH_ATTEMPTS", "3"))
    diag: list[str] = []

    for i in range(attempts):
        ok, detail = probe(probe_timeout)
        diag.append(f"probe[{i}]: {detail}")
        print(diag[-1], file=sys.stderr)
        if not ok:
            if i < attempts - 1:
                backoff = 30 * (i + 1)
                print(f"backing off {backoff}s before re-probe "
                      "(wedges sometimes clear)", file=sys.stderr)
                time.sleep(backoff)
            continue

        # probe ok → run the bench in a fresh subprocess (a wedge mid-run
        # must not poison this process; timeout bounds a hung tunnel)
        env = dict(os.environ, BENCH_INPROCESS="1")
        try:
            r = subprocess.run([sys.executable, __file__], env=env,
                               timeout=bench_timeout, capture_output=True,
                               text=True)
        except subprocess.TimeoutExpired:
            diag.append(f"bench[{i}]: timed out after {bench_timeout:.0f}s "
                        "(wedge mid-run or compile stall)")
            print(diag[-1], file=sys.stderr)
            continue
        if r.stderr:
            sys.stderr.write(r.stderr)
        line = next((l for l in reversed(r.stdout.strip().splitlines())
                     if l.startswith("{")), None)
        if r.returncode == 0 and line is not None:
            print(line)
            return 0
        # deterministic compile OOM: retrying the identical program is
        # pure wasted chip time (round 5 burned 2x ~13-min compiles
        # re-proving a 97 MB OOM) — report it as its own error class
        oom = re.search(r"Exceeded hbm capacity by [0-9.]+[KMG]?",
                        r.stderr or "")
        if oom:
            print(json.dumps({
                "metric": _metric_name(), "value": None, "unit": "img/s",
                "vs_baseline": None, "error": "hbm_oom",
                "detail": f"XLA compile OOM ({oom.group(0)}) — "
                          "deterministic for this config, not retried",
            }))
            return 0
        tail = (r.stderr or r.stdout or "").strip().splitlines()[-3:]
        diag.append(f"bench[{i}]: rc={r.returncode}: " + " | ".join(tail))
        print(diag[-1], file=sys.stderr)

    # persistent failure → one parseable diagnostic JSON line
    print(json.dumps({
        "metric": _metric_name(),
        "value": None,
        "unit": "img/s",
        "vs_baseline": None,
        "error": "tpu_backend_unavailable",
        "detail": ("axon tunnel did not serve a fresh process after "
                   f"{attempts} probe/bench attempts; last-known-good "
                   "driver-verified value is in BENCH_r01.json, builder "
                   "runs in docs/PERF.md. Diagnostics: "
                   + " || ".join(diag[-4:])),
    }))
    return 0


if __name__ == "__main__":
    if os.environ.get("BENCH_INPROCESS") == "1":
        print(json.dumps(run_bench()))
    else:
        sys.exit(orchestrate())
