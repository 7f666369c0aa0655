"""XLA-flag and conv-mode sweep on the headline pipeline (VERDICT r2 #2d).

Runs ``bench.py`` (in-process worker mode) in a fresh subprocess per
configuration so each gets its own XLA_FLAGS, and prints one line per
config. Each subprocess is bounded; a wedged tunnel fails the config
rather than the sweep.

Configs swept (edit CONFIGS for more):
  * baseline (current defaults)
  * FRIDO_CONV_MODE = shift9 / pallas (conv reformulations end-to-end)
  * latency-hiding scheduler flag
  * async-collectives off (single chip: should be neutral; sanity row)

Usage: ``python scripts/bench_conv_flags.py [quick]`` — ``quick`` drops to
50 steps / 1 repeat for a faster first pass (relative ordering holds; the
winner should be re-run at full 200 steps).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("baseline", {"FRIDO_CONV_MODE": "conv"}),
    ("conv=auto", {"FRIDO_CONV_MODE": "auto"}),
    ("conv=pad128", {"FRIDO_CONV_MODE": "pad128"}),
    ("conv=pallas", {"FRIDO_CONV_MODE": "pallas"}),
    ("conv=pallas_fused", {"FRIDO_CONV_MODE": "pallas_fused"}),
    ("conv=shift9", {"FRIDO_CONV_MODE": "shift9"}),
    ("conv=im2col", {"FRIDO_CONV_MODE": "im2col"}),
    # round 4: the smalls-attention kernel is off by default (in-program
    # loss, see nn/transformer.py); this row re-measures it end-to-end
    ("smalls-attn", {"FRIDO_SMALLS_ATTN": "1"}),
    # round 4: re-measure the all-Pallas-off ablation at the current
    # batch-128 defaults (VERDICT r3 #8 — the 2.177 img/s row in PERF.md
    # predates the batch-128 config and the dispatch-table changes)
    ("pallas=0", {"FRIDO_PALLAS": "0"}),
    # NOTE: --xla_tpu_enable_latency_hiding_scheduler was removed — this
    # jax/XLA build rejects it as an unknown flag (chip run 2026-08-19)
]


def main():
    quick = "quick" in sys.argv[1:]
    only = next((a.split("=", 1)[1].split(",") for a in sys.argv[1:]
                 if a.startswith("only=")), None)
    configs = ([(n, e) for n, e in CONFIGS if n in only]
               if only else CONFIGS)
    results = []
    for name, extra in configs:
        env = dict(os.environ, BENCH_INPROCESS="1")
        if quick:
            env.setdefault("BENCH_STEPS", "50")
            env.setdefault("BENCH_REPEATS", "1")
        base_flags = env.get("XLA_FLAGS", "")
        for k, v in extra.items():
            env[k] = (base_flags + " " + v).strip() if k == "XLA_FLAGS" else v
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")], env=env,
                timeout=float(os.environ.get("BENCH_TIMEOUT", "2400")),
                capture_output=True, text=True, cwd=REPO)
            line = next((l for l in reversed(r.stdout.strip().splitlines())
                         if l.startswith("{")), None)
            if r.returncode == 0 and line:
                val = json.loads(line).get("value")
                results.append((name, val))
                print(f"{name:24s} {val} img/s", flush=True)
                save = os.environ.get("BENCH_SAVE_DIR")
                if save:  # full self-describing JSON line per config
                    os.makedirs(save, exist_ok=True)
                    fname = name.replace("=", "_").replace("+", "_")
                    with open(os.path.join(save, f"flags_{fname}.json"),
                              "w") as f:
                        f.write(line + "\n")
                continue
            tail = (r.stderr or r.stdout).strip().splitlines()[-2:]
            print(f"{name:24s} FAILED rc={r.returncode}: {' | '.join(tail)}",
                  flush=True)
        except subprocess.TimeoutExpired:
            print(f"{name:24s} TIMEOUT", flush=True)
        results.append((name, None))
    ok = [(n, v) for n, v in results if v]
    if ok:
        best = max(ok, key=lambda t: t[1])
        print(f"best: {best[0]} at {best[1]} img/s")


if __name__ == "__main__":
    main()
