#!/usr/bin/env python
"""Training-step throughput on the real chip (not the driver headline).

Measures the full jitted train step of the flagship t2i f16f8 model —
2-stage windowed diffusion loss, AdamW update, EMA — on synthetic data,
the analogue of the reference's Lightning steps/sec on a V100
(``/root/reference/main.py`` training loop). Prints one JSON line.

Env: BENCH_BATCH (default 16), BENCH_REPEATS (default 3), BENCH_REMAT=1 to
measure the gradient-checkpointed step, BENCH_BF16=1 for the
mixed-precision (bf16 compute, fp32 master) step.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    bf16 = os.environ.get("BENCH_BF16", "0") == "1"

    import __graft_entry__ as g
    from frido_tpu.config import load_yaml
    from frido_tpu.models.frido import FridoDiffusion
    from frido_tpu.training import optim, trainer

    cfg = load_yaml(g.FLAGSHIP_CONFIG)["model"]["params"]
    model = FridoDiffusion(
        first_stage_config=cfg["first_stage_config"],
        cond_stage_config=cfg["cond_stage_config"],
        unet_config=cfg["unet_config"],
        **{k: v for k, v in cfg.items()
           if k not in ("first_stage_config", "cond_stage_config",
                        "unet_config")})

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init_params(jax.random.PRNGKey(0), context_len=77)
    tx = optim.build_optimizer(1e-4)
    state, masked_tx = trainer.create_train_state(model, params, tx)
    state = jax.device_put(state, jax.devices()[0])
    step_fn = jax.jit(
        trainer.make_train_step(
            model, masked_tx, remat=remat,
            compute_dtype=jnp.bfloat16 if bf16 else None),
        donate_argnums=(0,))

    side = 4 * 2 ** (len(cfg["first_stage_config"]["params"]
                         ["edconfig"]["ch_mult"]) - 1) * 4  # 256
    batch_arrays = {
        "image": jnp.zeros((batch, side, side, 3), jnp.float32),
        "tokens": jnp.zeros((batch, 77), jnp.int32),
    }
    rng = jax.random.PRNGKey(0)

    state, logs = step_fn(state, batch_arrays, rng)  # compile
    float(logs["loss"])  # sync (scalar fetch is the tunnel-safe barrier)

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        state, logs = step_fn(state, batch_arrays, jax.random.fold_in(rng, i))
        float(logs["loss"])
        times.append(time.perf_counter() - t0)

    best = min(times)
    print(json.dumps({
        "metric": f"t2i f16f8 train step imgs/sec/chip"
                  f"{' (remat)' if remat else ''}"
                  f"{' (bf16)' if bf16 else ''}",
        "value": round(batch / best, 4),
        "unit": "img/s",
        "batch": batch,
        "step_ms": round(best * 1000, 1),
    }))


if __name__ == "__main__":
    main()
