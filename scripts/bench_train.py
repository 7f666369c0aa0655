#!/usr/bin/env python
"""Training-step throughput on the real chip (not the driver headline).

Measures the full jitted train step of the flagship t2i f16f8 model —
2-stage windowed diffusion loss, AdamW update, EMA — on synthetic data,
the analogue of the reference's Lightning steps/sec on a V100
(``/root/reference/main.py`` training loop). Prints one JSON line.

Env: BENCH_BATCH (default 16), BENCH_REPEATS (default 3), BENCH_REMAT=1 to
measure the gradient-checkpointed step, BENCH_BF16=1 for the
mixed-precision (bf16 compute, fp32 master) step, BENCH_MODEL=msvqgan to
measure the first-stage GAN step (f16f8 MS-VQGAN at 256², G+D phases)
instead of the diffusion step, BENCH_CHAIN (default 4) steps dispatched
back-to-back per sync — set 1 to pay the tunnel round trip every step.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from frido_tpu.utils.compilation_cache import enable as _enable_xla_cache

_enable_xla_cache()


def time_step(step_fn, first_args, repeats, sync, next_args=None,
              chain=1):
    """Warm up once, then report best-of-N wall time per step.

    ``sync(logs)`` must fetch a scalar (the tunnel-safe barrier);
    ``next_args(state, i)`` builds the i-th call's remaining args.

    ``chain`` > 1 dispatches that many steps back-to-back and syncs ONCE
    at the end (per-step time = span / chain). This is the number a real
    training loop sees: JAX dispatch is async, so the device runs steps
    back-to-back while the host runs ahead; a per-step scalar fetch
    (chain=1) instead pays the full axon-tunnel round trip every step
    (~50 ms measured r5 — 30% of the batch-16 step). The reference's
    Lightning loop also never blocks on the loss (it logs asynchronously).
    """
    state, logs = step_fn(*first_args)
    sync(logs)
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        for j in range(chain):
            args = (next_args(state, i * chain + j) if next_args
                    else first_args[1:])
            state, logs = step_fn(state, *args)
        sync(logs)
        times.append((time.perf_counter() - t0) / chain)
    return min(times)


def report(metric, batch, best, chain=1):
    print(json.dumps({
        "metric": metric,
        "value": round(batch / best, 4),
        "unit": "img/s",
        "batch": batch,
        "step_ms": round(best * 1000, 1),
        "chain": chain,
    }))


def bench_msvqgan(batch, repeats, bf16):
    """First-stage GAN step: f16f8 MS-VQGAN at 256² on the msvqgan
    config (tools/msvqgan/train_msvqgan_f16f8_coco.sh path)."""
    import optax

    from frido_tpu.config import instantiate_from_config, load_yaml
    from frido_tpu.models.msvqgan import msvqgan_from_config
    from frido_tpu.training.vqgan_trainer import (
        create_vqgan_train_state,
        make_vqgan_train_step,
    )

    mp = load_yaml(os.path.join(
        REPO, "configs/msvqgan/msvqgan_f16f8_coco.yaml"))["model"]["params"]
    module = msvqgan_from_config(mp, name=None)
    # perceptual_weight needs local VGG weights (zero-egress); bench the
    # L1+GAN step like DummyLoss-less training without LPIPS
    mp["lossconfig"]["params"]["perceptual_weight"] = 0.0
    loss = instantiate_from_config(mp["lossconfig"])
    tx_g = optax.adam(4.5e-6, b1=0.5, b2=0.9)
    tx_d = optax.adam(4.5e-6, b1=0.5, b2=0.9)
    with jax.default_device(jax.devices("cpu")[0]):
        state = create_vqgan_train_state(
            module, loss, jax.random.PRNGKey(0), tx_g, tx_d,
            image_shape=(1, 256, 256, 3))
    state = jax.device_put(state, jax.devices()[0])
    step_fn = jax.jit(
        make_vqgan_train_step(
            module, loss, tx_g, tx_d,
            compute_dtype=jnp.bfloat16 if bf16 else None),
        donate_argnums=(0,))
    x = jnp.zeros((batch, 256, 256, 3), jnp.float32)
    chain = int(os.environ.get("BENCH_CHAIN", "4"))
    best = time_step(step_fn, (state, x), repeats,
                     sync=lambda logs: float(logs["aeloss"]), chain=chain)
    report("msvqgan f16f8 GAN step imgs/sec/chip"
           f"{' (bf16)' if bf16 else ''}", batch, best, chain)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    bf16 = os.environ.get("BENCH_BF16", "0") == "1"
    if os.environ.get("BENCH_MODEL", "") == "msvqgan":
        return bench_msvqgan(batch, repeats, bf16)

    import __graft_entry__ as g
    from frido_tpu.config import instantiate_from_config, load_yaml
    from frido_tpu.training import optim, trainer

    cfg = load_yaml(g.FLAGSHIP_CONFIG)["model"]["params"]
    # same construction path as main.py (target-alias resolution)
    model = instantiate_from_config(load_yaml(g.FLAGSHIP_CONFIG)["model"])

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init_params(jax.random.PRNGKey(0), context_len=77)
    # BENCH_MU_DTYPE=bf16 stores the Adam first moment in bf16 (-1.27 GB
    # state; see optim.build_optimizer) — the batch-32 remat enabler
    mu = (jnp.bfloat16
          if os.environ.get("BENCH_MU_DTYPE", "") == "bf16" else None)
    tx = optim.build_optimizer(1e-4, mu_dtype=mu)
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
    chain = int(os.environ.get("BENCH_CHAIN", "4"))
    best = time_step(
        step_fn, (state, batch_arrays, rng), repeats,
        sync=lambda logs: float(logs["loss"]),
        next_args=lambda s, i: (batch_arrays, jax.random.fold_in(rng, i)),
        chain=chain)
    report(f"t2i f16f8 train step imgs/sec/chip"
           f"{' (remat)' if remat else ''}"
           f"{' (bf16)' if bf16 else ''}"
           f"{' (mu=bf16)' if mu is not None else ''}", batch, best, chain)


if __name__ == "__main__":
    main()
