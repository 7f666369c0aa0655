#!/usr/bin/env python
"""MS-VQGAN training driver (generator + discriminator).

Drives ``frido_tpu.training.vqgan_trainer`` from an msvqgan config
(``configs/msvqgan/*.yaml``), replacing the Lightning two-optimizer loop
(``/root/reference/taming/models/msvqgan.py:199-261``). Adam betas (0.5,
0.9) and the LR-scaling rule follow the reference.
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", nargs="*", default=[])
    p.add_argument("-t", "--train", default=True)
    p.add_argument("-n", "--name", type=str, default="msvqgan")
    p.add_argument("-l", "--logdir", type=str, default="logs")
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--log_every_steps", type=int, default=50)
    p.add_argument("--ckpt_every_steps", type=int, default=2000)
    p.add_argument("--scale_lr", default=True)
    p.add_argument("--bf16_train", action="store_true",
                   help="bf16 encoder/decoder compute, fp32 master params "
                        "and losses")
    args, unknown = p.parse_known_args()

    import jax
    import optax

    from frido_tpu.config import instantiate_from_config, load_configs
    from frido_tpu.io import checkpoint as ckpt_io
    from frido_tpu.models.msvqgan import msvqgan_from_config
    from frido_tpu.training.vqgan_trainer import (
        create_vqgan_train_state,
        make_vqgan_train_step,
    )

    cfg = load_configs(args.base, dotlist=[u for u in unknown if "=" in u])
    now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
    logdir = os.path.join(args.logdir, f"{now}_{args.name}")
    ckptdir = os.path.join(logdir, "checkpoints")
    os.makedirs(ckptdir, exist_ok=True)
    with open(os.path.join(logdir, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)

    mp = cfg["model"]["params"]
    module = msvqgan_from_config(mp, name=None)
    loss = instantiate_from_config(mp["lossconfig"])

    data = instantiate_from_config(cfg["data"]).setup()
    bs = cfg["data"]["params"]["batch_size"]
    base_lr = cfg["model"]["base_learning_rate"]
    lr = (bs * jax.device_count() * base_lr) if args.scale_lr else base_lr
    print(f"learning rate: {lr:.2e}")
    tx_g = optax.adam(lr, b1=0.5, b2=0.9)
    tx_d = optax.adam(lr, b1=0.5, b2=0.9)

    size = cfg["data"]["params"]["train"]["params"]["target_image_size"]
    # data-dependent init (ActNorm loc/scale, use_actnorm) needs real
    # images — torch computes them from the first training batch
    sample = None
    if mp["lossconfig"].get("params", {}).get("use_actnorm"):
        first = next(iter(data.train_dataloader()))
        sample = np.asarray(first["image"], np.float32)
    # init on host: eager init through the remote-TPU tunnel costs one
    # round-trip per op; CPU init + device_put is minutes faster
    with jax.default_device(jax.devices("cpu")[0]):
        state = create_vqgan_train_state(
            module, loss, jax.random.PRNGKey(args.seed), tx_g, tx_d,
            image_shape=(1, size, size, 3), sample_images=sample)
    state = jax.device_put(state, jax.devices()[0])
    import jax.numpy as _jnp

    step_fn = jax.jit(
        make_vqgan_train_step(
            module, loss, tx_g, tx_d,
            compute_dtype=_jnp.bfloat16 if args.bf16_train else None),
        donate_argnums=(0,))

    step = 0
    t_last = time.time()
    for epoch in range(cfg.get("lightning", {}).get("trainer", {})
                       .get("max_epochs", 50)):
        for batch in data.train_dataloader():
            import jax.numpy as jnp

            x = jnp.asarray(np.asarray(batch["image"], np.float32))
            state, logs = step_fn(state, x)
            step += 1
            if step % args.log_every_steps == 0:
                logs = jax.device_get(logs)
                dt = time.time() - t_last
                t_last = time.time()
                print(f"step {step} aeloss {float(logs['aeloss']):.4f} "
                      f"disc {float(logs['discloss']):.4f} "
                      f"({args.log_every_steps * bs / dt:.1f} img/s)")
            if args.ckpt_every_steps and step % args.ckpt_every_steps == 0:
                ckpt_io.save_train_state(ckptdir, step, state)
            if args.max_steps > 0 and step >= args.max_steps:
                ckpt_io.save_train_state(ckptdir, step, state)
                return
    ckpt_io.save_train_state(ckptdir, step, state)


if __name__ == "__main__":
    main()
