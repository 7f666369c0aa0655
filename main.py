#!/usr/bin/env python
"""Training driver.

Mirrors the public surface of ``/root/reference/main.py`` (flags: --base,
-t, -n, -r/--resume, --scale_lr, --seed, dot-list overrides) with the
TPU-native execution model: one pjit-compiled train step over the device
mesh replaces Lightning DDP; checkpoints are orbax pytrees; SIGUSR1 saves
``last``; auto-resume scans the logdir for the newest same-name run.
"""

from __future__ import annotations

import argparse
import csv
import datetime
import json
import os
import signal
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("-n", "--name", type=str, default="")
    p.add_argument("-r", "--resume", type=str, default="")
    p.add_argument("-b", "--base", nargs="*", metavar="base_config.yaml",
                   default=[])
    p.add_argument("-t", "--train", type=str2bool, default=False, nargs="?",
                   const=True)
    p.add_argument("--no-test", type=str2bool, default=False, nargs="?")
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("-l", "--logdir", type=str, default="logs")
    p.add_argument("--scale_lr", type=str2bool, default=True, nargs="?")
    p.add_argument("--auto_resume", type=str2bool, default=False)
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--max_epochs", type=int, default=-1)
    p.add_argument("--ckpt_every_steps", type=int, default=0)
    p.add_argument("--log_every_steps", type=int, default=50)
    p.add_argument("--val_every_steps", type=int, default=2000)
    p.add_argument("--val_batches", type=int, default=-1,
                   help="val batches per validation pass (-1 = the full "
                        "val split, like the reference's Lightning "
                        "validation loop)")
    p.add_argument("-tb", "--tensorboard", type=str2bool, default=False,
                   help="also log scalars to TensorBoard (logdir/tb)")
    p.add_argument("--wandb", type=str2bool, default=False,
                   help="also log scalars to Weights & Biases (reference "
                        "main.py:684-717); degrades to CSV if not installed")
    p.add_argument("-d", "--debug", type=str2bool, default=False,
                   help="post-mortem pdb on failure + move a fresh run's "
                        "logdir to debug_runs/ (reference main.py:843-857)")
    p.add_argument("--no_test", type=str2bool, default=False,
                   help="skip the post-fit test-split sampling pass "
                        "(reference main.py:835-842)")
    p.add_argument("--test_steps", type=int, default=200,
                   help="sampler steps for the post-fit test pass")
    p.add_argument("--test_batches", type=int, default=-1,
                   help="limit test batches (-1 = whole split)")
    p.add_argument("--n_devices", type=int, default=0,
                   help="data-parallel devices (0 = all)")
    p.add_argument("--accumulate_grad_batches", type=int, default=1)
    p.add_argument("--img_log_every_steps", type=int, default=1000)
    p.add_argument("--bf16_train", type=str2bool, default=False, nargs="?",
                   const=True,
                   help="mixed-precision training: bf16 UNet fwd/bwd with "
                        "fp32 master params/optimizer (the reference's fp16 "
                        "flag is a no-op; fp32 remains the parity default)")
    p.add_argument("--adam_mu_bf16", type=str2bool, default=False,
                   nargs="?", const=True,
                   help="store the Adam first moment in bf16 (-1.27 GB "
                        "HBM on the flagship; fits the batch-32 remat "
                        "step — see docs/PERF.md). Default fp32 matches "
                        "the reference's torch AdamW exactly.")
    p.add_argument("--fsdp", type=str2bool, default=False, nargs="?",
                   const=True,
                   help="shard params/optimizer/EMA over the data axis "
                        "(ZeRO-3 equivalent; parallel/fsdp.py). Peak HBM "
                        "for train state drops ~n_devices-fold; numerics "
                        "match replicated DP (tests/test_fsdp.py)")
    p.add_argument("--uncond_gen_mode", type=str2bool, default=False,
                   nargs="?", const=True,
                   help="reset the test-pass seed to seed+rank for "
                        "unconditional generation (reference "
                        "main.py:143-148,835-842; rank = process index)")
    return p


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


class CSVLogger:
    def __init__(self, path):
        self.path = path
        self.keys = None

    def log(self, step, metrics):
        metrics = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        new = self.keys is None
        if new:
            self.keys = list(metrics.keys())
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self.keys, extrasaction="ignore")
            if new:
                w.writeheader()
            w.writerow(metrics)


class TensorBoardLogger:
    """Optional TB scalars next to the CSV (the reference's ``-tb`` /
    TestTube option, ``main.py:684-717``)."""

    def __init__(self, logdir):
        from torch.utils.tensorboard import SummaryWriter

        self.writer = SummaryWriter(logdir)

    def log(self, step, metrics):
        for k, v in metrics.items():
            self.writer.add_scalar(k, float(v), step)


class WandbLogger:
    """Optional Weights & Biases scalars (the reference's wandb logger
    config branch, ``main.py:684-717``). Raises ImportError when wandb
    isn't installed — callers degrade to CSV, matching the TB path."""

    def __init__(self, logdir, run_name, config=None):
        import wandb

        self.run = wandb.init(project="frido_tpu", name=run_name,
                              dir=logdir, config=config or {})

    def log(self, step, metrics):
        self.run.log({k: float(v) for k, v in metrics.items()}, step=step)


class MultiLogger:
    def __init__(self, *loggers):
        self.loggers = [lg for lg in loggers if lg is not None]

    def log(self, step, metrics):
        for lg in self.loggers:
            lg.log(step, metrics)


def batch_to_arrays(model, batch):
    import jax.numpy as jnp

    out = {"image": jnp.asarray(np.asarray(batch["image"], np.float32))}
    key = model.cond_stage_key
    if model.cond_wrapper is not None:
        cond = batch[key] if key in batch else batch
        out["tokens"] = jnp.asarray(np.asarray(model.tokenize(cond)))
    return out


_RUN_LOGDIR = {"path": "", "fresh": False}


def main():
    """Post-mortem debugging + debug_runs/ relocation wrapper
    (reference main.py:843-857)."""
    from frido_tpu.utils.compilation_cache import enable as enable_xla_cache

    enable_xla_cache()
    args, unknown = get_parser().parse_known_args()
    try:
        _main(args, unknown)
    except Exception:
        if args.debug:
            import pdb

            pdb.post_mortem()
        raise
    finally:
        if args.debug and _RUN_LOGDIR["fresh"] and _RUN_LOGDIR["path"]:
            src = _RUN_LOGDIR["path"]
            base, name = os.path.split(src)
            dst = os.path.join(base, "debug_runs", name)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if os.path.exists(src):
                os.rename(src, dst)
                print(f"debug run moved to {dst}")


def _main(args, unknown):
    import jax
    import jax.numpy as jnp

    from frido_tpu.config import instantiate_from_config, load_configs
    from frido_tpu.io import checkpoint as ckpt_io
    from frido_tpu.parallel import fsdp, mesh as pmesh
    from frido_tpu.training import optim, trainer

    now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")

    name = (args.name or
            os.path.splitext(os.path.basename(args.base[0]))[0]
            if args.base else args.name)
    if args.resume:
        logdir = args.resume
    elif args.auto_resume and (found := ckpt_io.find_resume(args.logdir, name)):
        print(f"Auto-resuming from {found}")
        logdir = found
    else:
        logdir = None
    if logdir:
        # reference main.py:631-632: a resumed run re-merges the configs
        # persisted in its logdir BEFORE the -b bases and CLI overrides, so
        # the original hyperparameters survive a bare-resume invocation
        import glob as _glob

        persisted = sorted(_glob.glob(os.path.join(logdir, "configs",
                                                   "*.yaml")))
        if persisted:
            args.base = persisted + list(args.base)
    cfg = load_configs(args.base, dotlist=[u for u in unknown if "=" in u])
    if not name:
        name = os.path.splitext(os.path.basename(args.base[0]))[0]
    if logdir is None:
        logdir = os.path.join(args.logdir, f"{now}_{name}")
        _RUN_LOGDIR.update(fresh=True)
    _RUN_LOGDIR.update(path=logdir)
    ckptdir = os.path.join(logdir, "checkpoints")
    cfgdir = os.path.join(logdir, "configs")
    os.makedirs(ckptdir, exist_ok=True)
    os.makedirs(cfgdir, exist_ok=True)
    with open(os.path.join(cfgdir, f"{now}-project.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)

    # ---- model ----------------------------------------------------------
    mp = dict(cfg["model"]["params"])
    model = instantiate_from_config(cfg["model"])
    rng = jax.random.PRNGKey(args.seed)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init_params(rng)
    fs_ckpt = model.first_stage_ckpt
    if fs_ckpt and os.path.exists(fs_ckpt):
        print(f"Loading frozen first stage from {fs_ckpt}")
        from frido_tpu.io.torch_import import (
            import_state_dict, load_torch_checkpoint)

        sd = load_torch_checkpoint(fs_ckpt)
        fs_tree = import_state_dict(
            params["params"]["first_stage_model"], sd, strict=False)
        params = {"params": {**params["params"],
                             "first_stage_model": fs_tree}}

    # ---- data -----------------------------------------------------------
    data = instantiate_from_config(cfg["data"]).setup()
    batch_size = cfg["data"]["params"]["batch_size"]

    # ---- optimizer (LR scaling rule, main.py:793-810) -------------------
    n_dev = args.n_devices or jax.device_count()
    base_lr = cfg["model"]["base_learning_rate"]
    lr = optim.scaled_learning_rate(base_lr, batch_size, n_dev,
                                    args.accumulate_grad_batches,
                                    args.scale_lr)
    print(f"Setting learning rate to {lr:.2e}")
    sched_cfg = mp.get("scheduler_config")
    tx = optim.build_from_config(
        lr, sched_cfg, accumulate_grad_batches=args.accumulate_grad_batches,
        mu_dtype=jnp.bfloat16 if args.adam_mu_bf16 else None)
    state, masked_tx = trainer.create_train_state(model, params, tx)

    sf_path = os.path.join(ckptdir, "scale_factors.json")
    start_step = 0
    # loader cursor (0-based shuffle epoch + batches consumed within it);
    # persisted in last.json so resume replays the uninterrupted run's
    # batch sequence (Lightning preserves loader state, main.py:630)
    cursor = {"epoch": 0, "batch": 0}
    if os.path.exists(os.path.join(ckptdir, "last.json")):
        state, start_step = ckpt_io.restore_train_state(ckptdir, state)
        meta = ckpt_io.read_last_meta(ckptdir)
        cursor["epoch"] = int(meta.get("epoch", 0))
        cursor["batch"] = int(meta.get("batch_in_epoch", 0))
        print(f"Restored training state at step {start_step} "
              f"(epoch {cursor['epoch']}, batch {cursor['batch']})")
        if os.path.exists(sf_path):
            model.scale_factors = np.asarray(
                json.load(open(sf_path)), np.float32)
    elif getattr(model, "scale_by_std", False):
        # reference: per-stage 1/std of the first batch's latents
        # (frido.py:562-593, rank-zero at step 0, no resume); persisted
        # next to the checkpoints like the ckpt's scale_factor buffer
        first = next(iter(data.train_dataloader()))
        sf = model.init_scale_by_std(
            jax.device_get(state.params),
            batch_to_arrays(model, first)["image"])
        os.makedirs(ckptdir, exist_ok=True)
        json.dump(sf.tolist(), open(sf_path, "w"))
        print(f"scale_by_std: per-stage scale factors {sf.tolist()}")

    mesh = pmesh.make_mesh(n_data=n_dev)
    use_remat = bool(mp.get("unet_config", {}).get("params", {})
                     .get("use_checkpoint", False))
    if args.fsdp:
        # ZeRO-3 equivalent: state sharded over the data axis; GSPMD
        # all-gathers params per layer and reduce-scatters grads
        state_sh = fsdp.state_shardings(mesh, state)
        params_sh = state_sh.params
    else:
        state_sh = params_sh = pmesh.replicated(mesh)
    step_fn = jax.jit(
        trainer.make_train_step(
            model, masked_tx, remat=use_remat,
            compute_dtype=jnp.bfloat16 if args.bf16_train else None),
        in_shardings=(state_sh, pmesh.batch_sharding(mesh),
                      pmesh.replicated(mesh)),
        out_shardings=(state_sh, pmesh.replicated(mesh)),
        # donate the train state: params/opt/EMA update in place instead of
        # allocating a second copy of the largest buffers every step
        donate_argnums=(0,))
    eval_fn = jax.jit(
        trainer.make_eval_step(model),
        in_shardings=(params_sh, pmesh.batch_sharding(mesh),
                      pmesh.replicated(mesh)),
        out_shardings=pmesh.replicated(mesh))
    state = (fsdp.shard_state(mesh, state) if args.fsdp
             else pmesh.replicate(mesh, state))

    logger = CSVLogger(os.path.join(logdir, "metrics.csv"))
    if args.tensorboard:
        try:
            logger = MultiLogger(
                logger, TensorBoardLogger(os.path.join(logdir, "tb")))
        except ImportError:
            print("tensorboard unavailable; CSV logging only")
    if args.wandb:
        try:
            logger = MultiLogger(
                logger, WandbLogger(logdir, os.path.basename(logdir)))
        except ImportError:
            print("wandb unavailable; falling back to CSV logging")
    from frido_tpu.training.image_logger import ImageLogger

    img_logger = ImageLogger(logdir, every_steps=args.img_log_every_steps)

    stop_requested = {"save": False}
    signal.signal(signal.SIGUSR1, lambda *_: stop_requested.update(save=True))

    def _usr2_debugger(signum, frame):
        # reference main.py:813-826: SIGUSR2 -> live-attach debugger (pudb
        # there, stdlib pdb here). The handler runs in the main thread
        # between bytecodes, so set_trace attaches at the interrupted frame.
        # Without a tty, pdb would read EOF -> set_quit -> BdbQuit kills
        # the run; dump the live stack instead (still actionable from logs).
        import sys as _sys

        if _sys.stdin.isatty():
            print("SIGUSR2 received: attaching pdb (c to continue)",
                  flush=True)
            import pdb

            pdb.Pdb().set_trace(frame)
        else:
            import traceback

            print("SIGUSR2 received: no tty, dumping stack", flush=True)
            traceback.print_stack(frame)

    signal.signal(signal.SIGUSR2, _usr2_debugger)

    def save(step):
        try:
            ckpt_io.save_train_state(
                ckptdir, step, state,
                meta={"epoch": cursor["epoch"],
                      "batch_in_epoch": cursor["batch"]})
        except RuntimeError as e:
            # an interrupt can land while the donated state is mid-step
            # (input buffers already consumed, result not yet bound); the
            # previous `last` checkpoint is still intact on disk. Match the
            # specific jax donated-buffer message so unrelated RuntimeErrors
            # that merely mention deletion (e.g. file errors) still raise.
            if "array has been deleted" not in str(e).lower():
                raise
            print(f"skipping rescue save (state mid-step): {e}")
            return
        print(f"Saved checkpoint at step {step}")

    best_monitor = {"value": float("inf")}
    # val images at the img_log cadence, not every validation pass
    last_val_img = {"step": -10**9}

    def validate(step):
        """val/loss + val/loss_ema over a few val batches; keeps a 'best'
        checkpoint on the monitor like the reference's ModelCheckpoint
        (monitor val/loss_ema, save_top_k=1)."""
        losses, losses_ema = [], []
        vrng = jax.random.PRNGKey(1234)
        for i, vbatch in enumerate(data.val_dataloader()):
            if 0 < args.val_batches <= i:
                break
            arrays = pmesh.shard_batch(mesh, batch_to_arrays(model, vbatch))
            vrng, k = jax.random.split(vrng)
            losses.append(float(eval_fn(state.params, arrays, k)))
            losses_ema.append(float(eval_fn(
                trainer.ema_full_params(state), arrays, k)))
            if (i == 0 and img_logger.every_steps > 0
                    and step - last_val_img["step"]
                    >= img_logger.every_steps):
                last_val_img["step"] = step
                try:  # val-split image grids, like the reference's
                    # ImageLogger on validation batches (main.py:495-538)
                    img_logger.log_train(
                        model,
                        jax.device_get(trainer.ema_full_params(state)),
                        vbatch, step, split="val",
                        dataset=data.datasets.get("validation"))
                except Exception as e:
                    print(f"val image logging failed: {e}")
        if not losses:
            return
        val_loss = sum(losses) / len(losses)
        val_loss_ema = sum(losses_ema) / len(losses_ema)
        logger.log(step, {"val/loss": val_loss,
                          "val/loss_ema": val_loss_ema})
        print(f"step {step} val/loss {val_loss:.4f} "
              f"val/loss_ema {val_loss_ema:.4f}")
        if val_loss_ema < best_monitor["value"]:
            best_monitor["value"] = val_loss_ema
            ckpt_io.save_train_state(ckptdir, step, state, tag="best")
            print(f"New best val/loss_ema {val_loss_ema:.4f}; "
                  "saved 'best' checkpoint")

    if not args.train:
        print("Train flag not set (-t True); exiting after setup.")
        return

    step = start_step
    train_loader = data.train_dataloader()
    if cursor["epoch"] or cursor["batch"]:
        train_loader.set_cursor(cursor["epoch"], cursor["batch"])
    t_last = time.time()
    try:
        while True:
            if args.max_epochs > 0 and cursor["epoch"] >= args.max_epochs:
                break
            for batch in train_loader:
                arrays = pmesh.shard_batch(mesh, batch_to_arrays(model, batch))
                state, logs = step_fn(state, arrays, rng)
                step += 1
                cursor["batch"] += 1
                if step % args.log_every_steps == 0:
                    logs = jax.device_get(logs)
                    dt = time.time() - t_last
                    t_last = time.time()
                    ips = args.log_every_steps * batch_size / dt
                    logger.log(step, {**logs, "img_per_s": ips})
                    print(f"step {step} loss {float(logs['loss']):.4f} "
                          f"({ips:.1f} img/s)")
                if args.val_every_steps and step % args.val_every_steps == 0:
                    validate(step)
                if img_logger.should_log(step):
                    try:
                        # sample under EMA weights, like the reference's
                        # ema_scope around log_images (frido.py:1454-1590)
                        img_logger.log_train(
                            model,
                            jax.device_get(trainer.ema_full_params(state)),
                            batch, step,
                            dataset=data.datasets.get("train"))
                    except Exception as e:  # logging must never kill a run
                        print(f"image logging failed: {e}")
                if args.ckpt_every_steps and step % args.ckpt_every_steps == 0:
                    save(step)
                if stop_requested["save"]:
                    save(step)
                    stop_requested["save"] = False
                if args.max_steps > 0 and step >= args.max_steps:
                    raise StopIteration
            cursor["epoch"] += 1
            cursor["batch"] = 0
            save(step)
    except (StopIteration, KeyboardInterrupt):
        save(step)

    if not args.no_test:
        # post-fit test pass: sample the test split under EMA weights and
        # write per-sample PNGs, the reference's trainer.test + ImageLogger
        # behavior (main.py:835-842, 451-493)
        print("testing time")
        run_test(args, model, jax.device_get(trainer.ema_full_params(state)),
                 data, logdir)


def run_test(args, model, params, data, logdir):
    import jax
    import jax.numpy as jnp

    from frido_tpu.utils.visualize import save_image, to_uint8

    out_dir = os.path.join(logdir, "test")
    for sub in ("sample", "inputs"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    cond_key = model.cond_stage_key

    seed = args.seed
    if getattr(args, "uncond_gen_mode", False):
        # reference main.py:835-842: shift the seed by the rank so parallel
        # unconditional test passes draw distinct samples
        seed = args.seed + jax.process_index()
        print("reset seed for unconditional generation.")
        print(f"Set seed to {seed}.")
        print("Testing mode on! Auto shift random seed by number of rank.")

    @jax.jit
    def pipeline(params, rng, tokens):
        ctx = model.get_learned_conditioning(params, tokens)
        z = model.sample(params, rng, tokens.shape[0], context=ctx,
                         steps=args.test_steps, sampler="ddim",
                         compute_dtype=jnp.bfloat16)
        return model.decode_first_stage(params, z)

    rng = jax.random.PRNGKey(seed)
    n_saved = 0
    for i, batch in enumerate(data.test_dataloader()):
        if args.test_batches > 0 and i >= args.test_batches:
            break
        cond = batch[cond_key] if cond_key in batch else batch
        tokens = jnp.asarray(np.asarray(model.tokenize(cond)))
        rng, k = jax.random.split(rng)
        t0 = time.time()
        imgs = np.asarray(pipeline(params, k, tokens))
        print(f"Throughput for this batch: "
              f"{imgs.shape[0] / (time.time() - t0):.4f}")
        names = batch.get("file_name")
        for j, img in enumerate(imgs):
            name = (names[j] if names is not None
                    else f"{n_saved:06}.png")
            name = os.path.splitext(os.path.basename(str(name)))[0] + ".png"
            save_image(img, os.path.join(out_dir, "sample", name))
            if "image" in batch:
                save_image(np.asarray(batch["image"][j], np.float32),
                           os.path.join(out_dir, "inputs", name))
            n_saved += 1
    print(f"test pass: {n_saved} samples in {out_dir}")


if __name__ == "__main__":
    main()
