#!/usr/bin/env python
"""Batched conditional sampling / evaluation driver.

Mirrors the public surface of ``/root/reference/scripts/sample_diffusion.py``
(flags: -r/-cfg/-o/-n/-plms/-e/-c/-bs/-G/-gs/-ngpu/-igpu) with the TPU-native
execution model: the whole PLMS/DDIM chain + decode is one jitted program,
batches are sharded over the device mesh instead of launching N processes,
and per-batch throughput is printed (the BASELINE.md metric).

Extra convenience: ``--prompt "..."`` samples from raw text without a
dataset (the demo.ipynb path).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("-r", "--resume", type=str, default=None,
                   help="checkpoint (.ckpt torch file, orbax dir, a run's "
                        "checkpoints/ dir, or a run logdir — the latter two "
                        "resolve the 'last' pointer)")
    p.add_argument("-cfg", "--cfg_path", type=str, required=True)
    p.add_argument("-name", "--exp_name", type=str, default="v0")
    p.add_argument("-o", "--output_path", type=str, default="",
                   help="output base ('' = <run logdir>/samples, the "
                        "reference default)")
    p.add_argument("-l", "--logdir", type=str, default="none",
                   help="extra logdir: relocate the run's sample output "
                        "under this base (reference -l)")
    p.add_argument("-n", "--n_samples", type=int, default=-1)
    p.add_argument("-plms", "--plms", action="store_true")
    p.add_argument("-dpmpp", "--dpmpp", action="store_true",
                   help="DPM-Solver++(2M): ~200-step-PLMS quality in "
                        "20-30 steps (beyond-parity fast sampler)")
    p.add_argument("-e", "--eta", type=float, default=1.0)
    p.add_argument("-v", "--vanilla_sample", action="store_true",
                   help="full-T ancestral sampling")
    p.add_argument("-c", "--custom_steps", type=int, default=200)
    p.add_argument("-bs", "--batch_size", type=int, default=10)
    p.add_argument("-G", "--use_guidance", action="store_true")
    p.add_argument("-gs", "--guidance_scale", type=float, default=1.0)
    p.add_argument("-ngpu", "--num_shards", type=int, default=1,
                   help="split the test set into N deterministic groups")
    p.add_argument("-igpu", "--shard_idx", type=int, default=0)
    p.add_argument("--prompt", type=str, default=None,
                   help="sample from a raw text prompt (t2i, no dataset)")
    p.add_argument("--no_ema", action="store_true",
                   help="sample with raw weights instead of EMA")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--profile", type=str, default="",
                   help="jax.profiler trace dir (view in xprof/TensorBoard)")
    p.add_argument("--get_codebook", action="store_true",
                   help="also dump per-scale codebook indices "
                        "(codes_*.npz) for analysis")
    return p


def to_uint8(img):
    img = np.clip((np.asarray(img, dtype=np.float32) + 1.0) * 127.5, 0, 255)
    return img.astype(np.uint8)


def save_batch(imgs, out_dir, names=None, n_saved=0, key="sample"):
    from PIL import Image

    d = os.path.join(out_dir, key)
    os.makedirs(d, exist_ok=True)
    for i, arr in enumerate(to_uint8(imgs)):
        if names is not None:
            fname = os.path.splitext(os.path.basename(str(names[i])))[0] + ".png"
        else:
            fname = f"{key}_{n_saved:06}.png"
        Image.fromarray(arr).save(os.path.join(d, fname))
        n_saved += 1
    return n_saved


def resolve_resume(resume):
    """Map the -r forms (reference sample_diffusion.py:480-497) to a
    concrete checkpoint leaf + the run logdir: a torch .ckpt file, an orbax
    leaf dir (params-only / step_N / best), a ``<run>/checkpoints`` dir, or
    a run logdir (both resolve the ``last`` pointer). Returns
    (ckpt, run_logdir)."""
    if not resume:
        return None, None
    r = resume.rstrip("/")
    if os.path.isdir(os.path.join(r, "checkpoints")):
        cdir, run = os.path.join(r, "checkpoints"), r
    elif os.path.isdir(r) and os.path.exists(os.path.join(r, "last.json")):
        cdir, run = r, os.path.dirname(r)
    else:  # file or orbax leaf dir
        d = os.path.dirname(os.path.abspath(r))
        run = os.path.dirname(d) if os.path.basename(d) == "checkpoints" else d
        return r, run
    with open(os.path.join(cdir, "last.json")) as f:
        meta = json.load(f)
    # Rebuild from the basename rather than trusting the stored path: it was
    # recorded at train time and may be relative to a different cwd (or the
    # run may have been copied from another machine).
    leaf = os.path.join(cdir, os.path.basename(meta["path"].rstrip("/")))
    return (leaf if os.path.exists(leaf) else meta["path"]), run


def build_model(cfg, ckpt, use_ema=True):
    import jax

    from frido_tpu.models.frido import FridoDiffusion
    from frido_tpu.training.ema import import_ema

    if ckpt and os.path.isfile(ckpt):
        # Imported torch checkpoints were trained with real HF vocabs; the
        # vendored char/byte fallback vocab would silently sample garbage
        # against their embedding rows — make the tokenizer fail hard
        # instead (frido_tpu/nn/encoders.py). From-scratch runs (orbax
        # dirs) keep the fallback: they trained with the same ids.
        os.environ.setdefault("FRIDO_TPU_STRICT_VOCAB", "1")

    mp = dict(cfg["model"]["params"])
    model = FridoDiffusion(
        first_stage_config=mp.pop("first_stage_config"),
        cond_stage_config=mp.pop("cond_stage_config"),
        unet_config=mp.pop("unet_config"), **mp)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init_params(jax.random.PRNGKey(0))
    if ckpt:
        if os.path.isdir(ckpt):
            from frido_tpu.io import checkpoint as ckpt_io

            raw = ckpt_io.restore_raw(ckpt)
            if isinstance(raw, dict) and "ema_params" in raw:
                # a full train-state dir (step_N / best / last target):
                # sample under the EMA tree like the reference's ema_scope
                tree = raw["params"]
                ema = raw.get("ema_params")
                if use_ema and ema is not None:
                    if "diffusion_model" in ema:
                        # UNet-only shadow (LitEma wraps self.model):
                        # swap it into the full tree
                        tree = {"params": {**raw["params"]["params"],
                                           "model": ema}}
                    else:  # legacy full-tree shadow
                        tree = ema
                print(f"Restored {'EMA ' if use_ema else ''}params from "
                      f"train state {ckpt}")
                params = jax.tree_util.tree_map(np.asarray, tree)
            else:
                params = ckpt_io.restore_params(ckpt, params)
        else:
            print(f"Loading torch checkpoint {ckpt}")
            params = model.load_torch_checkpoint(ckpt, params)
            if use_ema:
                from frido_tpu.io.torch_import import load_torch_checkpoint

                sd = load_torch_checkpoint(ckpt)
                if any(k.startswith("model_ema.") for k in sd):
                    print("Swapping in EMA weights for sampling")
                    ema_tree = import_ema(
                        params["params"]["model"], sd)
                    params = {"params": {**params["params"],
                                         "model": ema_tree}}
    return model, params


def make_pipeline(model, params, args):
    import jax
    import jax.numpy as jnp

    sampler = ("vanilla" if args.vanilla_sample
               else "dpmpp" if getattr(args, "dpmpp", False)
               else "plms" if args.plms else "ddim")
    eta = 0.0 if sampler in ("plms", "dpmpp") else args.eta
    gs = args.guidance_scale if args.use_guidance else 1.0
    dtype = jnp.bfloat16 if args.bf16 else None

    get_codes = getattr(args, "get_codebook", False)

    def pipeline(params, rng, tokens, utokens):
        ctx = model.get_learned_conditioning(params, tokens)
        uctx = (model.get_learned_conditioning(params, utokens)
                if gs != 1.0 else None)
        b = tokens.shape[0]
        z = model.sample(params, rng, b, context=ctx, uncond_context=uctx,
                         steps=args.custom_steps, eta=eta,
                         guidance_scale=gs, sampler=sampler,
                         compute_dtype=dtype)
        if get_codes:
            return model.decode_first_stage_with_codes(params, z)
        return model.decode_first_stage(params, z)

    return jax.jit(pipeline)


def dummy_tokens_like(model, tokens, cond_stage_key):
    """Unconditional conditioning (sample_diffusion.py:241-256): empty
    strings for tokenized text, dummy token 0 otherwise."""
    if getattr(model.cond_wrapper, "use_tokenizer", False):
        return model.tokenize([""] * tokens.shape[0])
    return np.zeros_like(tokens)


def main():
    # unknown args are OmegaConf-style dot-list config overrides
    # (a.b.c=value), mirroring main.py / reference main.py:653-655 — lets
    # e.g. tools/acceptance.sh retarget data_path without editing configs
    args, unknown = get_parser().parse_known_args()
    args.config_overrides = unknown
    import jax
    import jax.numpy as jnp

    from frido_tpu.config import instantiate_from_config, load_configs
    from frido_tpu.utils.compilation_cache import enable as enable_xla_cache
    from frido_tpu.utils.profiling import trace

    enable_xla_cache()

    with trace(args.profile):
        _run(args, jax, jnp, instantiate_from_config, load_configs)


def _run(args, jax, jnp, instantiate_from_config, load_configs):
    cfg = load_configs([args.cfg_path],
                       dotlist=getattr(args, "config_overrides", None))
    ckpt, run_logdir = resolve_resume(args.resume)
    model, params = build_model(cfg, ckpt, use_ema=not args.no_ema)
    params = jax.device_put(params, jax.devices()[0])
    pipeline = make_pipeline(model, params, args)
    rng = jax.random.PRNGKey(args.seed + args.shard_idx)

    if args.logdir != "none" and run_logdir:
        # reference sample_diffusion.py:508-513: keep the run's leaf name,
        # relocate under the extra logdir base
        local = os.path.basename(run_logdir.rstrip(os.sep)) or run_logdir
        print(f"Switching logdir from '{run_logdir}' to "
              f"'{os.path.join(args.logdir, local)}'")
        run_logdir = os.path.join(args.logdir, local)
    out_base = args.output_path or os.path.join(run_logdir or "outputs",
                                                "samples")
    out_dir = os.path.join(out_base, args.exp_name)
    os.makedirs(out_dir, exist_ok=True)

    def dispatch_pipeline(params, rng, tokens, utokens):
        """Launch the device program without blocking (async dispatch)."""
        return pipeline(params, rng, tokens, utokens)

    def materialize(out, batch_idx=0):
        """Fetch a dispatched batch to host (this is the sync point)."""
        if args.get_codebook:
            imgs, codes = out
            np.savez(os.path.join(out_dir, f"codes_{batch_idx:06}.npz"),
                     **{f"scale_{i}": np.asarray(c)
                        for i, c in enumerate(codes)})
            return np.asarray(imgs)
        return np.asarray(out)

    def run_pipeline(params, rng, tokens, utokens, batch_idx=0):
        return materialize(dispatch_pipeline(params, rng, tokens, utokens),
                           batch_idx)

    if args.prompt is not None:
        tokens = jnp.asarray(model.tokenize([args.prompt] * args.batch_size))
        utokens = jnp.asarray(model.tokenize([""] * args.batch_size))
        t0 = time.time()
        imgs = run_pipeline(params, rng, tokens, utokens)
        dt = time.time() - t0
        save_batch(imgs, out_dir)
        print(f"Throughput for this batch: {args.batch_size / dt:.4f}")
        return

    data_cfg = dict(cfg["data"])
    data_cfg["params"] = dict(data_cfg.get("params", {}))
    if args.num_shards > 1:
        data_cfg["params"]["n_split_dataset"] = args.num_shards
        data_cfg["params"]["idx_split_dataset"] = args.shard_idx
    data = instantiate_from_config(data_cfg)
    data.setup()
    loader = data.test_dataloader()
    cond_key = model.cond_stage_key

    n_saved = len(glob.glob(os.path.join(out_dir, "sample", "*.png")))
    total = 0
    all_samples = []

    # one-batch software pipeline: dispatch batch i, then while the device
    # runs it, fetch/save batch i-1 and tokenize i+1 on the host. JAX
    # dispatch is async, so the chip never idles on PNG writes or
    # tokenization. (The reference runs these strictly serially,
    # sample_diffusion.py:208-303.)
    pending = None  # (device_out, names, inputs, batch_idx, t_dispatch)

    def drain(pending):
        nonlocal n_saved, total
        out, names, inputs, bidx, t0 = pending
        imgs = materialize(out, bidx)
        dt = time.time() - t0
        print(f"Throughput for this batch: {imgs.shape[0] / dt:.4f}")
        n_saved = save_batch(imgs, out_dir, names, n_saved)
        if inputs is not None:
            save_batch(inputs, out_dir, names, 0, key="inputs")
        all_samples.append(to_uint8(imgs))
        total += imgs.shape[0]

    dispatched = 0
    for batch_idx, batch in enumerate(loader):
        cond = batch[cond_key] if cond_key in batch else batch
        tokens = np.asarray(model.tokenize(cond))
        utokens = dummy_tokens_like(model, tokens, cond_key)
        rng, step_rng = jax.random.split(rng)
        t0 = time.time()
        out = dispatch_pipeline(params, step_rng, jnp.asarray(tokens),
                                jnp.asarray(utokens))
        this = (out, batch.get("file_name"), batch.get("image"),
                batch_idx, t0)
        if pending is not None:
            drain(pending)
        pending = this
        dispatched += tokens.shape[0]
        if args.n_samples > 0 and dispatched >= args.n_samples:
            break
    if pending is not None:
        drain(pending)
    if total == 0:
        print("no batches sampled")
        return

    allv = np.concatenate(all_samples)[: args.n_samples or None]
    shape_str = "x".join(map(str, allv.shape))
    np.savez(os.path.join(out_dir, f"{shape_str}-samples.npz"), allv)
    print(f"sampling of {n_saved} images finished -> {out_dir}")


if __name__ == "__main__":
    main()
