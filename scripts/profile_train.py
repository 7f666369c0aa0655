"""Per-op device-time decomposition of the TRAINING step (VERDICT r4 #1).

Four rounds of profiling went into t2i inference; the training step was
last measured in round 2 (pre GN/attention fixes) and sits at ~11% of
bf16 peak by the repo's own FLOPs math, vs ~66% for sampling. This tool
points the round-4 device-trace profiler at the exact units the jitted
train step executes so the gap gets a measured decomposition instead of
a guess:

- ``step``:     the full donated train step (frozen encode -> 2-stage
                windowed loss fwd+bwd -> AdamW -> EMA), exactly what
                ``scripts/bench_train.py`` times
- ``encode``:   the frozen MS-VQGAN first-stage encode alone (256² conv
                trunk, batch B — runs under stop_gradient in the step)
- ``lossgrad``: value_and_grad of the diffusion loss (cond encode +
                2 x UNet fwd/bwd) given a precomputed latent z — the
                differentiated region of the step
- ``opt``:      AdamW update + apply + EMA given precomputed grads —
                the pure HBM-elementwise tail over the 746M-param state

Reference training loop this decomposes:
/root/reference/main.py:829-842 driving
/root/reference/frido/models/diffusion/frido.py:1011-1050 (per-stage
loss loop) — the reference never measures this either (SURVEY §5).

Run on the real chip:
``python scripts/profile_train.py [--batch 16] [--units step,encode,...]
[--iters 3] [--top 15] [--fp32] [--remat]``
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from profile_step import summarize, mxu_by_shape  # noqa: E402


def _device_events(td: str) -> list[dict]:
    paths = glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, "profiler produced no trace"
    d = json.load(gzip.open(paths[0]))
    events, spans = [], 0.0
    for e in d.get("traceEvents", []):
        if (e.get("ph") != "X"
                or "device_duration_ps" not in e.get("args", {})):
            continue
        name = e.get("name", "")
        # program-span events double-count every child op: the jit_<fn>
        # module spans (filtered in profile_step too) and the digit-named
        # module-execution spans the train-step traces emit (no
        # hlo_category, 0 bytes — observed r5: 4 spans totalling 172 ms on
        # a 112 ms step). Excluding them is what makes the step total
        # consistent with bench_train wall time.
        if name.startswith("jit_") or (
                name.isdigit()
                and "hlo_category" not in e.get("args", {})):
            spans += int(e["args"]["device_duration_ps"]) / 1e6
            continue
        events.append(e)
    if spans:
        print(f"  [excluded {spans / 1e3:.2f} ms of program-span events "
              "(module wrappers, would double-count)]")
    return events


def capture_fixed(fn, args, iters: int) -> list[dict]:
    """Trace a jitted fn with fixed args (no donation)."""
    f = jax.jit(fn)
    float(f(*args))  # compile + tunnel barrier
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(iters):
                out = f(*args)
            float(out)
        return _device_events(td)


def capture_step(jit_step, state, batch, rng, iters: int):
    """Trace the donated train step, threading state through; returns
    (events, final_state)."""
    state, logs = jit_step(state, batch, rng)  # compile
    float(logs["loss"])
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for i in range(iters):
                state, logs = jit_step(state, batch,
                                       jax.random.fold_in(rng, i))
            float(logs["loss"])
        return _device_events(td), state


def profile_msvqgan(args):
    """Device-trace the full MS-VQGAN GAN step (generator + discriminator
    phases in one jitted step, same construction as bench_train.py's
    BENCH_MODEL=msvqgan: bf16 compute unless --fp32, LPIPS off)."""
    import optax

    from frido_tpu.config import instantiate_from_config, load_yaml
    from frido_tpu.models.msvqgan import msvqgan_from_config
    from frido_tpu.training.vqgan_trainer import (
        create_vqgan_train_state, make_vqgan_train_step)
    from frido_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    compute_dtype = None if args.fp32 else jnp.bfloat16
    print(f"backend={jax.default_backend()} batch={args.batch} "
          f"dtype={'fp32' if args.fp32 else 'bf16'} model=msvqgan")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mp = load_yaml(os.path.join(
        repo, "configs/msvqgan/msvqgan_f16f8_coco.yaml"))["model"]["params"]
    module = msvqgan_from_config(mp, name=None)
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
        make_vqgan_train_step(module, loss, tx_g, tx_d,
                              compute_dtype=compute_dtype),
        donate_argnums=(0,))
    x = jnp.zeros((args.batch, 256, 256, 3), jnp.float32)

    state, logs = step_fn(state, x)  # compile
    float(logs["aeloss"])
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(args.iters):
                state, logs = step_fn(state, x)
            float(logs["aeloss"])
        ev = _device_events(td)
    ms = summarize(ev, args.iters, "msvqgan GAN step (G+D)", args.top)
    mxu_by_shape(ev, args.iters, args.top)
    print(f"\n  device-time bound: {args.batch / (ms / 1e3):.1f} img/s "
          f"at batch {args.batch}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--units", default="step,encode,lossgrad,opt")
    ap.add_argument("--fp32", action="store_true",
                    help="profile the fp32 parity step instead of bf16")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test the plumbing on the tiny graft model "
                         "(CPU-friendly; numbers are meaningless)")
    ap.add_argument("--msvqgan", action="store_true",
                    help="profile the MS-VQGAN GAN step (G+D phases, f16f8 "
                         "at 256², LPIPS gated off) instead of diffusion — "
                         "VERDICT r4 #5; reference "
                         "/root/reference/taming/models/msvqgan.py:199-261")
    args = ap.parse_args()
    if args.msvqgan:
        return profile_msvqgan(args)

    import __graft_entry__ as g
    from frido_tpu.config import instantiate_from_config, load_yaml
    from frido_tpu.models.frido import FridoDiffusion
    from frido_tpu.training import optim, trainer
    from frido_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    compute_dtype = None if args.fp32 else jnp.bfloat16
    print(f"backend={jax.default_backend()} batch={args.batch} "
          f"dtype={'fp32' if args.fp32 else 'bf16'} remat={args.remat}")

    if args.tiny:
        model = FridoDiffusion(
            first_stage_config=g._TINY_FIRST, cond_stage_config=g._TINY_COND,
            unet_config=g._TINY_UNET, **g._TINY_MODEL)
        ctx_len, img_side = 12, 32
    else:
        # same construction path as main.py (target-alias resolution)
        model = instantiate_from_config(load_yaml(g.FLAGSHIP_CONFIG)["model"])
        ctx_len, img_side = 77, 256
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init_params(jax.random.PRNGKey(0),
                                   context_len=ctx_len)
    tx = optim.build_optimizer(1e-4)
    state, masked_tx = trainer.create_train_state(model, params, tx)
    state = jax.device_put(state, jax.devices()[0])
    del params

    B = args.batch
    side = img_side
    batch = {
        "image": jnp.zeros((B, side, side, 3), jnp.float32),
        "tokens": jnp.zeros((B, ctx_len), jnp.int32),
    }
    rng = jax.random.PRNGKey(0)

    results = {}
    units = [u for u in args.units.split(",") if u]

    if "step" in units:
        step_fn = jax.jit(
            trainer.make_train_step(model, masked_tx, remat=args.remat,
                                    compute_dtype=compute_dtype),
            donate_argnums=(0,))
        ev, state = capture_step(step_fn, state, batch, rng, args.iters)
        results["step"] = summarize(ev, args.iters, "step (full)", args.top)
        mxu_by_shape(ev, args.iters, args.top)

    # shared inputs for the sub-units
    lat = model.image_size
    img = batch["image"]
    if compute_dtype is not None:
        img = img.astype(compute_dtype)

    if "encode" in units:
        def encode(params, image):
            z = model.encode_first_stage(params, image)
            return z.astype(jnp.float32).mean()

        ev = capture_fixed(encode, (state.params, img), args.iters)
        results["encode"] = summarize(
            ev, args.iters, "encode (frozen first stage)", args.top)
        mxu_by_shape(ev, args.iters, args.top)

    if "lossgrad" in units or "opt" in units:
        z = jax.jit(lambda p, im: jax.lax.stop_gradient(
            model.encode_first_stage(p, im)).astype(jnp.float32))(
                state.params, img)
        t = jnp.full((B,), 500, jnp.int32)
        noise = jax.random.normal(rng, (B, lat, lat, model.channels),
                                  jnp.float32)

        def diffusion_loss(params, z, ctx, t, noise):
            return model.training_loss(params, z, ctx, t, noise,
                                       compute_dtype=compute_dtype)

        if args.remat:
            diffusion_loss = jax.checkpoint(
                diffusion_loss,
                policy=jax.checkpoint_policies
                .dots_with_no_batch_dims_saveable)

        def loss_fn(params, z, tokens, t, noise):
            ctx = model.module.apply(params, tokens, method="encode_cond")
            return diffusion_loss(params, z, ctx, t, noise)

        def lossgrad(params, z, tokens, t, noise):
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, z, tokens, t, noise)
            # touch every grad leaf so none is dead-coded; the global-norm
            # read (~2.7 GB fp32) is ~3 ms of the trace, noted in PERF.md
            gn = jax.tree.reduce(
                lambda a, b: a + b,
                jax.tree.map(lambda g: jnp.sum(g * g), grads), 0.0)
            return loss + 0.0 * gn

        if "lossgrad" in units:
            ev = capture_fixed(
                lossgrad, (state.params, z, batch["tokens"], t, noise),
                args.iters)
            results["lossgrad"] = summarize(
                ev, args.iters, "lossgrad (cond + 2-stage UNet fwd+bwd)",
                args.top)
            mxu_by_shape(ev, args.iters, args.top)

        if "opt" in units:
            grads = jax.jit(jax.grad(
                lambda p, *a: loss_fn(p, *a)[0]))(
                    state.params, z, batch["tokens"], t, noise)

            def opt(state, grads):
                updates, opt_state = masked_tx.update(
                    grads, state.opt_state, state.params)
                params = __import__("optax").apply_updates(
                    state.params, updates)
                from frido_tpu.training.ema import update_ema
                ema, n = update_ema(state.ema_params,
                                    params["params"]["model"],
                                    state.ema_updates)
                new_state = trainer.TrainState(
                    params=params, opt_state=opt_state, ema_params=ema,
                    ema_updates=n, step=state.step + 1)
                return new_state, updates["params"]["model"]

            # donated like the real step so in-place update traffic matches
            f = jax.jit(opt, donate_argnums=(0,))
            st = state
            st, _ = f(st, grads)
            jax.block_until_ready(st.step)
            float(st.step)  # tunnel barrier
            with tempfile.TemporaryDirectory() as td:
                with jax.profiler.trace(td):
                    for _ in range(args.iters):
                        st, _ = f(st, grads)
                    float(st.step)
                ev = _device_events(td)
            results["opt"] = summarize(
                ev, args.iters, "opt (AdamW + EMA, donated)", args.top)

    if results:
        print("\n== summary (device ms/call) ==")
        for k, v in results.items():
            print(f"  {k:10s} {v:8.2f} ms")
        if "step" in results:
            acct = sum(v for k, v in results.items() if k != "step")
            if acct:
                print(f"  sub-units account for {acct:.2f} ms of "
                      f"{results['step']:.2f} ms step "
                      f"({acct / results['step'] * 100:.0f}%)")
        if "step" in results:
            ips = B / (results["step"] / 1e3)
            print(f"  device-time bound: {ips:.1f} img/s at batch {B}")


if __name__ == "__main__":
    main()
