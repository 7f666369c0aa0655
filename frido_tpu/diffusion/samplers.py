"""Scanned DDIM / PLMS samplers for the pyramid latent.

TPU-first re-design of ``/root/reference/frido/models/diffusion/ddim.py``
and ``plms.py``: the whole (stage x timestep) chain compiles to one XLA
program —

* the stage loop is unrolled at trace time (``num_stage`` is config, 2-3);
* the timestep loop is a ``lax.scan`` with the per-step (t, alpha, sigma)
  buffers as scan inputs, so there are no host round-trips between steps;
* the reference *grows* the working latent across stages in split-head mode
  (``plms.py:146-150``); here each stage's scan carries ONLY its static
  channel window [start, end) — the frozen clean channels below and the
  untouched initial-noise channels above enter the scan body as
  loop-invariant closures reassembled by concat, which computes exactly
  what the growing-tensor formulation does (the reference masks at
  ``plms.py:256-281``). Keeping the invariants out of the carry is a
  deliberate perf design: XLA's while-loop LICM then hoists everything
  that depends only on them — in particular the ENTIRE SPADE conditioning
  stack of the fine stages (pre_input_cond conv + every per-site
  gamma/beta conv, ~37% of a stage-1 UNet call's FLOPs) runs once per
  stage instead of once per step x CFG branch;
* classifier-free guidance runs as a single 2B-batched UNet call
  (vs. two sequential calls at ``plms.py:220-234``) or as two sequential
  half-size calls (``cfg_mode='sequential'``) — numerically identical;
  XLA CSE dedupes the ops upstream of the first cross-attention (measured
  0.956x the FLOPs of the batched form, scripts/flops_audit.py) and the
  activation working set halves, which is what lets batch 128 fit HBM and
  makes sequential the faster end-to-end form (docs/PERF.md);
* the PLMS Adams-Bashforth order ramp (``plms.py:285-301``) is a
  ``lax.switch`` over an eps-history scan carry; the first step (which costs
  one extra model call, ``plms.py:286-290``) is peeled out of the scan.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from frido_tpu.ops.image import avg_pool_2x, interpolate_nearest_2x
from frido_tpu.schedules import DDIMSchedule, DiffusionSchedule

EpsModel = Callable[[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], int],
                    jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    schedule: DiffusionSchedule
    num_steps: int = 200
    eta: float = 1.0
    guidance_scale: float = 1.0
    embed_dim_list: Sequence[int] = (4, 4)
    use_split_head: bool = True
    specify_channels: Sequence[int] = ()
    num_stage: int = 2
    kind: str = "plms"   # 'plms' | 'ddim' | 'dpmpp' | 'vanilla' (full-T)
    temperature: float = 1.0
    discretize: str = "uniform"
    keep_intermediates: bool = False
    # CFG evaluation: 'batched' fuses cond+uncond into one 2B forward
    # (best MXU utilization); 'sequential' runs them back to back, halving
    # the UNet's peak activation memory so larger batches fit HBM
    cfg_mode: str = "batched"

    @property
    def offset(self) -> int:
        return self.specify_channels[0] if self.specify_channels else 0

    def window(self, stage: int) -> Tuple[int, int]:
        start = self.offset + sum(self.embed_dim_list[:stage])
        end = self.offset + sum(self.embed_dim_list[:stage + 1])
        return start, end


def _make_eps_window(cfg: SamplerConfig, eps_model: EpsModel, context,
                     uncond_context, stage: int, prefix, suffix, aux=None):
    """Return eps(x_w, t_batch) -> window-width eps with CFG folded in.

    ``x_w`` is only the stage's channel window; ``prefix``/``suffix`` are
    the scan-invariant channels below/above it, reassembled here by concat
    (values identical to the full-width formulation) so XLA LICM can hoist
    all prefix-only compute out of the step loop (module docstring).

    Matches ``plms.py:202-240``: with split head the model output *is* the
    window; otherwise the full-width output is sliced to the window (the
    reference zeroes outside it, then only the window participates in the
    update anyway).
    """
    start, end = cfg.window(stage)
    off = cfg.offset
    gs = cfg.guidance_scale

    # batched CFG runs the model at 2B: tile the precomputed tables to match
    aux2 = None if aux is None else jax.tree_util.tree_map(
        lambda a: jnp.concatenate([a, a], axis=0), aux)

    def call(x_in, tb, ctx, doubled=False):
        a = aux2 if doubled else aux
        if a is None:
            return eps_model(x_in, tb, ctx, stage)
        return eps_model(x_in, tb, ctx, stage, a)

    def eps(x_w, tb):
        x = jnp.concatenate([prefix, x_w, suffix], axis=-1)
        x_in = x[..., off:] if off else x
        if gs != 1.0:
            assert uncond_context is not None, (
                "guidance_scale != 1 requires unconditional conditioning")
            if cfg.cfg_mode == "sequential":
                e_u = call(x_in, tb, uncond_context)
                e_c = call(x_in, tb, context)
            else:
                xx = jnp.concatenate([x_in, x_in], axis=0)
                tt = jnp.concatenate([tb, tb], axis=0)
                cc = jnp.concatenate([uncond_context, context], axis=0)
                out2 = call(xx, tt, cc, doubled=True)
                e_u, e_c = jnp.split(out2, 2, axis=0)
            out = e_u + gs * (e_c - e_u)
        else:
            out = call(x_in, tb, context)
        if cfg.use_split_head:
            return out  # width == end - start by construction
        return out[..., start - off:end - off]

    return eps


def _stage_smooth(cfg: SamplerConfig, x: jnp.ndarray, stage: int) -> jnp.ndarray:
    """End-of-stage avg-pool -> nearest-upsample smoothing of the finished
    channel block (``plms.py:185-193``)."""
    if cfg.num_stage == 1:
        return x
    start, end = cfg.window(stage)
    k = cfg.num_stage - stage - 1
    blk = x[..., start:end]
    for _ in range(k):
        blk = avg_pool_2x(blk)
    for _ in range(k):
        blk = interpolate_nearest_2x(blk)
    return x.at[..., start:end].set(blk)


def _ddim_update(x_w, e_w, a_t, a_prev, sqrt_1ma, sigma, noise):
    """One DDIM x_t -> x_{t-1} update on the window (``ddim.py:242-263``)."""
    pred_x0 = (x_w - sqrt_1ma * e_w) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma**2) * e_w
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma * noise
    return x_prev, pred_x0


def _scan_inputs(dd: DDIMSchedule, rng, shape_w, temperature: float):
    """Descending-time per-step buffers + per-step noise (pre-drawn keys).

    With eta=0 every sigma is exactly zero (PLMS requires it; DDIM allows
    it), so the sigma*noise term vanishes — skip materializing the
    (S, B, H, W, C) noise buffer entirely. At 200 steps x batch 64 that is
    ~200 MB of HBM per stage plus the RNG work, for values XLA cannot prove
    dead through the scan's dynamic step index.
    """
    S = dd.num_steps
    ts = jnp.asarray(dd.timesteps)[::-1]
    a_t = jnp.asarray(dd.alphas)[::-1]
    a_prev = jnp.asarray(dd.alphas_prev)[::-1]
    sqrt_1ma = jnp.asarray(dd.sqrt_one_minus_alphas)[::-1]
    sigmas = jnp.asarray(dd.sigmas)[::-1]
    if float(np.max(np.abs(dd.sigmas))) == 0.0:
        noise = jnp.zeros((S,) + (1,) * len(shape_w), sigmas.dtype)
    else:
        noise = jax.random.normal(rng, (S,) + shape_w) * temperature
    return dict(t=ts, a_t=a_t, a_prev=a_prev, sqrt_1ma=sqrt_1ma,
                sigma=sigmas, noise=noise)


def _sample_stage_ddim(cfg, dd, eps, x_w, stage, rng, assemble):
    b = x_w.shape[0]
    xs = _scan_inputs(dd, rng, x_w.shape, cfg.temperature)

    def step(x_w, inp):
        tb = jnp.full((b,), inp["t"], dtype=jnp.int32)
        e_w = eps(x_w, tb)
        x_prev, pred = _ddim_update(x_w, e_w, inp["a_t"], inp["a_prev"],
                                    inp["sqrt_1ma"], inp["sigma"],
                                    inp["noise"])
        return x_prev, (assemble(x_prev) if cfg.keep_intermediates else None)

    x_w, inter = jax.lax.scan(step, x_w, xs)
    return (x_w, inter) if cfg.keep_intermediates else x_w


def _sample_stage_vanilla(cfg, dd, eps, x_w, stage, rng, assemble):
    """Full-T ancestral p_sample chain on the stage window
    (``frido.py:1391-1418``: stage loop x posterior sampling with clipped
    x0). Ignores the DDIM stride — every timestep of the training schedule
    runs, like the reference's ``vanilla_sample`` path."""
    s = cfg.schedule
    b = x_w.shape[0]
    T = s.num_timesteps
    ts = jnp.arange(T - 1, -1, -1)
    noise = jax.random.normal(rng, (T,) + x_w.shape) * cfg.temperature

    sqrt_recip = jnp.asarray(s.sqrt_recip_alphas_cumprod)
    sqrt_recipm1 = jnp.asarray(s.sqrt_recipm1_alphas_cumprod)
    coef1 = jnp.asarray(s.posterior_mean_coef1)
    coef2 = jnp.asarray(s.posterior_mean_coef2)
    log_var = jnp.asarray(s.posterior_log_variance_clipped)

    def step(x_w, inp):
        t, n = inp
        tb = jnp.full((b,), t, dtype=jnp.int32)
        e_w = eps(x_w, tb)
        x0 = sqrt_recip[t] * x_w - sqrt_recipm1[t] * e_w
        x0 = jnp.clip(x0, -1.0, 1.0)  # clip_denoised (frido.py p_sample)
        mean = coef1[t] * x0 + coef2[t] * x_w
        x_prev = mean + jnp.where(t > 0, 1.0, 0.0) * jnp.exp(
            0.5 * log_var[t]) * n
        # intermediates are the x0 composites — what the reference's
        # progressive_denoising gallery collects (frido.py:1577-1582)
        emit = assemble(x0) if cfg.keep_intermediates else None
        return x_prev, emit

    x_w, inter = jax.lax.scan(step, x_w, (ts, noise))
    return (x_w, inter) if cfg.keep_intermediates else x_w


def _sample_stage_dpmpp(cfg, dd, eps, x_w, stage, rng, assemble):
    """DPM-Solver++(2M) on the stage window — deterministic second-order
    multistep in the data-prediction (x0) formulation (Lu et al. 2022,
    arXiv:2211.01095 Algorithm 2). Beyond-parity addition: no reference
    analogue; reaches 200-step-PLMS sample quality in ~20-30 steps, so the
    coarse-to-fine chain runs ~10x fewer UNet calls at serving time. With
    eps-hat == 0 it reduces exactly to eta=0 DDIM (pinned by test).
    """
    del rng  # deterministic
    b = x_w.shape[0]
    S = dd.num_steps
    ts = jnp.asarray(dd.timesteps)[::-1]
    a_t = jnp.asarray(dd.alphas)[::-1]          # alpha_cumprod at t_i
    a_prev = jnp.asarray(dd.alphas_prev)[::-1]  # ... at t_{i+1} (next step)
    sig_t = jnp.sqrt(1.0 - a_t)
    sig_prev = jnp.sqrt(1.0 - a_prev)
    # half-log-SNR lambda = log(alpha_hat/sigma)
    lam_t = 0.5 * jnp.log(a_t / (1.0 - a_t))
    lam_prev = 0.5 * jnp.log(a_prev / (1.0 - a_prev))

    def step(carry, i):
        x_w, x0_prev, h_prev = carry
        tb = jnp.full((b,), ts[i], dtype=jnp.int32)
        e_w = eps(x_w, tb)
        x0 = (x_w - sig_t[i] * e_w) / jnp.sqrt(a_t[i])
        h = lam_prev[i] - lam_t[i]
        # 2M correction; first step (h_prev == 0) falls back to 1st order,
        # and so does the final step for short chains (lower_order_final in
        # diffusers/k-diffusion: the last multistep extrapolation is unstable
        # at few steps, so drop to DDIM-order there when S < 15).
        r_safe = jnp.where(h_prev > 0, h_prev, 1.0) / h
        c = jnp.where(h_prev > 0, 1.0 / (2.0 * r_safe), 0.0)
        if S < 15:
            c = jnp.where(i == S - 1, 0.0, c)
        D = (1.0 + c) * x0 - c * x0_prev
        x_new = (sig_prev[i] / sig_t[i]) * x_w \
            - jnp.sqrt(a_prev[i]) * jnp.expm1(-h) * D
        return (x_new, x0, h), (assemble(x_new) if cfg.keep_intermediates
                                else None)

    x0_init = jnp.zeros_like(x_w)
    (x_w, _, _), inter = jax.lax.scan(
        step, (x_w, x0_init, jnp.asarray(0.0)), jnp.arange(S))
    return (x_w, inter) if cfg.keep_intermediates else x_w


def _plms_combine(order: jnp.ndarray, e_t, h1, h2, h3):
    """Adams-Bashforth combination by history length (``plms.py:291-299``)."""
    return jax.lax.switch(
        order,
        [
            lambda: (3 * e_t - h1) / 2,
            lambda: (23 * e_t - 16 * h1 + 5 * h2) / 12,
            lambda: (55 * e_t - 59 * h1 + 37 * h2 - 9 * h3) / 24,
        ],
    )


def _sample_stage_plms(cfg, dd, eps, x_w, stage, rng, assemble):
    b = x_w.shape[0]
    S = dd.num_steps
    xs = _scan_inputs(dd, rng, x_w.shape, cfg.temperature)

    def update(x_w, e_w, i):
        return _ddim_update(
            x_w, e_w, xs["a_t"][i], xs["a_prev"][i], xs["sqrt_1ma"][i],
            xs["sigma"][i], xs["noise"][i])

    # --- step 0: pseudo improved Euler (2 model calls, plms.py:286-290) ---
    t0 = jnp.full((b,), xs["t"][0], dtype=jnp.int32)
    t1 = jnp.full((b,), xs["t"][jnp.minimum(1, S - 1)], dtype=jnp.int32)
    e_t = eps(x_w, t0)
    x_half, _ = update(x_w, e_t, 0)
    e_next = eps(x_half, t1)
    x_w, _ = update(x_w, (e_t + e_next) / 2, 0)
    hist = (e_t, jnp.zeros_like(e_t), jnp.zeros_like(e_t))

    # --- steps 1..S-1 under scan with eps history carry -------------------
    def step(carry, i):
        x_w, (h1, h2, h3) = carry
        tb = jnp.full((b,), xs["t"][i], dtype=jnp.int32)
        e_t = eps(x_w, tb)
        order = jnp.minimum(i, 3) - 1  # 0-based switch index
        e_prime = _plms_combine(order, e_t, h1, h2, h3)
        x_prev, _ = _ddim_update(
            x_w, e_prime, xs["a_t"][i], xs["a_prev"][i], xs["sqrt_1ma"][i],
            xs["sigma"][i], xs["noise"][i])
        return (x_prev, (e_t, h1, h2)), (
            assemble(x_prev) if cfg.keep_intermediates else None)

    inter = None
    if S > 1:
        (x_w, _), inter = jax.lax.scan(step, (x_w, hist), jnp.arange(1, S))
    return (x_w, inter) if cfg.keep_intermediates else x_w


def sample(cfg: SamplerConfig, eps_model: EpsModel, rng,
           shape: Tuple[int, ...], context=None, uncond_context=None,
           x_T=None, x_init=None, stage_invariants=None) -> jnp.ndarray:
    """Full coarse-to-fine sampling chain. Returns the final latent z_0
    (still scaled; callers run decode_first_stage).

    ``x_T``: adopt as a *finished* stage 0 and skip its sampling
    (``plms.py:151-153``). ``x_init``: use as the initial noise but sample
    every stage (deterministic runs / goldens). ``stage_invariants``:
    optional ``f(stage, x_cond) -> aux`` computing per-stage loop-invariant
    model state (the SPADE modulation tables) OUTSIDE the step scan;
    ``aux`` is passed through to ``eps_model`` as a 5th argument.
    """
    if cfg.kind in ("plms", "dpmpp") and cfg.eta != 0.0:
        raise ValueError("ddim_eta must be 0 for PLMS (plms.py:25-26) "
                         "and DPM-Solver++ (deterministic solver)")
    assert x_T is None or x_init is None
    dd = None
    if cfg.kind != "vanilla":  # vanilla runs the full training schedule
        dd = DDIMSchedule.create(cfg.schedule, cfg.num_steps, eta=cfg.eta,
                                 discretize=cfg.discretize)

    rng, init_key = jax.random.split(rng)
    if x_T is not None:
        x = x_T
    elif x_init is not None:
        x = x_init
    else:
        x = jax.random.normal(init_key, shape)

    stage_fn = {"plms": _sample_stage_plms, "ddim": _sample_stage_ddim,
                "dpmpp": _sample_stage_dpmpp,
                "vanilla": _sample_stage_vanilla}[cfg.kind]
    intermediates = []
    for s in range(cfg.num_stage):
        if x_T is not None and s == 0:
            continue  # adopt x_T as the finished stage 0 (plms.py:151-153)
        rng, stage_key = jax.random.split(rng)
        start, end = cfg.window(s)
        # Scan-invariant channels below/above the stage window stay out of
        # the carry (module docstring: this is what lets XLA hoist the
        # fine stages' SPADE conditioning out of the step loop).
        prefix, suffix = x[..., :start], x[..., end:]

        def assemble(x_w, _p=prefix, _s=suffix):
            return jnp.concatenate([_p, x_w, _s], axis=-1)

        aux = None
        if stage_invariants is not None:
            # model-view cond channels: everything below the window, minus
            # the specify_channels offset the model never sees
            aux = stage_invariants(s, prefix[..., cfg.offset:])
        eps = _make_eps_window(cfg, eps_model, context, uncond_context, s,
                               prefix, suffix, aux)
        out = stage_fn(cfg, dd, eps, x[..., start:end], s, stage_key,
                       assemble)
        if cfg.keep_intermediates:
            x_w, inter = out
            if inter is not None:
                intermediates.append(inter)
        else:
            x_w = out
        x = _stage_smooth(cfg, assemble(x_w), s)
    if cfg.keep_intermediates:
        return x, intermediates
    return x
