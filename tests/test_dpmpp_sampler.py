"""DPM-Solver++(2M) stage sampler (beyond-parity fast sampler).

Pins two analytic properties:
* with eps-hat == 0 the 2M update reduces exactly to eta=0 DDIM;
* on a linear eps model it converges to the fine-step DDIM solution with
  second-order accuracy (error shrinks ~4x when steps double, vs ~2x for
  first-order DDIM).
"""

import pytest

# <10-min tier: tools/pytest_cpu.sh -m fast (VERDICT r2 #7)
pytestmark = pytest.mark.fast

import jax
import jax.numpy as jnp
import numpy as np

from frido_tpu.diffusion import samplers
from frido_tpu.schedules import DiffusionSchedule

SCHED = DiffusionSchedule.create(
    given_betas=None, beta_schedule="linear", timesteps=1000,
    linear_start=0.0015, linear_end=0.0155, cosine_s=8e-3,
    v_posterior=0.0, parameterization="eps")


def _cfg(kind, steps, num_stage=2):
    return samplers.SamplerConfig(
        schedule=SCHED, num_steps=steps, eta=0.0, guidance_scale=1.0,
        embed_dim_list=(2, 2)[:num_stage], use_split_head=True,
        num_stage=num_stage, kind=kind)


def _run(kind, steps, eps_model, x0, num_stage=2):
    cfg = _cfg(kind, steps, num_stage)
    return samplers.sample(cfg, eps_model, jax.random.PRNGKey(0),
                           x0.shape, x_init=x0)


def test_dpmpp_equals_ddim_for_zero_eps():
    def eps_zero(x, t, ctx, stage):
        return jnp.zeros_like(x[..., stage * 2:(stage + 1) * 2])

    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    out_d = _run("ddim", 10, eps_zero, x0)
    out_p = _run("dpmpp", 10, eps_zero, x0)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               rtol=2e-5, atol=2e-5)


def test_dpmpp_second_order_convergence():
    """Probe model with a bounded, smooth data prediction (x0 = tanh(x)) —
    the regime real denoisers live in; a raw linear eps makes x0 ~ x/alpha
    blow up at the noisy end and degrades every data-prediction solver to
    first order (measured), so it would test the wrong thing."""
    sac = jnp.asarray(SCHED.sqrt_alphas_cumprod)
    s1m = jnp.asarray(SCHED.sqrt_one_minus_alphas_cumprod)

    def eps_model(x, t, ctx, stage):
        xw = x[..., :2]
        return (xw - sac[t[0]] * jnp.tanh(xw)) / s1m[t[0]]

    x0 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 2))
    ref = np.asarray(_run("ddim", 500, eps_model, x0, num_stage=1))

    def err(kind, steps):
        out = np.asarray(_run(kind, steps, eps_model, x0, num_stage=1))
        return float(np.max(np.abs(out - ref)))

    e10, e40 = err("dpmpp", 10), err("dpmpp", 40)
    d10, d40 = err("ddim", 10), err("ddim", 40)
    # measured: ddim 0.091 / 0.047, dpmpp 0.051 / 0.0042
    assert e10 < 0.75 * d10, (e10, d10)          # better even at 10 steps
    assert e40 < d40 / 5, (e40, d40)             # much better refined
    assert e10 / e40 > 2.0 * (d10 / d40), (e10, e40, d10, d40)  # faster decay


def test_dpmpp_two_stage_shapes_and_determinism():
    def eps_model(x, t, ctx, stage):
        return 0.1 * x[..., stage * 2:(stage + 1) * 2]

    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 4))
    a = _run("dpmpp", 8, eps_model, x0)
    b = _run("dpmpp", 8, eps_model, x0)
    assert a.shape == (2, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()


def test_sequential_cfg_matches_batched():
    """cfg_mode='sequential' (half the activation peak) must be numerically
    identical to the batched 2B-forward CFG."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from frido_tpu.diffusion.samplers import SamplerConfig, sample
    from frido_tpu.schedules import DiffusionSchedule

    sched = DiffusionSchedule.create(timesteps=40)

    def eps_model(x, t, ctx, stage):
        w = (3, 3)[stage]
        # per-SAMPLE context bias (a global mean would mix the cond and
        # uncond halves of the batched-CFG call and sink the comparison)
        bias = 0.0 if ctx is None else jnp.mean(
            ctx, axis=(1, 2))[:, None, None, None]
        return 0.1 * x[..., -w:] + bias

    ctx = jnp.ones((2, 4, 8)) * 0.3
    uctx = jnp.zeros((2, 4, 8))
    outs = []
    for mode in ("batched", "sequential"):
        cfg = SamplerConfig(schedule=sched, num_steps=5, eta=0.0,
                            guidance_scale=1.5, embed_dim_list=(3, 3),
                            use_split_head=True, num_stage=2, kind="plms",
                            cfg_mode=mode)
        outs.append(np.asarray(sample(
            cfg, eps_model, jax.random.PRNGKey(0), (2, 8, 8, 6),
            context=ctx, uncond_context=uctx)))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
