"""Vanilla (full-T ancestral) sampling path (``frido.py:1391-1418``)."""

import pytest

# <10-min tier: tools/pytest_cpu.sh -m fast (VERDICT r2 #7)
pytestmark = pytest.mark.fast

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import (_TINY_COND, _TINY_FIRST, _TINY_MODEL,
                             _TINY_UNET)
from frido_tpu.models.frido import FridoDiffusion


def test_vanilla_sampling_runs_full_chain():
    model = FridoDiffusion(first_stage_config=_TINY_FIRST,
                           cond_stage_config=_TINY_COND,
                           unet_config=_TINY_UNET, **_TINY_MODEL)
    params = model.init_params(jax.random.PRNGKey(0), context_len=12)
    tokens = jnp.zeros((2, 12), jnp.int32)
    ctx = model.get_learned_conditioning(params, tokens)

    z = model.sample(params, jax.random.PRNGKey(1), 2, context=ctx,
                     sampler="vanilla")
    assert z.shape == (2, 16, 16, 8)
    assert np.isfinite(np.asarray(z)).all()
    # ancestral chain is stochastic: different keys -> different samples
    z2 = model.sample(params, jax.random.PRNGKey(2), 2, context=ctx,
                      sampler="vanilla")
    assert not np.allclose(np.asarray(z), np.asarray(z2))
    # with CFG
    z3 = model.sample(params, jax.random.PRNGKey(1), 2, context=ctx,
                      uncond_context=ctx, guidance_scale=1.5,
                      sampler="vanilla")
    assert np.isfinite(np.asarray(z3)).all()
