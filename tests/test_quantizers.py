"""Quantizer variants (GumbelQuantize / EMAVectorQuantizer) + remat step."""

import pytest

# <10-min tier: tools/pytest_cpu.sh -m fast (VERDICT r2 #7)
pytestmark = pytest.mark.fast

import jax
import jax.numpy as jnp
import numpy as np

from frido_tpu.nn.quantize import (EMAVectorQuantizer, GumbelQuantize,
                                   VectorQuantizer)


def test_gumbel_quantize_eval_is_argmax():
    m = GumbelQuantize(n_e=16, e_dim=4, num_hiddens=8)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    params = m.init({"params": jax.random.PRNGKey(1),
                     "gumbel": jax.random.PRNGKey(2)}, z)
    zq, kl, idx = m.apply(params, z, deterministic=True)
    assert zq.shape == (2, 4, 4, 4)
    assert idx.shape == (2, 4, 4) and idx.dtype == jnp.int32
    assert np.isfinite(float(kl))
    # training mode draws gumbel noise -> needs the rng
    zq2, _, _ = m.apply(params, z, deterministic=False,
                        rngs={"gumbel": jax.random.PRNGKey(3)})
    assert zq2.shape == zq.shape


def test_ema_quantizer_moves_codebook_toward_data():
    m = EMAVectorQuantizer(n_e=8, e_dim=4, decay=0.5)
    z = jnp.ones((64, 4)) * 3.0
    variables = m.init({"params": jax.random.PRNGKey(0)}, z)
    before = variables["ema"]["embedding"]

    # eval: no mutation
    zq, loss, idx = m.apply(variables, z, deterministic=True)
    assert zq.shape == z.shape

    # train: ema collection mutates toward the data
    (zq, loss, idx), updates = m.apply(
        variables, z, deterministic=False, mutable=["ema"])
    after = updates["ema"]["embedding"]
    used = np.unique(np.asarray(idx))
    # the used code rows moved toward 3.0
    d_before = np.abs(np.asarray(before)[used] - 3.0).mean()
    d_after = np.abs(np.asarray(after)[used] - 3.0).mean()
    assert d_after < d_before


def test_remat_step_matches_plain():
    import optax

    from frido_tpu.training import trainer
    from __graft_entry__ import (_TINY_COND, _TINY_FIRST, _TINY_MODEL,
                                 _TINY_UNET)
    from frido_tpu.models.frido import FridoDiffusion

    model = FridoDiffusion(first_stage_config=_TINY_FIRST,
                           cond_stage_config=_TINY_COND,
                           unet_config=_TINY_UNET, **_TINY_MODEL)
    params = model.init_params(jax.random.PRNGKey(0), context_len=12)
    tx = optax.sgd(1e-3)
    state, masked = trainer.create_train_state(model, params, tx)
    batch = {
        "image": np.random.RandomState(0).randn(2, 32, 32, 3).astype("f"),
        "tokens": np.random.RandomState(1).randint(0, 64, (2, 12)).astype(
            "int32"),
    }
    rng = jax.random.PRNGKey(7)
    s1, logs1 = jax.jit(trainer.make_train_step(model, masked))(
        state, batch, rng)
    s2, logs2 = jax.jit(trainer.make_train_step(model, masked, remat=True))(
        state, batch, rng)
    assert abs(float(logs1["loss"]) - float(logs2["loss"])) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
