"""FSDP param/optimizer sharding (frido_tpu.parallel.fsdp).

The train state sharded over the 'data' axis must (a) actually shard the
big leaves, (b) compute the same train step as the replicated-state DP
form (GSPMD partitioning is numerics-preserving up to reduction order),
and (c) compose with tensor parallelism on a 2-axis mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from frido_tpu.parallel import fsdp, mesh as pmesh


def test_leaf_specs():
    # big conv kernel: cout to 'model', then largest free axis to 'data'
    assert fsdp._leaf_spec("x/kernel", (3, 3, 256, 256), 4, 2, 1) == P(
        None, None, "data", "model")
    # dp-only mesh: largest divisible axis to 'data'
    assert fsdp._leaf_spec("x/kernel", (3, 3, 256, 512), 4, 1, 1) == P(
        None, None, None, "data")
    # too small -> replicated
    assert fsdp._leaf_spec("x/kernel", (3, 3, 8, 8), 4, 1) == P()
    # 1-D leaves always replicated
    assert fsdp._leaf_spec("x/bias", (10 ** 6,), 4, 1, 1) == P()
    # nothing divisible -> keep the TP spec
    assert fsdp._leaf_spec("x/kernel", (3, 3, 254, 254), 4, 1, 1) == P()
    # embedding: vocab to 'model' (tp rule), dim to 'data'
    assert fsdp._leaf_spec("tok/embedding", (128, 64), 2, 2, 1) == P(
        "model", "data")


def test_fsdp_step_matches_replicated_on_frido_model():
    """FSDP (8-way state sharding) vs replicated DP on the
    structurally-complete tiny Frido model: loss and updated params must
    agree. Runs the full TrainState through the sharding rule — params,
    masked optimizer moments, EMA shadow."""
    from frido_tpu.models.frido import FridoDiffusion
    from frido_tpu.training import optim, trainer
    from tests.test_training import TINY_COND, TINY_FIRST, TINY_UNET

    model = FridoDiffusion(
        first_stage_config=TINY_FIRST, cond_stage_config=TINY_COND,
        unet_config=TINY_UNET, timesteps=50, loss_type="l1", image_size=16,
        channels=8, conditioning_key="crossattn", cond_stage_trainable=True)
    params = model.init_params(jax.random.PRNGKey(0), context_len=8)
    tx = optim.build_optimizer(1e-3)
    batch = {
        "image": np.random.RandomState(0).randn(8, 32, 32, 3)
        .astype(np.float32),
        "tokens": np.random.RandomState(1).randint(0, 32, (8, 8))
        .astype(np.int32),
    }

    def run(shard_fn, n_model=1):
        m = pmesh.make_mesh(n_model=n_model)
        state, masked = trainer.create_train_state(model, params, tx)
        state = shard_fn(m, state)
        step = jax.jit(trainer.make_train_step(model, masked, use_ema=True))
        b = pmesh.shard_batch(m, batch)
        new_state, logs = step(state, b, jax.random.PRNGKey(7))
        return float(logs["loss"]), jax.device_get(new_state.params)

    # min_size=1: the tiny test model's leaves are all below the
    # production threshold; force sharding so the path is exercised
    def shard_small(m, state):
        sharded = fsdp.shard_state(m, state, min_size=1)
        # the big leaves really land sharded over 'data'
        sh = fsdp.state_shardings(m, state, min_size=1)
        kinds = {s.spec for s in jax.tree_util.tree_leaves(
            sh, is_leaf=lambda x: hasattr(x, "spec"))}
        assert any("data" in str(k) for k in kinds)
        return sharded

    loss_rep, p_rep = run(pmesh.replicate)
    loss_fsdp, p_fsdp = run(shard_small)
    assert loss_rep == pytest.approx(loss_fsdp, rel=1e-5)
    flat_rep = jax.tree_util.tree_leaves_with_path(p_rep)
    flat_fsdp = jax.tree_util.tree_leaves(p_fsdp)
    assert len(flat_rep) == len(flat_fsdp)
    for (path, a), b in zip(flat_rep, flat_fsdp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg=jax.tree_util.keystr(path))

    # composition: FSDP x TP on a 4x2 mesh must also agree
    loss_2d, p_2d = run(lambda m, s: fsdp.shard_state(m, s, min_size=1),
                        n_model=2)
    assert loss_rep == pytest.approx(loss_2d, rel=1e-5)
    for (path, a), b in zip(flat_rep, jax.tree_util.tree_leaves(p_2d)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg=jax.tree_util.keystr(path))


def test_fsdp_composes_with_bf16_and_remat():
    """FSDP sharding under the production training options — bf16 compute
    with fp32 masters plus loss rematerialization — must produce a finite
    step whose loss tracks the replicated bf16+remat step (GSPMD +
    jax.checkpoint + mixed dtypes is the combination most likely to
    mis-lower silently)."""
    import jax.numpy as jnp

    from frido_tpu.models.frido import FridoDiffusion
    from frido_tpu.training import optim, trainer
    from tests.test_training import TINY_COND, TINY_FIRST, TINY_UNET

    model = FridoDiffusion(
        first_stage_config=TINY_FIRST, cond_stage_config=TINY_COND,
        unet_config=TINY_UNET, timesteps=50, loss_type="l1", image_size=16,
        channels=8, conditioning_key="crossattn", cond_stage_trainable=True)
    params = model.init_params(jax.random.PRNGKey(0), context_len=8)
    tx = optim.build_optimizer(1e-3)
    batch = {
        "image": np.random.RandomState(0).randn(8, 32, 32, 3)
        .astype(np.float32),
        "tokens": np.random.RandomState(1).randint(0, 32, (8, 8))
        .astype(np.int32),
    }

    def run(shard_fn):
        m = pmesh.make_mesh()
        state, masked = trainer.create_train_state(model, params, tx)
        state = shard_fn(m, state)
        step = jax.jit(trainer.make_train_step(
            model, masked, use_ema=True, remat=True,
            compute_dtype=jnp.bfloat16))
        b = pmesh.shard_batch(m, batch)
        _, logs = step(state, b, jax.random.PRNGKey(7))
        return float(logs["loss"])

    loss_rep = run(pmesh.replicate)
    loss_fsdp = run(lambda m, s: fsdp.shard_state(m, s, min_size=1))
    assert np.isfinite(loss_fsdp)
    # bf16 reduction order differs across the sharded collectives; require
    # agreement at bf16 resolution, not exact equality
    assert loss_rep == pytest.approx(loss_fsdp, rel=1e-2)


def test_fsdp_checkpoint_roundtrip_resume(tmp_path):
    """VERDICT r2 #6: save a SHARDED TrainState, restore into a fresh
    state/mesh, continue training — the resumed run must match an
    uninterrupted one step for step. Covers the production options
    (bf16 compute + remat). save_train_state device_gets the sharded
    state (full host gather); restore lands on host and is re-sharded by
    fsdp.shard_state, which is exactly main.py's resume order."""
    from frido_tpu.io import checkpoint as ckpt_io
    from frido_tpu.models.frido import FridoDiffusion
    from frido_tpu.training import optim, trainer
    from tests.test_training import TINY_COND, TINY_FIRST, TINY_UNET

    model = FridoDiffusion(
        first_stage_config=TINY_FIRST, cond_stage_config=TINY_COND,
        unet_config=TINY_UNET, timesteps=50, loss_type="l1", image_size=16,
        channels=8, conditioning_key="crossattn", cond_stage_trainable=True)
    params = model.init_params(jax.random.PRNGKey(0), context_len=8)
    tx = optim.build_optimizer(1e-3)

    def batch(i):
        return {
            "image": np.random.RandomState(i).randn(8, 32, 32, 3)
            .astype(np.float32),
            "tokens": np.random.RandomState(100 + i).randint(0, 32, (8, 8))
            .astype(np.int32),
        }

    def fresh(m):
        state, masked = trainer.create_train_state(model, params, tx)
        step = jax.jit(trainer.make_train_step(
            model, masked, use_ema=True, remat=True,
            compute_dtype=jnp.bfloat16))
        return state, step

    # uninterrupted: 4 steps on one mesh
    m1 = pmesh.make_mesh()
    state, step = fresh(m1)
    state = fsdp.shard_state(m1, state, min_size=1)
    losses_a = []
    for i in range(4):
        state, logs = step(state, pmesh.shard_batch(m1, batch(i)),
                           jax.random.PRNGKey(i))
        losses_a.append(float(logs["loss"]))
    final_a = jax.device_get(state.params)

    # interrupted: 2 steps -> save sharded -> fresh mesh+state -> restore
    # -> re-shard -> steps 3-4 with identical batches/rngs
    state, step = fresh(m1)
    state = fsdp.shard_state(m1, state, min_size=1)
    for i in range(2):
        state, logs = step(state, pmesh.shard_batch(m1, batch(i)),
                           jax.random.PRNGKey(i))
        assert float(logs["loss"]) == pytest.approx(losses_a[i])
    ckdir = str(tmp_path / "ckpts")
    ckpt_io.save_train_state(ckdir, 2, state)

    m2 = pmesh.make_mesh()  # fresh mesh (fresh-process stand-in; the CLI
    #                         test covers an actual process boundary)
    state2, step2 = fresh(m2)
    state2, restored_step = ckpt_io.restore_train_state(ckdir, state2)
    assert restored_step == 2
    state2 = fsdp.shard_state(m2, state2, min_size=1)
    losses_b = []
    for i in range(2, 4):
        state2, logs = step2(state2, pmesh.shard_batch(m2, batch(i)),
                             jax.random.PRNGKey(i))
        losses_b.append(float(logs["loss"]))
    final_b = jax.device_get(state2.params)

    # identical programs + identical restored fp32 state => losses match
    # exactly (bf16 casts happen inside the same compiled graph)
    assert losses_b == pytest.approx(losses_a[2:], rel=1e-6)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(final_a),
                            jax.tree_util.tree_leaves(final_b)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6,
            err_msg=jax.tree_util.keystr(path))
