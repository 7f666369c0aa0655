"""Tensor-parallel param sharding (frido_tpu.parallel.tp).

DP x TP on the virtual 8-device CPU mesh must (a) actually shard conv/dense
output channels over the 'model' axis and (b) compute the same train step
as DP-only/replicated (GSPMD partitioning is numerics-preserving up to
reduction order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from frido_tpu.parallel import mesh as pmesh
from frido_tpu.parallel import tp


def test_rule_specs():
    assert tp._leaf_spec("x/kernel", (3, 3, 16, 64), 2) == P(
        None, None, None, "model")
    assert tp._leaf_spec("x/kernel", (16, 64), 2) == P(None, "model")
    assert tp._leaf_spec("x/bias", (64,), 2) == P()          # 1-D replicated
    assert tp._leaf_spec("x/kernel", (3, 3, 16, 63), 2) == P()  # not divisible
    assert tp._leaf_spec("tok/embedding", (100, 64), 2) == P("model", None)
    assert tp._leaf_spec("tok/embedding", (101, 64), 2) == P()
    assert tp._leaf_spec("x/kernel", (16, 64), 1) == P()


def test_tp_step_matches_replicated():
    import flax.linen as nn
    import optax

    from frido_tpu.nn.layers import Conv2d, Dense

    class Net(nn.Module):
        def setup(self):
            self.conv = Conv2d(16, 3, padding=1, name="conv")
            self.head = Dense(8, name="head")

        def __call__(self, x):
            h = jax.nn.silu(self.conv(x))
            return self.head(h.mean(axis=(1, 2)))

    net = Net()
    x = np.random.RandomState(0).randn(8, 8, 8, 3).astype(np.float32)
    y = np.random.RandomState(1).randn(8, 8).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))

    def loss_fn(p, xb, yb):
        return jnp.mean((net.apply(p, xb) - yb) ** 2)

    tx = optax.sgd(0.1)

    def step(p, opt, xb, yb):
        loss, g = jax.value_and_grad(loss_fn)(p, xb, yb)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(p, up), opt, loss

    def run(mesh):
        p = tp.shard_params(mesh, params)
        opt = tx.init(p)
        xb = pmesh.shard_batch(mesh, jnp.asarray(x))
        yb = pmesh.shard_batch(mesh, jnp.asarray(y))
        p2, _, loss = jax.jit(step)(p, opt, xb, yb)
        return float(loss), jax.device_get(p2)

    mesh_dp = pmesh.make_mesh(n_data=8, n_model=1)
    mesh_tp = pmesh.make_mesh(n_data=4, n_model=2)

    # the conv kernel really lands sharded on the model axis
    sh = tp.param_shardings(mesh_tp, params)
    assert sh["params"]["conv"]["kernel"].spec == P(None, None, None, "model")
    assert sh["params"]["conv"]["bias"].spec == P()

    loss_dp, p_dp = run(mesh_dp)
    loss_tp, p_tp = run(mesh_tp)
    assert abs(loss_dp - loss_tp) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(p_dp),
                    jax.tree_util.tree_leaves(p_tp)):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_tp_step_matches_dp_on_frido_model():
    """DP x TP (4x2) vs DP-only (8x1) on the structurally-complete tiny
    Frido model (split-head SPADE UNet + BERT cond stage with a sharded
    vocab embedding + frozen MS-VQGAN): loss and updated params must agree.
    This is the path GSPMD could mis-lower silently — especially the
    embedding gather under a 'model'-sharded vocab (VERDICT item #7)."""
    import numpy as np

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

    def run(n_data, n_model):
        m = pmesh.make_mesh(n_data=n_data, n_model=n_model)
        p = tp.shard_params(m, params)
        state, masked = trainer.create_train_state(model, p, tx)
        step = jax.jit(trainer.make_train_step(model, masked, use_ema=False))
        b = pmesh.shard_batch(m, batch)
        new_state, logs = step(state, b, jax.random.PRNGKey(7))
        return float(logs["loss"]), jax.device_get(new_state.params)

    loss_dp, p_dp = run(8, 1)
    loss_tp, p_tp = run(4, 2)
    assert loss_dp == pytest.approx(loss_tp, rel=1e-5)
    flat_dp = jax.tree_util.tree_leaves_with_path(p_dp)
    flat_tp = jax.tree_util.tree_leaves(p_tp)
    assert len(flat_dp) == len(flat_tp)
    for (path, a), b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg=jax.tree_util.keystr(path))
