"""Training-step tests: diffusion DP step and the MS-VQGAN GAN step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frido_tpu.losses.vqperceptual import VQLPIPSWithDiscriminator
from frido_tpu.models.frido import FridoDiffusion
from frido_tpu.models.msvqgan import msvqgan_from_config
from frido_tpu.parallel import mesh as pmesh
from frido_tpu.training import optim, trainer
from frido_tpu.training.ema import init_ema, update_ema
from frido_tpu.training.vqgan_trainer import (
    create_vqgan_train_state,
    make_vqgan_train_step,
)

TINY_ED = dict(multiscale=2, double_z=False, z_channels=[4, 4], resolution=32,
               in_channels=3, out_ch=3, ch=32, ch_mult=[1, 1, 2],
               num_res_blocks=1, attn_resolutions=[8], dropout=0.0)
TINY_DD = dict(double_z=False, z_channels=8, resolution=32, in_channels=3,
               out_ch=3, ch=32, ch_mult=[1, 1], num_res_blocks=1,
               attn_resolutions=[8], dropout=0.0)
TINY_FIRST = {"target": "taming.models.msvqgan.VQModelInterface",
              "params": dict(embed_dim=[4, 4], n_embed=[32, 32],
                             edconfig=TINY_ED, ddconfig=TINY_DD,
                             lossconfig={"target": "taming.modules.losses.DummyLoss"})}
TINY_COND = {"target": "frido.modules.encoders.modules.BERTEmbedder",
             "params": dict(n_embed=32, n_layer=1, vocab_size=32,
                            max_seq_len=8, use_tokenizer=False)}
TINY_UNET = {"target": "frido.modules.diffusionmodules.pyunet.PyUNetModel",
             "params": dict(use_split_head=True, split_embed_dim_list=[4, 4],
                            use_SPADE_norm=True, image_size=16, in_channels=8,
                            out_channels=8, model_channels=32,
                            attention_resolutions=[2], num_res_blocks=1,
                            channel_mult=[1, 2], num_head_channels=16,
                            use_spatial_transformer=True, transformer_depth=1,
                            context_dim=32, num_stage=2)}


@pytest.fixture(scope="module")
def diffusion_model():
    model = FridoDiffusion(
        first_stage_config=TINY_FIRST, cond_stage_config=TINY_COND,
        unet_config=TINY_UNET, timesteps=50, loss_type="l1", image_size=16,
        channels=8, conditioning_key="crossattn", adopted_scale_factor=True,
        noise_mix_ratio=0.1, cond_stage_trainable=True)
    params = model.init_params(jax.random.PRNGKey(0), context_len=8)
    return model, params


def test_train_step_runs_and_freezes_first_stage(diffusion_model):
    model, params = diffusion_model
    tx = optim.build_optimizer(1e-3)
    state, masked = trainer.create_train_state(model, params, tx)
    step = jax.jit(trainer.make_train_step(model, masked))
    batch = {"image": jnp.asarray(
        np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32),
        "tokens": jnp.asarray(
            np.random.RandomState(1).randint(0, 32, (2, 8)))}
    s1, logs = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["loss"]))
    # frozen first stage: params unchanged
    before = state.params["params"]["first_stage_model"]["post_quant_conv"]["kernel"]
    after = s1.params["params"]["first_stage_model"]["post_quant_conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    # denoiser must move
    b2 = state.params["params"]["model"]["diffusion_model"]["time_embed__0"]["kernel"]
    a2 = s1.params["params"]["model"]["diffusion_model"]["time_embed__0"]["kernel"]
    assert np.abs(np.asarray(a2) - np.asarray(b2)).max() > 0
    # EMA advanced, and shadows only the denoiser wrapper (the reference's
    # LitEma wraps self.model, not first/cond stage — frido.py:95-99)
    assert int(s1.ema_updates) == 1
    assert "diffusion_model" in s1.ema_params
    assert "first_stage_model" not in s1.ema_params
    full = trainer.ema_full_params(s1)
    assert "first_stage_model" in full["params"]
    assert full["params"]["model"] is s1.ema_params


def test_mu_bf16_train_step(diffusion_model):
    """Adam first moment in bf16 (optim.build_optimizer(mu_dtype=...),
    main.py --adam_mu_bf16): -1.27 GB of optimizer state on the flagship
    (the batch-32 remat enabler, docs/PERF.md). The moment buffers must
    actually be bf16, only for TRAINABLE leaves, and a step's updated
    params must track the fp32-moment step closely."""
    model, params = diffusion_model
    batch = {"image": jnp.asarray(
        np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32),
        "tokens": jnp.asarray(
            np.random.RandomState(1).randint(0, 32, (2, 8)))}

    def one_step(mu_dtype):
        tx = optim.build_optimizer(1e-3, mu_dtype=mu_dtype)
        state, masked = trainer.create_train_state(model, params, tx)
        if mu_dtype is not None:
            mu = state.opt_state.inner_states["train"].inner_state[0].mu
            leaves = [x for x in jax.tree.leaves(mu)
                      if hasattr(x, "dtype")]
            assert leaves and all(x.dtype == mu_dtype for x in leaves)
        step = jax.jit(trainer.make_train_step(model, masked,
                                               use_ema=False))
        s1, logs = step(state, batch, jax.random.PRNGKey(0))
        return (s1.params["params"]["model"]["diffusion_model"]
                ["time_embed__0"]["kernel"], float(logs["loss"]))

    k32, l32 = one_step(None)
    kb, lb = one_step(jnp.bfloat16)
    # loss is computed before the moment rounding; tight-tolerance rather
    # than == (two separately compiled programs — XLA reduce ordering is
    # not guaranteed bit-stable across compilations)
    np.testing.assert_allclose(lb, l32, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(kb), np.asarray(k32),
                               atol=1e-5, rtol=1e-3)


def test_train_loss_decreases(diffusion_model):
    model, params = diffusion_model
    tx = optim.build_optimizer(2e-3)
    state, masked = trainer.create_train_state(model, params, tx)
    step = jax.jit(trainer.make_train_step(model, masked, use_ema=False))
    batch = {"image": jnp.asarray(
        np.random.RandomState(0).randn(4, 32, 32, 3) * 0.1, jnp.float32),
        "tokens": jnp.asarray(
            np.random.RandomState(1).randint(0, 32, (4, 8)))}
    losses = []
    rng = jax.random.PRNGKey(7)
    for i in range(30):
        state, logs = step(state, batch, rng)
        losses.append(float(logs["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_bf16_train_step_matches_fp32(diffusion_model):
    """Mixed-precision step (bf16 compute, fp32 master): loss and updated
    params track the fp32 step within bf16 resolution, and params/opt
    state stay fp32."""
    model, params = diffusion_model
    tx = optim.build_optimizer(1e-3)
    state, masked = trainer.create_train_state(model, params, tx)
    batch = {"image": jnp.asarray(
        np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32),
        "tokens": jnp.asarray(
            np.random.RandomState(1).randint(0, 32, (2, 8)))}
    rng = jax.random.PRNGKey(0)
    step32 = jax.jit(trainer.make_train_step(model, masked))
    step16 = jax.jit(trainer.make_train_step(
        model, masked, compute_dtype=jnp.bfloat16))
    s32, l32 = step32(state, batch, rng)
    s16, l16 = step16(state, batch, rng)
    assert np.isfinite(float(l16["loss"]))
    np.testing.assert_allclose(float(l16["loss"]), float(l32["loss"]),
                               rtol=0.05)
    w16 = s16.params["params"]["model"]["diffusion_model"]["time_embed__0"]["kernel"]
    w32 = s32.params["params"]["model"]["diffusion_model"]["time_embed__0"]["kernel"]
    assert w16.dtype == jnp.float32
    # AdamW normalizes the update to ~lr scale, so same-sign agreement of
    # the two steps' deltas is the meaningful check
    d16 = np.asarray(w16) - np.asarray(
        state.params["params"]["model"]["diffusion_model"]["time_embed__0"]["kernel"])
    d32 = np.asarray(w32) - np.asarray(
        state.params["params"]["model"]["diffusion_model"]["time_embed__0"]["kernel"])
    assert (np.sign(d16) == np.sign(d32)).mean() > 0.8


def test_ema_shadow_is_a_copy():
    """Shadow leaves must not alias the param buffers: with the train
    state donated, aliased leaves make XLA reject the step ('attempt to
    donate the same buffer twice')."""
    p = {"w": jnp.ones((8,))}
    shadow, _ = init_ema(p)
    assert (shadow["w"].unsafe_buffer_pointer()
            != p["w"].unsafe_buffer_pointer())


def test_restore_legacy_full_tree_ema(diffusion_model, tmp_path):
    """Checkpoints written when the EMA shadowed the full param tree must
    still resume: restore falls back to a full-tree template and slices
    out the denoiser subtree."""
    from frido_tpu.io import checkpoint as ckpt_io

    model, params = diffusion_model
    tx = optim.build_optimizer(1e-3)
    state, _ = trainer.create_train_state(model, params, tx)
    legacy = state.replace(ema_params=jax.tree_util.tree_map(
        lambda p: jnp.array(p, copy=True), state.params))
    ckpt_io.save_train_state(str(tmp_path), 7, legacy)
    restored, step = ckpt_io.restore_train_state(str(tmp_path), state)
    assert step == 7
    assert "diffusion_model" in restored.ema_params
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(
            legacy.ema_params["params"]["model"])[0]))


def test_ema_ramp():
    p0 = {"w": jnp.ones((3,))}
    shadow, n = init_ema(p0)
    p1 = {"w": jnp.zeros((3,))}
    shadow, n = update_ema(shadow, p1, n)
    # first step: decay = min(.9999, 2/11)
    np.testing.assert_allclose(np.asarray(shadow["w"]),
                               np.full(3, 2 / 11), rtol=1e-6)
    assert int(n) == 1


def test_sharded_train_step_matches_single_device(diffusion_model):
    model, params = diffusion_model
    tx = optim.build_optimizer(1e-3)
    state, masked = trainer.create_train_state(model, params, tx)
    step_fn = trainer.make_train_step(model, masked)
    batch = {"image": jnp.asarray(
        np.random.RandomState(3).randn(8, 32, 32, 3), jnp.float32),
        "tokens": jnp.asarray(
            np.random.RandomState(4).randint(0, 32, (8, 8)))}
    rng = jax.random.PRNGKey(0)

    s_single, logs_single = jax.jit(step_fn)(state, batch, rng)

    m = pmesh.make_mesh(n_data=8)
    sharded = jax.jit(
        step_fn,
        in_shardings=(pmesh.replicated(m), pmesh.batch_sharding(m),
                      pmesh.replicated(m)),
        out_shardings=(pmesh.replicated(m), pmesh.replicated(m)))
    s_multi, logs_multi = sharded(
        pmesh.replicate(m, state), pmesh.shard_batch(m, batch), rng)
    np.testing.assert_allclose(float(logs_single["loss"]),
                               float(logs_multi["loss"]), rtol=2e-5)
    a = np.asarray(jax.tree_util.tree_leaves(s_single.params)[0])
    b = np.asarray(jax.tree_util.tree_leaves(s_multi.params)[0])
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_vqgan_gan_step():
    mod = msvqgan_from_config(TINY_FIRST["params"], name=None)
    loss = VQLPIPSWithDiscriminator(disc_start=0, disc_num_layers=2,
                                    disc_weight=0.8, perceptual_weight=0.0)
    tx_g = optim.build_optimizer(1e-4)
    tx_d = optim.build_optimizer(1e-4)
    state = create_vqgan_train_state(mod, loss, jax.random.PRNGKey(0),
                                     tx_g, tx_d, image_shape=(2, 32, 32, 3))
    step = jax.jit(make_vqgan_train_step(mod, loss, tx_g, tx_d))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3) * 0.5,
                    jnp.float32)
    s1, logs = step(state, x)
    for k in ["aeloss", "discloss", "d_weight", "quant_loss"]:
        assert np.isfinite(float(logs[k])), k
    # discriminator BN stats updated
    rm0 = jax.tree_util.tree_leaves(state.vars_d["batch_stats"])[0]
    rm1 = jax.tree_util.tree_leaves(s1.vars_d["batch_stats"])[0]
    assert np.abs(np.asarray(rm1) - np.asarray(rm0)).max() > 0
    # one more step with disc warmup gate
    loss2 = VQLPIPSWithDiscriminator(disc_start=1000, disc_num_layers=2,
                                     perceptual_weight=0.0)
    step2 = jax.jit(make_vqgan_train_step(mod, loss2, tx_g, tx_d))
    s2, logs2 = step2(state, x)
    assert float(logs2["discloss"]) == 0.0  # gated before disc_start
    # last-layer-only adaptive-weight formulation == two full backwards:
    # d_weight and the combined gradient must match the naive graph
    def gen_losses(params_g, x_):
        dec, qloss, _ = mod.apply(params_g, x_, False)
        nll, _ = loss.nll_loss(state.vars_d, x_, dec, None)
        logits_fake, _ = loss.logits(state.vars_d, dec, train=True)
        return nll, qloss, -jnp.mean(logits_fake)

    def f_nll(p):
        nll, q, _ = gen_losses(p, x)
        return nll + loss.codebook_weight * q

    def f_g(p):
        return gen_losses(p, x)[2]

    g_nll = jax.grad(f_nll)(state.params_g)
    g_g = jax.grad(f_g)(state.params_g)
    last = lambda t: t["params"]["decoder"]["conv_out"]["kernel"]
    gn = jnp.linalg.norm(last(g_nll))
    gg = jnp.linalg.norm(last(g_g))
    want_dw = float(jnp.clip(gn / (gg + 1e-4), 0.0, 1e4)
                    * loss.discriminator_weight)
    np.testing.assert_allclose(float(logs["d_weight"]), want_dw, rtol=1e-4)
    want_grad = jax.tree_util.tree_map(
        lambda a, b: a + want_dw * loss.disc_factor * b, g_nll, g_g)
    # compare the updated params against applying the naive combined grad
    tx_chk = optim.build_optimizer(1e-4)
    upd, _ = tx_chk.update(want_grad, tx_chk.init(state.params_g),
                           state.params_g)
    import optax as _optax

    want_params = _optax.apply_updates(state.params_g, upd)
    np.testing.assert_allclose(
        np.asarray(last(s1.params_g)), np.asarray(last(want_params)),
        atol=1e-6)

    # bf16 compute variant tracks the fp32 step (fp32 losses/d_weight)
    step16 = jax.jit(make_vqgan_train_step(mod, loss, tx_g, tx_d,
                                           compute_dtype=jnp.bfloat16))
    s16, logs16 = step16(state, x)
    assert np.isfinite(float(logs16["aeloss"]))
    np.testing.assert_allclose(float(logs16["nll_loss"]),
                               float(logs["nll_loss"]), rtol=0.05)
    w = jax.tree_util.tree_leaves(s16.params_g)[0]
    assert w.dtype == jnp.float32


def test_pixel_space_ddpm_standalone():
    """A first-stage-free DDPM config must build, train, and sample in
    pixel space (reference ``frido.py:45-476``; VERDICT round-1 item #9)."""
    from frido_tpu.models.frido import DDPM

    m = DDPM(unet_config={
        "target": "frido_tpu.nn.pyunet.PyUNetModel",
        "params": {"image_size": 16, "in_channels": 3, "out_channels": 3,
                   "model_channels": 32, "num_res_blocks": 1,
                   "attention_resolutions": [4], "num_head_channels": 8,
                   "channel_mult": [1, 2]}},
        channels=3, image_size=16, timesteps=100)
    assert m.num_stage == 1 and m.first_stage_config is None
    params = m.init_params(jax.random.PRNGKey(0))

    # encode/decode are identity in pixel space
    x = jnp.ones((1, 16, 16, 3)) * 0.25
    z = m.encode_first_stage(params, x)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x))

    tx = optim.build_optimizer(1e-3)
    state, masked = trainer.create_train_state(m, params, tx)
    step = jax.jit(trainer.make_train_step(m, masked, use_ema=False))
    batch = {"image": jnp.asarray(
        np.random.RandomState(0).randn(2, 16, 16, 3) * 0.1, jnp.float32)}
    _, logs = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(logs["loss"]))

    out = m.sample(params, jax.random.PRNGKey(1), 1, steps=4, eta=0.0,
                   sampler="ddim")
    assert out.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(
        np.asarray(m.decode_first_stage(params, out)), np.asarray(out))


def test_learn_logvar_trains_the_logvar():
    """learn_logvar=True puts a per-timestep logvar in the params tree and
    the optimizer moves it (``frido.py:121-124,473-474``)."""
    from frido_tpu.models.frido import DDPM

    m = DDPM(unet_config={
        "target": "frido_tpu.nn.pyunet.PyUNetModel",
        "params": {"image_size": 16, "in_channels": 3, "out_channels": 3,
                   "model_channels": 32, "num_res_blocks": 1,
                   "attention_resolutions": [4], "num_head_channels": 8,
                   "channel_mult": [1, 2]}},
        channels=3, image_size=16, timesteps=100, learn_logvar=True,
        logvar_init=0.0)
    params = m.init_params(jax.random.PRNGKey(0))
    assert params["params"]["logvar"].shape == (100,)

    tx = optim.build_optimizer(1e-2)
    state, masked = trainer.create_train_state(m, params, tx)
    step = jax.jit(trainer.make_train_step(m, masked, use_ema=False))
    batch = {"image": jnp.asarray(
        np.random.RandomState(0).randn(4, 16, 16, 3) * 0.1, jnp.float32)}
    s1, _ = step(state, batch, jax.random.PRNGKey(2))
    moved = np.abs(np.asarray(s1.params["params"]["logvar"])
                   - np.asarray(params["params"]["logvar"]))
    assert moved.max() > 0  # the drawn timesteps' entries moved

    # default: no logvar param at all
    m2 = DDPM(unet_config=m.unet_config, channels=3, image_size=16,
              timesteps=100)
    assert "logvar" not in m2.init_params(jax.random.PRNGKey(0))["params"]
