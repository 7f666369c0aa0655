"""Golden parity for the full FridoDiffusion stack vs the torch reference:
conditioning, apply_model, channel-windowed q_sample, per-stage losses, and
the complete deterministic PLMS / DDIM sampling chains.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.reference_stub import (
    SMALL_DDCONFIG,
    SMALL_EDCONFIG,
    install_reference,
    state_dict_numpy,
)

torch = pytest.importorskip("torch")

from frido_tpu.io.torch_import import import_state_dict  # noqa: E402
from frido_tpu.models.frido import FridoDiffusion  # noqa: E402

UNET_PARAMS = dict(
    use_split_head=True, split_embed_dim_list=[4, 4], use_SPADE_norm=True,
    image_size=16, in_channels=8, out_channels=8, model_channels=32,
    attention_resolutions=[4, 2], num_res_blocks=1, channel_mult=[1, 2],
    num_head_channels=16, use_spatial_transformer=True, transformer_depth=1,
    context_dim=48, num_stage=2,
)

MODEL_PARAMS = dict(
    adopted_scale_factor=True, noise_mix_ratio=0.1, first_stage_key="image",
    cond_stage_key="caption", linear_start=0.0015, linear_end=0.0155,
    timesteps=100, loss_type="l1", image_size=16, channels=8,
    cond_stage_trainable=True, conditioning_key="crossattn",
    scale_by_std=True, monitor="val/loss_ema",
)

COND_PARAMS = dict(n_embed=48, n_layer=2, vocab_size=50, max_seq_len=12,
                   use_tokenizer=False)

FIRST_STAGE = {
    "target": "taming.models.msvqgan.VQModelInterface",
    "params": dict(
        embed_dim=[4, 4], n_embed=[64, 64], edconfig=SMALL_EDCONFIG,
        ddconfig=SMALL_DDCONFIG,
        lossconfig={"target": "taming.modules.losses.DummyLoss"},
    ),
}
COND_STAGE = {
    "target": "frido.modules.encoders.modules.BERTEmbedder",
    "params": COND_PARAMS,
}
UNET_CONFIG = {
    "target": "frido.modules.diffusionmodules.pyunet.PyUNetModel",
    "params": UNET_PARAMS,
}


def t2j(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def j2t(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


@pytest.fixture(scope="module")
def models(reference_path):
    install_reference()
    # torch cpu build: route the reference's .cuda() calls to identity
    torch.Tensor.cuda = lambda self, *a, **k: self
    import frido.models.diffusion.frido as ref_frido

    torch.manual_seed(0)
    ref = ref_frido.FridoDiffusion(
        first_stage_config=FIRST_STAGE, cond_stage_config=COND_STAGE,
        unet_config=UNET_CONFIG, **MODEL_PARAMS).eval()

    ours = FridoDiffusion(
        first_stage_config=FIRST_STAGE, cond_stage_config=COND_STAGE,
        unet_config=UNET_CONFIG, **MODEL_PARAMS)
    params = ours.init_params(jax.random.PRNGKey(0), context_len=12)
    sd = state_dict_numpy(ref)
    ported = {"params": import_state_dict(params["params"], sd)}
    # match scale factors (reference registers ones-vector under scale_by_std)
    ours.scale_factors = np.asarray(sd["scale_factor"], np.float32)
    return ref, ours, ported


@requires_reference
def test_conditioning_parity(models):
    ref, ours, params = models
    tokens = torch.randint(0, 50, (2, 12))
    with torch.no_grad():
        ctx_ref = ref.get_learned_conditioning(tokens)
    ctx = ours.get_learned_conditioning(params, jnp.asarray(tokens.numpy()))
    np.testing.assert_allclose(np.asarray(ctx), ctx_ref.numpy(), atol=3e-5)


@requires_reference
@pytest.mark.parametrize("stage", [0, 1])
def test_apply_model_parity(models, stage):
    ref, ours, params = models
    torch.manual_seed(stage)
    x = torch.randn(2, 8, 16, 16)
    t = torch.tensor([5, 60])
    ctx = torch.randn(2, 12, 48)
    with torch.no_grad():
        out_ref = ref.apply_model(x, t, ctx, stage=torch.tensor(stage))
    out = ours.apply_model(params, t2j(x), jnp.asarray(t.numpy()),
                           jnp.asarray(ctx.numpy()), stage)
    np.testing.assert_allclose(j2t(out), out_ref.numpy(), atol=3e-4)


@requires_reference
@pytest.mark.parametrize("stage", [0, 1])
def test_q_sample_parity(models, stage):
    ref, ours, params = models
    torch.manual_seed(10 + stage)
    x = torch.randn(2, 8, 16, 16)
    noise = torch.randn_like(x)
    t = torch.tensor([3, 77])
    start = sum(ref.embed_dim_list[:stage])
    end = sum(ref.embed_dim_list[:stage + 1])
    with torch.no_grad():
        ref_out = ref.q_sample(x, t, ch_start=start, ch_end=end, noise=noise,
                               mix_tau=ref.noise_mix_ratio)
    out = ours.q_sample_stage(t2j(x), jnp.asarray(t.numpy()), stage, t2j(noise))
    np.testing.assert_allclose(j2t(out), ref_out.numpy(), atol=1e-5)


@requires_reference
@pytest.mark.parametrize("stage", [0, 1])
def test_p_losses_parity(models, stage):
    ref, ours, params = models
    torch.manual_seed(20 + stage)
    z = torch.randn(2, 8, 16, 16)
    noise = torch.randn_like(z)
    t = torch.tensor([9, 55])
    ctx = torch.randn(2, 12, 48)
    ref.training = False
    with torch.no_grad():
        loss_ref, _ = ref.p_losses(z, ctx, t, stage, noise=noise)
    loss, _ = ours.p_losses(params, t2j(z), jnp.asarray(ctx.numpy()),
                            jnp.asarray(t.numpy()), stage, t2j(noise),
                            deterministic=True)
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=2e-5)


def _run_reference_sampler(ref, sampler_cls, x_init, ctx, uctx, steps, gs):
    # CPU build: neutralize the sampler's .to(cuda) buffer moves
    sampler_cls.register_buffer = lambda self, name, attr: setattr(
        self, name, attr)
    sampler = sampler_cls(ref)
    shape = list(x_init.shape[1:])
    torch.manual_seed(42)  # consumed by the sampler's internal randn
    with torch.no_grad():
        samples, _ = sampler.sample(
            steps, x_init.shape[0], shape, conditioning=ctx,
            num_stage=ref.num_resulotion, verbose=False, eta=0.0,
            unconditional_guidance_scale=gs, unconditional_conditioning=uctx)
    return samples


@requires_reference
@pytest.mark.parametrize("kind,gs", [("plms", 1.0), ("plms", 1.5),
                                     ("ddim", 1.5)])
def test_full_sampling_chain_parity(models, kind, gs):
    """The end-to-end golden: identical weights + identical initial noise
    -> identical latents through the full 2-stage sampler chain (eta=0)."""
    install_reference()
    from frido.models.diffusion.ddim import DDIMSampler
    from frido.models.diffusion.plms import PLMSSampler

    ref, ours, params = models
    steps = 6
    torch.manual_seed(7)
    ctx = torch.randn(2, 12, 48)
    uctx = torch.randn(2, 12, 48)

    # the torch sampler draws x_T internally right after manual_seed(42)
    torch.manual_seed(42)
    x_init = torch.randn(2, 8, 16, 16)

    cls = PLMSSampler if kind == "plms" else DDIMSampler
    ref_out = _run_reference_sampler(ref, cls, x_init, ctx, uctx, steps, gs)

    out = ours.sample(
        params, jax.random.PRNGKey(0), 2, context=jnp.asarray(ctx.numpy()),
        uncond_context=jnp.asarray(uctx.numpy()), steps=steps, eta=0.0,
        guidance_scale=gs, sampler=kind, x_init=t2j(x_init))
    np.testing.assert_allclose(j2t(out), ref_out.numpy(), atol=2e-3)
