"""Flagship-scale golden parity + full importer key coverage.

Round-1 parity ran only at toy size (model_channels=32, 16^2 latents); this
suite builds the *real* published configs — t2i f16f8
(``/root/reference/configs/frido/t2i/frido_f16f8_coco.yaml:22-46``, ~512M-param
UNet, 32^2 latents) and layout2i f8f4
(``configs/frido/layout2i/frido_f8f4_coco_seg.yaml``, 64^2 latents) — as torch
reference models (random init, CPU), and proves:

(a) the torch-ckpt importer maps EVERY key: zero flax leaves missing a torch
    source, and every torch state_dict key is consumed by exactly one of
    {param import, EMA import, schedule-buffer whitelist} — a naming drift at
    flagship scale (head-count legacy logic, pos-embed sizes) silently wrecks
    FID rather than erroring (SURVEY.md §7 "hard parts",
    ``/root/reference/frido/modules/diffusionmodules/pyunet.py:632-693``);
(b) golden apply_model per pyramid stage at full shape;
(c) a full-shape 3-step PLMS chain with CFG 1.5 (t2i config);
(d) first-stage encode (pre-quant interface) at 256^2 and the cond-stage
    transformer at dim 640 x depth 32.

Everything runs at batch 1 on CPU f32; tolerances are wider than the toy
suite because a 512M-param depth accumulates conv-backend differences.
"""

import gc

import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.reference_stub import install_reference, state_dict_numpy

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from frido_tpu.config import load_configs  # noqa: E402
from frido_tpu.io.torch_import import import_state_dict  # noqa: E402
from frido_tpu.models.frido import FridoDiffusion  # noqa: E402
from frido_tpu.training.ema import import_ema  # noqa: E402

T2I = "/root/reference/configs/frido/t2i/frido_f16f8_coco.yaml"
LAYOUT2I = "/root/reference/configs/frido/layout2i/frido_f8f4_coco_seg.yaml"

# buffers the importer intentionally does not consume: schedule constants are
# recomputed from config and verified float64-exactly in test_schedules.py;
# scale_factor is applied via FridoDiffusion.scale_factors; LitEma counters
# are not parameters.
NON_PARAM_KEYS = {
    "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod", "log_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
    "posterior_variance", "posterior_log_variance_clipped",
    "posterior_mean_coef1", "posterior_mean_coef2",
    "scale_factor", "model_ema.decay", "model_ema.num_updates",
    # x-transformer's to_logits head is checkpoint dead weight: every Frido
    # call site passes return_embeddings=True (x_transformer.py:628,
    # modules.py:52,107), so the logits projection never runs.
    "cond_stage_model.transformer.to_logits.weight",
    "cond_stage_model.transformer.to_logits.bias",
}


def _model_params(cfg_path):
    cfg = load_configs([cfg_path])
    mp = dict(cfg["model"]["params"])
    # the published config points at a pretrained first-stage ckpt we don't
    # have; drop it (random init) and disable the network-fetching tokenizer
    # (tokenization parity is covered by test_tokenizers.py)
    fs = dict(mp["first_stage_config"])
    fs["params"] = {k: v for k, v in dict(fs["params"]).items()
                    if k != "ckpt_path"}
    mp["first_stage_config"] = fs
    cs = dict(mp["cond_stage_config"])
    cs["params"] = dict(dict(cs["params"]), use_tokenizer=False)
    mp["cond_stage_config"] = cs
    return mp


def _build_pair(cfg_path):
    """(torch reference model, ours, imported params, state_dict)."""
    install_reference()
    torch.Tensor.cuda = lambda self, *a, **k: self
    import frido.models.diffusion.frido as ref_frido

    mp = _model_params(cfg_path)
    torch.manual_seed(0)
    ref = ref_frido.FridoDiffusion(
        first_stage_config=mp["first_stage_config"],
        cond_stage_config=mp["cond_stage_config"],
        unet_config=mp["unet_config"],
        **{k: v for k, v in mp.items()
           if k not in ("first_stage_config", "cond_stage_config",
                        "unet_config")},
    ).eval()

    ours = FridoDiffusion(
        first_stage_config=mp["first_stage_config"],
        cond_stage_config=mp["cond_stage_config"],
        unet_config=mp["unet_config"],
        **{k: v for k, v in mp.items()
           if k not in ("first_stage_config", "cond_stage_config",
                        "unet_config")})
    seq_len = mp["cond_stage_config"]["params"].get("max_seq_len", 77)
    params = ours.init_params(jax.random.PRNGKey(0), context_len=seq_len)
    sd = state_dict_numpy(ref)
    report = {}
    ported = {"params": import_state_dict(params["params"], sd,
                                          report=report)}
    ours.scale_factors = np.asarray(sd["scale_factor"], np.float32)
    return ref, ours, params, ported, sd, report


def _coverage_check(params, sd, report):
    """Every flax leaf filled; every torch key consumed exactly once."""
    assert report["missing"] == [], (
        f"{len(report['missing'])} flax leaves have no torch source: "
        f"{report['missing'][:8]}")
    ema_report = {}
    import_ema(params["params"]["model"], sd, report=ema_report)
    assert ema_report["missing"] == [], (
        f"{len(ema_report['missing'])} EMA leaves unmatched: "
        f"{ema_report['missing'][:8]}")
    accounted = report["used"] | ema_report["used"] | NON_PARAM_KEYS
    unconsumed = sorted(set(sd) - accounted)
    assert unconsumed == [], (
        f"{len(unconsumed)} torch keys not consumed by the importer: "
        f"{unconsumed[:8]}")


@pytest.fixture(scope="module")
def t2i_pair(reference_path):
    pair = _build_pair(T2I)
    yield pair
    del pair
    gc.collect()


@requires_reference
def test_t2i_key_coverage(t2i_pair):
    _, _, params, _, sd, report = t2i_pair
    _coverage_check(params, sd, report)


@requires_reference
@pytest.mark.parametrize("stage", [0, 1])
def test_t2i_apply_model_parity(t2i_pair, stage):
    ref, ours, _, ported, _, _ = t2i_pair
    torch.manual_seed(stage)
    x = torch.randn(1, 8, 32, 32)
    t = torch.tensor([414])
    ctx = torch.randn(1, 77, 640)
    with torch.no_grad():
        out_ref = ref.apply_model(x, t, ctx, stage=torch.tensor(stage))
    out = ours.apply_model(
        ported, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()), stage)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), out_ref.numpy(), atol=2e-3)
    del out, out_ref
    gc.collect()


@requires_reference
def test_t2i_first_and_cond_stage_parity(t2i_pair):
    ref, ours, _, ported, _, _ = t2i_pair
    torch.manual_seed(3)
    img = torch.rand(1, 3, 256, 256) * 2 - 1
    with torch.no_grad():
        z_ref = ref.first_stage_model.encode(img)
    z = ours.module.apply(ported, jnp.asarray(
        img.numpy().transpose(0, 2, 3, 1)), method="encode_first_stage")
    np.testing.assert_allclose(
        np.asarray(z).transpose(0, 3, 1, 2), z_ref.numpy(), atol=2e-3)

    tokens = torch.randint(0, 30522, (1, 77))
    with torch.no_grad():
        ctx_ref = ref.get_learned_conditioning(tokens)
    ctx = ours.get_learned_conditioning(ported, jnp.asarray(tokens.numpy()))
    np.testing.assert_allclose(np.asarray(ctx), ctx_ref.numpy(), atol=2e-3)
    del z, z_ref, ctx, ctx_ref
    gc.collect()


@requires_reference
def test_t2i_plms_chain_parity(t2i_pair):
    """4-step PLMS, 2 stages, CFG 1.5, full 32^2x8 latent shape.

    4 steps, not 3: the reference's uniform ddim-timestep formula
    (``util.py:57-65``) indexes alphacums[1000] whenever 1000 % S != 0 and
    crashes — 4 divides evenly and also reaches the 3rd-order AB branch.
    """
    install_reference()
    from frido.models.diffusion.plms import PLMSSampler

    ref, ours, _, ported, _, _ = t2i_pair
    steps = 4
    torch.manual_seed(7)
    ctx = torch.randn(1, 77, 640)
    uctx = torch.randn(1, 77, 640)
    torch.manual_seed(42)
    x_init = torch.randn(1, 8, 32, 32)

    PLMSSampler.register_buffer = lambda self, name, attr: setattr(
        self, name, attr)
    sampler = PLMSSampler(ref)
    torch.manual_seed(42)
    with torch.no_grad():
        ref_out, _ = sampler.sample(
            steps, 1, [8, 32, 32], conditioning=ctx,
            num_stage=ref.num_resulotion, verbose=False, eta=0.0,
            unconditional_guidance_scale=1.5, unconditional_conditioning=uctx)

    out = ours.sample(
        ported, jax.random.PRNGKey(0), 1, context=jnp.asarray(ctx.numpy()),
        uncond_context=jnp.asarray(uctx.numpy()), steps=steps, eta=0.0,
        guidance_scale=1.5, sampler="plms",
        x_init=jnp.asarray(x_init.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), atol=5e-3)
    del out, ref_out, sampler
    gc.collect()


@requires_reference
def test_layout2i_key_coverage_and_apply_model(reference_path):
    """f8f4 config: 64^2 latents, [3,3] channel split, ch_mult [1,2,4]
    decoder — a different head-count/pos-embed regime than f16f8."""
    ref, ours, params, ported, sd, report = _build_pair(LAYOUT2I)
    _coverage_check(params, sd, report)

    for stage in (0, 1):
        torch.manual_seed(stage)
        x = torch.randn(1, 6, 64, 64)
        t = torch.tensor([100])
        ctx = torch.randn(1, 96, 640)
        with torch.no_grad():
            out_ref = ref.apply_model(x, t, ctx, stage=torch.tensor(stage))
        out = ours.apply_model(
            ported, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()), stage)
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), out_ref.numpy(),
            atol=2e-3)
        del out, out_ref
    del ref, ours, params, ported, sd
    gc.collect()
