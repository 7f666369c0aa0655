"""Golden parity for the round-1-untested model paths (VERDICT item #5):

* ``use_stage_expert`` — per-stage duplicate trunks (``pyunet.py:819-834``)
* ``use_mscond`` — prev-stage cross-attention in SpatialTransformer
  (``attention.py:229-240,282-301``)
* ``n_embed`` — codebook-id predictor head (``pyunet.py:811-817``)
* concat / hybrid / adm conditioning routing (``frido.py:1628-1654``)
* ``specify_channels`` partial generation (functional: the reference's
  sampler-level freeze, ``ddim.py:207-209,250-251,270-271``, has no
  runnable standalone path — no shipped config or script sets it — so ours
  is pinned functionally: the frozen prefix must pass through sampling
  untouched while the remaining windows are generated)

Each golden builds the torch reference model (random init, CPU), imports
its state_dict, and asserts value-level agreement — a path that silently
diverges fails on numbers, not just on crashes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.reference_stub import install_reference, state_dict_numpy

torch = pytest.importorskip("torch")

from frido_tpu.io.torch_import import import_state_dict  # noqa: E402
from frido_tpu.nn.pyunet import pyunet_from_config  # noqa: E402

ATOL = 3e-4

BASE = dict(
    use_split_head=True, split_embed_dim_list=[4, 4], use_SPADE_norm=True,
    image_size=8, in_channels=8, out_channels=8, model_channels=32,
    attention_resolutions=[4, 2], num_res_blocks=1, channel_mult=[1, 2],
    num_head_channels=16, use_spatial_transformer=True, transformer_depth=1,
    context_dim=64, num_stage=2,
)


def t2j(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def j2t(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


def _build_pair(cfg, init_ctx_dim=64):
    """(torch reference UNet, our module, imported params) for one config."""
    install_reference()
    from frido.modules.diffusionmodules.pyunet import PyUNetModel as RefUNet

    torch.manual_seed(0)
    ref = RefUNet(**cfg).eval()
    mod = pyunet_from_config(cfg, name=None)
    x0 = jnp.zeros((1, 8, 8, cfg["in_channels"]))
    t0 = jnp.zeros((1,), jnp.int32)
    c0 = (jnp.zeros((1, 5, init_ctx_dim))
          if cfg.get("use_spatial_transformer") else None)
    y0 = None
    if cfg.get("num_classes"):
        y0 = jnp.zeros((1,), jnp.int32)
    params = mod.init(jax.random.PRNGKey(0), x0, t0, c0, y0,
                      method="init_all")
    sd = state_dict_numpy(ref)
    report = {}
    ported = import_state_dict(params["params"], sd, report=report)
    assert report["missing"] == [], report["missing"][:8]
    return ref, mod, {"params": ported}, sd, report


@requires_reference
@pytest.mark.parametrize("stage", [0, 1])
def test_stage_expert_parity(reference_path, stage):
    cfg = dict(BASE, use_stage_expert=True)
    ref, mod, params, sd, report = _build_pair(cfg)
    # every expert trunk key consumed (a silent miss would leave stage-1's
    # expert at random init) — EXCEPT trunk 0's SPADE mlps: stage 0 never
    # has a previous-stage cond map, so those torch params are dead weight
    # (SPADE returns the plain norm when cond is None, spade_norm.py:45-46)
    # and flax never materializes them
    expert_keys = {k for k in sd if "_expert" in k}
    unconsumed = expert_keys - report["used"]
    assert expert_keys and all(
        "_expert.0." in k and "mlp_" in k for k in unconsumed), (
        sorted(unconsumed)[:8])

    torch.manual_seed(20 + stage)
    x = torch.randn(2, 8, 8, 8)
    t = torch.tensor([7, 430])
    ctx = torch.randn(2, 5, 64)
    with torch.no_grad():
        ref_out = ref(x, t, context=ctx, stage=torch.tensor(stage))
    ours = mod.apply(params, t2j(x), jnp.asarray(t.numpy()),
                     jnp.asarray(ctx.numpy()), stage=stage)
    np.testing.assert_allclose(j2t(ours), ref_out.numpy(), atol=ATOL)


@requires_reference
@pytest.mark.parametrize("stage", [0, 1])
def test_mscond_parity(reference_path, stage):
    """Stage 1 routes the previous-stage feature map through the
    cond_proj_in + x_prev attention branch; stage 0 must be unaffected."""
    cfg = dict(BASE, use_mscond=True)
    ref, mod, params, _, _ = _build_pair(cfg)

    torch.manual_seed(30 + stage)
    x = torch.randn(2, 8, 8, 8)
    t = torch.tensor([11, 250])
    ctx = torch.randn(2, 5, 64)
    with torch.no_grad():
        ref_out = ref(x, t, context=ctx, stage=torch.tensor(stage))
    ours = mod.apply(params, t2j(x), jnp.asarray(t.numpy()),
                     jnp.asarray(ctx.numpy()), stage=stage)
    np.testing.assert_allclose(j2t(ours), ref_out.numpy(), atol=ATOL)


@requires_reference
def test_id_predictor_parity(reference_path):
    """n_embed head returns per-pixel codebook logits instead of eps
    (``pyunet.py:811-817``: norm -> 1x1 conv, no SiLU, no out head)."""
    cfg = dict(
        image_size=8, in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[4], num_res_blocks=1, channel_mult=[1, 2],
        num_head_channels=16, num_stage=1, n_embed=16,
        use_split_head=False, use_SPADE_norm=False,
    )
    ref, mod, params, _, _ = _build_pair(cfg)

    torch.manual_seed(3)
    x = torch.randn(2, 4, 8, 8)
    t = torch.tensor([5, 90])
    with torch.no_grad():
        ref_out = ref(x, t, stage=torch.tensor(0))
    ours = mod.apply(params, t2j(x), jnp.asarray(t.numpy()), None, stage=0)
    assert ours.shape == (2, 8, 8, 16)
    np.testing.assert_allclose(j2t(ours), ref_out.numpy(), atol=ATOL)


@requires_reference
@pytest.mark.parametrize("key", ["concat", "hybrid", "adm"])
def test_conditioning_key_parity(reference_path, key):
    """DiffusionWrapper routing (``frido.py:1628-1654``) for the three
    conditioning modes no shipped config uses but the API supports."""
    install_reference()
    import frido.models.diffusion.frido as ref_frido

    from frido_tpu.models.frido import DiffusionWrapper

    cfg = dict(
        image_size=8, in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[4], num_res_blocks=1, channel_mult=[1, 2],
        num_head_channels=16, num_stage=1, use_split_head=False,
        use_SPADE_norm=False,
    )
    cc = None
    ctx = None
    y = None
    if key in ("concat", "hybrid"):
        cfg["in_channels"] = 6  # 4 latent + 2 concat-cond channels
        torch.manual_seed(2)
        cc = torch.randn(2, 2, 8, 8)
    if key == "hybrid":
        cfg.update(use_spatial_transformer=True, transformer_depth=1,
                   context_dim=64)
        torch.manual_seed(4)
        ctx = torch.randn(2, 5, 64)
    if key == "adm":
        cfg.update(num_classes=10, use_embed=True)
        y = torch.tensor([1, 7])

    unet_cfg = {"target": "frido_tpu.nn.pyunet.PyUNetModel", "params": cfg}
    torch.manual_seed(0)
    ref = ref_frido.DiffusionWrapper(
        {"target": "frido.modules.diffusionmodules.pyunet.PyUNetModel",
         "params": cfg}, key).eval()

    ours = DiffusionWrapper(unet_config=unet_cfg, conditioning_key=key,
                            name=None)
    x = torch.randn(2, 4, 8, 8)
    t = torch.tensor([3, 77])
    kw_ours = {}
    kw_ref = {}
    if key in ("concat", "hybrid"):
        kw_ref["c_concat"] = [cc]
        kw_ours["c_concat"] = [t2j(cc)]
    if key == "hybrid":
        kw_ref["c_crossattn"] = [ctx]
        kw_ours["c_crossattn"] = [jnp.asarray(ctx.numpy())]
    if key == "adm":
        kw_ref["c_crossattn"] = [y]
        kw_ours["c_crossattn"] = [jnp.asarray(y.numpy())]

    params = ours.init(jax.random.PRNGKey(0), t2j(x),
                       jnp.asarray(t.numpy()), **kw_ours)
    report = {}
    ported = {"params": import_state_dict(
        params["params"], state_dict_numpy(ref), report=report)}
    assert report["missing"] == [], report["missing"][:8]

    with torch.no_grad():
        ref_out = ref(x, t, stage=torch.tensor(0), **kw_ref)
    got = ours.apply(ported, t2j(x), jnp.asarray(t.numpy()), stage=0,
                     **kw_ours)
    np.testing.assert_allclose(j2t(got), ref_out.numpy(), atol=ATOL)


def test_specify_channels_freezes_prefix():
    """Partial generation: with specify_channels=(k,), the first k latent
    channels of x_init must come through the whole sampling chain
    bit-unchanged while the remaining windows are actually generated."""
    from frido_tpu.diffusion.samplers import SamplerConfig, sample
    from frido_tpu.schedules import DiffusionSchedule

    sched = DiffusionSchedule.create(timesteps=50)
    k = 2
    cfg = SamplerConfig(schedule=sched, num_steps=5, eta=0.0,
                        guidance_scale=1.0, embed_dim_list=(3, 3),
                        use_split_head=True, specify_channels=(k,),
                        num_stage=2, kind="ddim")

    def eps_model(x, t, ctx, stage):
        # windowed split-head output: width of the current stage
        w = (3, 3)[stage]
        return 0.1 * x[..., -w:]

    x_init = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, k + 6))
    out = sample(cfg, eps_model, jax.random.PRNGKey(1), x_init.shape,
                 x_init=x_init)
    np.testing.assert_array_equal(np.asarray(out[..., :k]),
                                  np.asarray(x_init[..., :k]))
    # the generated windows did move
    assert np.abs(np.asarray(out[..., k:]) -
                  np.asarray(x_init[..., k:])).max() > 1e-3
