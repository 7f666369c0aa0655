"""Golden parity: PyUNet denoiser vs the torch reference, weight-for-weight."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.reference_stub import install_reference, state_dict_numpy

torch = pytest.importorskip("torch")

from frido_tpu.io.torch_import import import_state_dict  # noqa: E402
from frido_tpu.nn.pyunet import pyunet_from_config, timestep_embedding  # noqa: E402

ATOL = 3e-4

SMALL_UNET = dict(
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


@requires_reference
def test_timestep_embedding_parity(reference_path):
    install_reference()
    from frido.modules.diffusionmodules.util import (
        timestep_embedding as ref_emb,
    )

    t = torch.tensor([0, 1, 17, 999])
    ref = ref_emb(t, 32).numpy()
    ours = np.asarray(timestep_embedding(jnp.asarray(t.numpy()), 32))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.fixture(scope="module")
def ported_unet(reference_path):
    install_reference()
    from frido.modules.diffusionmodules.pyunet import PyUNetModel as RefUNet

    torch.manual_seed(0)
    ref = RefUNet(**SMALL_UNET).eval()

    mod = pyunet_from_config(SMALL_UNET, name=None)
    x0 = jnp.zeros((1, 8, 8, 8))
    t0 = jnp.zeros((1,), jnp.int32)
    c0 = jnp.zeros((1, 5, 64))
    params = mod.init(jax.random.PRNGKey(0), x0, t0, c0, method="init_all")
    ported = import_state_dict(params["params"], state_dict_numpy(ref))
    return ref, mod, {"params": ported}


@requires_reference
@pytest.mark.parametrize("stage", [0, 1])
def test_pyunet_forward_parity(ported_unet, stage):
    ref, mod, params = ported_unet
    torch.manual_seed(10 + stage)
    x = torch.randn(2, 8, 8, 8)  # NCHW
    t = torch.tensor([3, 500])
    ctx = torch.randn(2, 5, 64)
    with torch.no_grad():
        # pass stage as 0-d tensor: the int path calls .cuda()
        ref_out = ref(x, t, context=ctx, stage=torch.tensor(stage))
    # reference indexes pre_input_blocks[stage] with tensor stage -> need int
    # for module list indexing; it works because torch tensors index lists?
    ours = mod.apply(params, t2j(x), jnp.asarray(t.numpy()),
                     jnp.asarray(ctx.numpy()), stage=stage)
    np.testing.assert_allclose(j2t(ours), ref_out.numpy(), atol=ATOL)


@requires_reference
def test_pyunet_no_spade_no_split(reference_path):
    """Plain guided-diffusion trunk (no split head, conv attention)."""
    install_reference()
    from frido.modules.diffusionmodules.pyunet import PyUNetModel as RefUNet

    cfg = dict(
        image_size=8, in_channels=8, out_channels=8, model_channels=32,
        attention_resolutions=[2], num_res_blocks=1, channel_mult=[1, 2],
        num_head_channels=16, num_stage=1,
    )
    torch.manual_seed(1)
    ref = RefUNet(**cfg).eval()
    mod = pyunet_from_config(cfg, name=None)
    x0 = jnp.zeros((1, 8, 8, 8))
    t0 = jnp.zeros((1,), jnp.int32)
    params = mod.init(jax.random.PRNGKey(0), x0, t0, method="init_all")
    ported = import_state_dict(params["params"], state_dict_numpy(ref))

    torch.manual_seed(2)
    x = torch.randn(2, 8, 8, 8)
    t = torch.tensor([7, 42])
    with torch.no_grad():
        ref_out = ref(x, t, stage=torch.tensor(0))
    ours = mod.apply({"params": ported}, t2j(x), jnp.asarray(t.numpy()), stage=0)
    np.testing.assert_allclose(j2t(ours), ref_out.numpy(), atol=ATOL)


@requires_reference
def test_import_ema_flat_names(ported_unet):
    """EMA buffers in reference checkpoints use LitEma's flattened names
    (``model_ema.`` + param name with dots deleted, ema.py:16-20);
    import_ema must regenerate each flat key from the pytree path and apply
    the same layout conversions as the plain importer."""
    from frido_tpu.training.ema import import_ema

    ref, mod, params = ported_unet
    delta = 0.125
    # checkpoint-style dicts: shifted values under flat EMA names vs the
    # same shifted values under normal (dotted) keys
    sd_ema, sd_plain = {}, {}
    for k, v in ref.named_parameters():
        shifted = v.detach().numpy() + delta
        full = "diffusion_model." + k
        sd_ema["model_ema." + full.replace(".", "")] = shifted
        sd_plain["model.of." + full] = shifted  # prefix stripped below

    tree = {"diffusion_model": params["params"]}
    got = import_ema(tree, sd_ema)
    want = {"diffusion_model": import_state_dict(
        params["params"],
        {k[len("model.of.diffusion_model."):]: v
         for k, v in sd_plain.items()})}
    flat_got = jax.tree_util.tree_leaves_with_path(got)
    flat_want = dict(jax.tree_util.tree_leaves_with_path(want))
    n_checked = 0
    for path, leaf in flat_got:
        np.testing.assert_allclose(leaf, flat_want[path], atol=1e-6,
                                   err_msg=str(path))
        n_checked += 1
    assert n_checked == len(flat_want)
