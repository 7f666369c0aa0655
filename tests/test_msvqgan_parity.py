"""Golden parity: frido_tpu MS-VQGAN vs the torch reference, weight-for-weight.

Builds the reference VQModelInterface with random init, ports its state_dict
through the checkpoint importer, and compares every calling convention.
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
from frido_tpu.models.msvqgan import msvqgan_from_config  # noqa: E402
from frido_tpu.nn.quantize import VectorQuantizer  # noqa: E402
from frido_tpu.nn.vqgan import Decoder, Encoder, MSEncoder  # noqa: E402

ATOL = 2e-4


def t2j(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def j2t(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


@requires_reference
def test_msencoder_parity(reference_path):
    install_reference()
    from taming.modules.diffusionmodules.model import MSEncoder as RefMSEncoder

    torch.manual_seed(0)
    ref = RefMSEncoder(**SMALL_EDCONFIG).eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref_out = ref(x)

    mod = MSEncoder(
        ch=32, ch_mult=(1, 1, 2), num_res_blocks=1, attn_resolutions=(16,),
        resolution=64, z_channels=(4, 4), double_z=False, multiscale=2,
    )
    params = mod.init(jax.random.PRNGKey(0), t2j(x))
    ported = import_state_dict(params["params"], state_dict_numpy(ref))
    outs = mod.apply({"params": ported}, t2j(x))
    assert len(outs) == len(ref_out)
    for ours, theirs in zip(outs, ref_out):
        np.testing.assert_allclose(j2t(ours), theirs.numpy(), atol=ATOL)


@requires_reference
def test_decoder_parity(reference_path):
    install_reference()
    from taming.modules.diffusionmodules.model import Decoder as RefDecoder

    torch.manual_seed(1)
    ref = RefDecoder(**SMALL_DDCONFIG).eval()
    z = torch.randn(2, 8, 16, 16)
    with torch.no_grad():
        ref_out = ref(z)

    mod = Decoder(
        ch=32, ch_mult=(1, 1, 2), num_res_blocks=1, attn_resolutions=(16,),
        resolution=64, z_channels=8, out_ch=3,
    )
    params = mod.init(jax.random.PRNGKey(0), t2j(z))
    ported = import_state_dict(params["params"], state_dict_numpy(ref))
    ours = mod.apply({"params": ported}, t2j(z))
    np.testing.assert_allclose(j2t(ours), ref_out.numpy(), atol=ATOL)


@requires_reference
def test_encoder_parity(reference_path):
    install_reference()
    from taming.modules.diffusionmodules.model import Encoder as RefEncoder

    cfg = dict(SMALL_DDCONFIG)
    torch.manual_seed(2)
    ref = RefEncoder(**cfg).eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        ref_out = ref(x)

    mod = Encoder(
        ch=32, ch_mult=(1, 1, 2), num_res_blocks=1, attn_resolutions=(16,),
        resolution=64, z_channels=8, double_z=False,
    )
    params = mod.init(jax.random.PRNGKey(0), t2j(x))
    ported = import_state_dict(params["params"], state_dict_numpy(ref))
    ours = mod.apply({"params": ported}, t2j(x))
    np.testing.assert_allclose(j2t(ours), ref_out.numpy(), atol=ATOL)


@requires_reference
def test_vector_quantizer_parity(reference_path):
    install_reference()
    from taming.modules.vqvae.quantize import VectorQuantizer2

    torch.manual_seed(3)
    ref = VectorQuantizer2(64, 4, beta=0.25).eval()
    z = torch.randn(2, 4, 8, 8)
    with torch.no_grad():
        zq_ref, loss_ref, (_, _, idx_ref) = ref(z)

    mod = VectorQuantizer(n_e=64, e_dim=4, beta=0.25)
    params = mod.init(jax.random.PRNGKey(0), t2j(z))
    ported = import_state_dict(params["params"], state_dict_numpy(ref))
    zq, loss, idx = mod.apply({"params": ported}, t2j(z))
    np.testing.assert_allclose(j2t(zq), zq_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(idx).reshape(-1), idx_ref.numpy().reshape(-1))


@pytest.fixture(scope="module")
def ported_msvqgan(reference_path):
    install_reference()
    from taming.models.msvqgan import VQModelInterface as RefInterface

    torch.manual_seed(4)
    ref = RefInterface(
        embed_dim=[4, 4], n_embed=[64, 64],
        edconfig=SMALL_EDCONFIG, ddconfig=SMALL_DDCONFIG,
        lossconfig={"target": "taming.modules.losses.DummyLoss"},
    ).eval()
    # the reference ctor builds an LPIPS-free DummyLoss; drop `loss.` keys
    sd = {k: v for k, v in state_dict_numpy(ref).items()
          if not k.startswith("loss.")}

    mod = msvqgan_from_config(dict(
        edconfig=SMALL_EDCONFIG, ddconfig=SMALL_DDCONFIG,
        n_embed=[64, 64], embed_dim=[4, 4],
    ), name=None)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = mod.init(jax.random.PRNGKey(0), x0)
    ported = import_state_dict(params["params"], sd)
    return ref, mod, {"params": ported}


@requires_reference
def test_interface_encode_parity(ported_msvqgan):
    ref, mod, params = ported_msvqgan
    torch.manual_seed(5)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        h_ref = ref.encode(x)
    h = mod.apply(params, t2j(x), method="encode_interface")
    np.testing.assert_allclose(j2t(h), h_ref.numpy(), atol=ATOL)


@requires_reference
def test_interface_decode_parity(ported_msvqgan):
    ref, mod, params = ported_msvqgan
    torch.manual_seed(6)
    h = torch.randn(2, 8, 32, 32)
    with torch.no_grad():
        dec_ref = ref.decode(h)
    dec = mod.apply(params, t2j(h), method="decode_interface")
    np.testing.assert_allclose(j2t(dec), dec_ref.numpy(), atol=ATOL)


@requires_reference
def test_interface_roundtrip_parity(ported_msvqgan):
    """encode -> decode end to end, the BASELINE.json config-1 artifact."""
    ref, mod, params = ported_msvqgan
    torch.manual_seed(7)
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        rec_ref = ref.decode(ref.encode(x))
    h = mod.apply(params, t2j(x), method="encode_interface")
    rec = mod.apply(params, h, method="decode_interface")
    np.testing.assert_allclose(j2t(rec), rec_ref.numpy(), atol=5e-4)


@requires_reference
def test_training_encode_parity(ported_msvqgan):
    """MSFPNVQModel.encode semantics (quantized, [fine|coarse] stack)."""
    ref, mod, params = ported_msvqgan
    torch.manual_seed(8)
    x = torch.randn(1, 3, 64, 64)
    from taming.models.msvqgan import MSFPNVQModel as RefTrain

    # rebuild a training-convention ref model sharing the same weights
    ref_train = RefTrain(
        embed_dim=[4, 4], n_embed=[64, 64],
        edconfig=SMALL_EDCONFIG, ddconfig=SMALL_DDCONFIG,
        lossconfig={"target": "taming.modules.losses.DummyLoss"},
    ).eval()
    ref_train.load_state_dict(ref.state_dict(), strict=False)
    with torch.no_grad():
        q_ref, loss_ref, _ = ref_train.encode(x)
        dec_ref = ref_train.decode(q_ref)
    q, loss, _ = mod.apply(params, t2j(x), method="encode")
    np.testing.assert_allclose(j2t(q), q_ref.numpy(), atol=ATOL)
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-4)
    dec = mod.apply(params, q, method="decode")
    np.testing.assert_allclose(j2t(dec), dec_ref.numpy(), atol=5e-4)
