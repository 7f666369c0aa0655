"""ActNorm discriminator variant (``taming/modules/util.py:10-93``).

Golden: our ActNorm vs the reference torch module — both the
data-dependent initialization (torch inits from the first training batch;
flax from the ``init`` batch) and the forward from imported torch params.
Plus a GAN-step smoke with ``use_actnorm: true``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.reference_stub import install_reference

torch = pytest.importorskip("torch")

from frido_tpu.io.torch_import import import_state_dict  # noqa: E402
from frido_tpu.losses.discriminator import ActNorm, NLayerDiscriminator  # noqa: E402

# <10-min tier: tools/pytest_cpu.sh -m fast (VERDICT r2 #7)
pytestmark = pytest.mark.fast


@requires_reference
def test_actnorm_init_and_forward_parity(reference_path):
    install_reference()
    from taming.modules.util import ActNorm as RefActNorm

    x = np.random.RandomState(0).randn(4, 8, 8, 6).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    ref = RefActNorm(6)
    ref.train()
    with torch.no_grad():
        out_ref = ref(xt)  # first training forward initializes loc/scale

    ours = ActNorm()
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # (a) the data-dependent init itself matches torch's
    np.testing.assert_allclose(
        np.asarray(params["params"]["loc"]),
        ref.loc.detach().numpy().ravel(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(params["params"]["scale_v"]),
        ref.scale.detach().numpy().ravel(), rtol=1e-4)
    out = ours.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), out_ref.numpy(), atol=1e-4)

    # (b) importing torch's params reproduces torch's forward on new data
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ported = {"params": import_state_dict(params["params"], sd)}
    y = np.random.RandomState(1).randn(2, 4, 4, 6).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(y.transpose(0, 3, 1, 2))).numpy()
    got = ours.apply(ported, jnp.asarray(y))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


@requires_reference
def test_nlayer_discriminator_actnorm_parity(reference_path):
    install_reference()
    from taming.modules.discriminator.model import (
        NLayerDiscriminator as RefDisc,
    )

    torch.manual_seed(0)
    ref = RefDisc(input_nc=3, ndf=16, n_layers=2, use_actnorm=True)
    ref.train()
    x = np.random.RandomState(2).randn(4, 32, 32, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        out_ref = ref(xt)  # initializes every ActNorm from this batch

    ours = NLayerDiscriminator(input_nc=3, ndf=16, n_layers=2,
                               use_actnorm=True)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {f"discriminator.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    ported = {"params": import_state_dict(
        params["params"], sd, prefix="discriminator.")}
    got = ours.apply(ported, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), out_ref.numpy(), atol=2e-4)


def test_actnorm_constant_init_batch_falls_back_to_identity():
    """A zero/constant init batch has std 0; 1/std would start the
    discriminator at a ~1e6 per-layer gain. That case must init to the
    identity transform instead (real data-dependent init requires
    ``create_vqgan_train_state(sample_images=...)``)."""
    ours = ActNorm()
    params = ours.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 6)))
    np.testing.assert_array_equal(
        np.asarray(params["params"]["loc"]), np.zeros(6))
    np.testing.assert_array_equal(
        np.asarray(params["params"]["scale_v"]), np.ones(6))
    y = np.random.RandomState(3).randn(2, 8, 8, 6).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ours.apply(params, jnp.asarray(y))), y, atol=1e-6)


def test_gan_init_with_sample_images_uses_data_stats():
    """init_params(sample_images=...) routes real images into the
    data-dependent init, so every ActNorm's scale stays bounded (the
    zeros-init path used to produce 1e6)."""
    from frido_tpu.losses.vqperceptual import VQLPIPSWithDiscriminator

    loss = VQLPIPSWithDiscriminator(
        disc_start=0, disc_in_channels=3, disc_num_layers=2, disc_ndf=16,
        perceptual_weight=0.0, use_actnorm=True)
    real = np.random.RandomState(0).randn(4, 32, 32, 3).astype(np.float32)
    params = loss.init_params(jax.random.PRNGKey(0),
                              image_shape=(4, 32, 32, 3),
                              sample_images=real)
    scales = [np.asarray(v["scale_v"])
              for k, v in params["params"]["discriminator"].items()
              if isinstance(v, dict) and "scale_v" in v]
    assert scales, "expected ActNorm layers in the discriminator"
    for s in scales:
        assert np.all(np.isfinite(s)) and np.max(np.abs(s)) < 1e3, s


def test_gan_step_with_actnorm_runs():
    from frido_tpu.losses.vqperceptual import VQLPIPSWithDiscriminator

    loss = VQLPIPSWithDiscriminator(
        disc_start=0, disc_in_channels=3, disc_num_layers=2, disc_ndf=16,
        perceptual_weight=0.0, use_actnorm=True)
    params = loss.init_params(jax.random.PRNGKey(0),
                              image_shape=(2, 32, 32, 3))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                    jnp.float32)
    logits = loss.module.apply(params, x, method="disc")
    assert np.all(np.isfinite(np.asarray(logits)))
