"""Tiled (fold/unfold) patched inference (frido_tpu.ops.tiling +
FridoDiffusion.split_input_params)."""

import pytest

# <10-min tier: tools/pytest_cpu.sh -m fast (VERDICT r2 #7)
pytestmark = pytest.mark.fast

import jax
import jax.numpy as jnp
import numpy as np

from frido_tpu.ops.tiling import tile_positions, tiled_apply


def test_tile_positions_cover_edge():
    assert tile_positions(8, 8, 4) == [0]
    assert tile_positions(16, 8, 4) == [0, 4, 8]
    assert tile_positions(18, 8, 4) == [0, 4, 8, 10]  # clamped last tile
    assert tile_positions(4, 8, 4) == [0]              # ks > size


def test_tiled_identity_blend_is_exact():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    out = tiled_apply(lambda t: t, x, ks=(8, 8), stride=(4, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_tiled_scale_output():
    x = jnp.ones((1, 8, 8, 2))

    def up2(t):
        return jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2) * 3.0

    out = tiled_apply(up2, x, ks=(4, 4), stride=(2, 2), scale=2)
    assert out.shape == (1, 16, 16, 2)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-6)


def test_split_input_params_on_model():
    from __graft_entry__ import (_TINY_COND, _TINY_FIRST, _TINY_MODEL,
                                 _TINY_UNET)
    from frido_tpu.models.frido import FridoDiffusion

    model = FridoDiffusion(
        first_stage_config=_TINY_FIRST, cond_stage_config=_TINY_COND,
        unet_config=_TINY_UNET,
        **{**_TINY_MODEL,
           "split_input_params": {"ks": (16, 16), "stride": (8, 8)}})
    params = model.init_params(jax.random.PRNGKey(0), context_len=12)
    tokens = jnp.zeros((1, 12), jnp.int32)
    ctx = model.get_learned_conditioning(params, tokens)

    # latent 2x the training size -> tiled UNet + tiled decode still run
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 8))
    t = jnp.zeros((1,), jnp.int32)
    eps = model.apply_model(params, z, t, ctx, 0)
    assert eps.shape[0] == 1 and eps.shape[1] == 32 and eps.shape[2] == 32
    img = model.decode_first_stage(params, z)
    vqf = 2  # tiny ddconfig has ch_mult [1, 1]
    assert img.shape[1] == 32 * vqf and img.shape[2] == 32 * vqf
    assert np.isfinite(np.asarray(img)).all()

    # at the training size the non-tiled path runs (shape sanity)
    z0 = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 8))
    eps0 = model.apply_model(params, z0, t, ctx, 0)
    assert eps0.shape[1] == 16


def test_chunked_decode_matches_full():
    """decode_first_stage(chunk=n) is numerically the plain decode — it only
    bounds peak HBM via lax.map over batch chunks."""
    from __graft_entry__ import _TINY_COND, _TINY_FIRST, _TINY_MODEL, _TINY_UNET
    from frido_tpu.models.frido import FridoDiffusion

    model = FridoDiffusion(
        first_stage_config=_TINY_FIRST, cond_stage_config=_TINY_COND,
        unet_config=_TINY_UNET, **_TINY_MODEL)
    params = model.init_params(jax.random.PRNGKey(0), context_len=12)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 8))
    full = model.decode_first_stage(params, z)
    chunked = model.decode_first_stage(params, z, chunk=2)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-5, rtol=1e-5)
    # non-dividing / oversize chunk falls back to the plain path
    same = model.decode_first_stage(params, z, chunk=8)
    np.testing.assert_allclose(np.asarray(same), np.asarray(full), atol=0)
