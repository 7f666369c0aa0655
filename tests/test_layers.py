"""Primitive-layer golden tests vs torch functional ops.

These pin down the exact conversion semantics the checkpoint importer relies
on (conv weight layouts, groupnorm eps conventions, transposed-conv padding,
nearest/avg-pool resampling).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from frido_tpu.io.torch_import import convert_leaf, flax_path_to_torch_key  # noqa: E402
from frido_tpu.nn.layers import (  # noqa: E402
    Conv1d,
    Conv2d,
    ConvTranspose2d,
    Dense,
    GroupNorm,
    LayerNorm,
)
from frido_tpu.ops.image import (  # noqa: E402
    avg_pool_2x,
    interpolate_nearest,
    interpolate_nearest_2x,
    pad_nhwc,
)

# <10-min tier: tools/pytest_cpu.sh -m fast (VERDICT r2 #7)
pytestmark = pytest.mark.fast

RNG = np.random.RandomState(0)


def t2j_nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(x_nchw.transpose(0, 2, 3, 1))


def j2t_nchw(y: jnp.ndarray) -> np.ndarray:
    return np.asarray(y).transpose(0, 3, 1, 2)


def test_conv2d_matches_torch():
    x = RNG.randn(2, 5, 9, 9).astype(np.float32)
    w = RNG.randn(7, 5, 3, 3).astype(np.float32)
    b = RNG.randn(7).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                   stride=1, padding=1).numpy()
    params = {"params": {"kernel": convert_leaf(w, "kernel"), "bias": b}}
    y = Conv2d(features=7, kernel_size=3, padding=1).apply(params, t2j_nhwc(x))
    np.testing.assert_allclose(j2t_nchw(y), ref, atol=2e-5)


def test_conv2d_stride2_asymmetric_pad():
    # taming Downsample: F.pad(x, (0,1,0,1)) then conv stride 2 pad 0
    x = RNG.randn(1, 4, 8, 8).astype(np.float32)
    w = RNG.randn(4, 4, 3, 3).astype(np.float32)
    b = np.zeros(4, np.float32)
    ref = F.conv2d(F.pad(torch.from_numpy(x), (0, 1, 0, 1)), torch.from_numpy(w),
                   torch.from_numpy(b), stride=2).numpy()
    params = {"params": {"kernel": convert_leaf(w, "kernel"), "bias": b}}
    xj = pad_nhwc(t2j_nhwc(x), (0, 1), (0, 1))
    y = Conv2d(features=4, kernel_size=3, stride=2, padding=0).apply(params, xj)
    np.testing.assert_allclose(j2t_nchw(y), ref, atol=2e-5)


def test_conv_transpose2d_matches_torch():
    # msvqgan.upsample: ConvTranspose2d(C, C, 4, stride=2, padding=1)
    x = RNG.randn(2, 4, 6, 6).astype(np.float32)
    w = RNG.randn(4, 4, 4, 4).astype(np.float32)  # [Cin, Cout, kH, kW]
    b = RNG.randn(4).astype(np.float32)
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                             torch.from_numpy(b), stride=2, padding=1).numpy()
    params = {"params": {"kernel_t": convert_leaf(w, "kernel_t"), "bias": b}}
    y = ConvTranspose2d(features=4, kernel_size=4, stride=2, padding=1).apply(
        params, t2j_nhwc(x))
    assert y.shape == (2, 12, 12, 4)
    np.testing.assert_allclose(j2t_nchw(y), ref, atol=2e-5)


def test_conv1d_matches_torch():
    x = RNG.randn(2, 6, 10).astype(np.float32)  # N, C, T
    w = RNG.randn(18, 6, 1).astype(np.float32)
    b = RNG.randn(18).astype(np.float32)
    ref = F.conv1d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    params = {"params": {"kernel": convert_leaf(w, "kernel"), "bias": b}}
    y = Conv1d(features=18, kernel_size=1).apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=2e-5)


def test_dense_matches_torch():
    x = RNG.randn(3, 11).astype(np.float32)
    w = RNG.randn(7, 11).astype(np.float32)
    b = RNG.randn(7).astype(np.float32)
    ref = F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    params = {"params": {"kernel": convert_leaf(w, "kernel"), "bias": b}}
    y = Dense(features=7).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-5)


@pytest.mark.parametrize("eps", [1e-6, 1e-5])
def test_groupnorm_matches_torch(eps):
    x = RNG.randn(2, 64, 4, 4).astype(np.float32)
    w = RNG.randn(64).astype(np.float32)
    b = RNG.randn(64).astype(np.float32)
    ref = F.group_norm(torch.from_numpy(x), 32, torch.from_numpy(w),
                       torch.from_numpy(b), eps=eps).numpy()
    params = {"params": {"scale": w, "bias": b}}
    y = GroupNorm(num_groups=32, eps=eps).apply(params, t2j_nhwc(x))
    np.testing.assert_allclose(j2t_nchw(y), ref, atol=2e-5)


def test_groupnorm_native_stats_equivalence(monkeypatch):
    """FRIDO_GN_STATS_NATIVE=1 reads bf16 activations natively for the
    fp32 stats/apply (saves the materialized fp32 copy the round-5 train
    trace found at the 256^2 encoder sites) — the math is fp32 either way
    (bf16->f32 converts are exact), so both paths must agree bit-for-bit
    on bf16 inputs and the fp32 path must be untouched."""
    from frido_tpu.ops.norm import group_norm_jnp

    x32 = RNG.randn(2, 8, 8, 64).astype(np.float32)
    w = RNG.randn(64).astype(np.float32)
    b = RNG.randn(64).astype(np.float32)
    xb = jnp.asarray(x32).astype(jnp.bfloat16)

    monkeypatch.setenv("FRIDO_GN_STATS_NATIVE", "0")
    old_b = np.asarray(group_norm_jnp(
        xb, jnp.asarray(w), jnp.asarray(b)).astype(jnp.float32))
    old_f = np.asarray(group_norm_jnp(
        jnp.asarray(x32), jnp.asarray(w), jnp.asarray(b)))
    monkeypatch.setenv("FRIDO_GN_STATS_NATIVE", "1")
    new_b = np.asarray(group_norm_jnp(
        xb, jnp.asarray(w), jnp.asarray(b)).astype(jnp.float32))
    new_f = np.asarray(group_norm_jnp(
        jnp.asarray(x32), jnp.asarray(w), jnp.asarray(b)))

    assert (old_b == new_b).all()        # bf16 path: exact agreement
    assert (old_f == new_f).all()        # fp32 path: flag is a no-op


def test_layernorm_matches_torch():
    x = RNG.randn(2, 5, 16).astype(np.float32)
    w = RNG.randn(16).astype(np.float32)
    b = RNG.randn(16).astype(np.float32)
    ref = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(w),
                       torch.from_numpy(b)).numpy()
    params = {"params": {"scale": w, "bias": b}}
    y = LayerNorm().apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-5)


def test_nearest_2x_matches_torch():
    x = RNG.randn(1, 3, 5, 5).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
    y = interpolate_nearest_2x(t2j_nhwc(x))
    np.testing.assert_array_equal(j2t_nchw(y), ref)


@pytest.mark.parametrize("size", [(8, 8), (16, 16), (7, 5)])
def test_nearest_resize_matches_torch(size):
    x = RNG.randn(1, 3, 4, 6).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=size, mode="nearest").numpy()
    y = interpolate_nearest(t2j_nhwc(x), size)
    np.testing.assert_array_equal(j2t_nchw(y), ref)


def test_avg_pool_2x_matches_torch():
    x = RNG.randn(2, 3, 8, 8).astype(np.float32)
    ref = F.avg_pool2d(torch.from_numpy(x), 2, 2).numpy()
    y = avg_pool_2x(t2j_nhwc(x))
    np.testing.assert_allclose(j2t_nchw(y), ref, atol=1e-6)


def test_path_to_torch_key():
    assert flax_path_to_torch_key(("conv_in", "kernel")) == "conv_in.weight"
    assert (
        flax_path_to_torch_key(("down__0__block__1", "norm1", "scale"))
        == "down.0.block.1.norm1.weight"
    )
    assert (
        flax_path_to_torch_key(("mid", "block_1", "conv1", "bias"))
        == "mid.block_1.conv1.bias"
    )
    assert flax_path_to_torch_key(("token_emb", "embedding")) == "token_emb.weight"


@pytest.mark.parametrize("mode", ["im2col", "shift9", "pad128", "pad256"])
def test_conv_mode_equivalence(mode, monkeypatch):
    """FRIDO_CONV_MODE reformulations are the same math as the conv
    emitter (the bench A/B flag must not change numerics), including
    asymmetric padding and pass-through of non-3x3/strided cases."""
    rng = np.random.RandomState(3)
    mod = Conv2d(features=24, kernel_size=3, padding=1)
    x = jnp.asarray(rng.randn(2, 8, 8, 12).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)
    monkeypatch.setenv("FRIDO_CONV_MODE", mode)
    got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # asymmetric VQGAN downsample padding ((0,1),(0,1)) hits the same path
    mod2 = Conv2d(features=24, kernel_size=3, padding=((0, 1), (0, 1)))
    params2 = mod2.init(jax.random.PRNGKey(1), x)
    monkeypatch.delenv("FRIDO_CONV_MODE")
    want2 = mod2.apply(params2, x)
    monkeypatch.setenv("FRIDO_CONV_MODE", mode)
    got2 = mod2.apply(params2, x)
    assert got2.shape == want2.shape
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               atol=1e-5, rtol=1e-5)
    # strided conv falls back to the emitter path (shape sanity)
    mod3 = Conv2d(features=24, kernel_size=3, stride=2, padding=1)
    params3 = mod3.init(jax.random.PRNGKey(2), x)
    assert mod3.apply(params3, x).shape == (2, 4, 4, 24)


def test_conv_auto_mode(monkeypatch):
    """FRIDO_CONV_MODE=auto routes measured sites through the per-site
    table (frido_tpu.nn.layers._AUTO_TABLE) and leaves everything else on
    the conv emitter — same values either way."""
    from frido_tpu.nn.layers import _auto_conv_mode

    # table routing: a pad256 site, a pallas site (gated on batch), a
    # conv-wins/flip-flop site, and an unmeasured fallback
    assert _auto_conv_mode((128, 4, 4, 960), 960) == "pad256"
    assert _auto_conv_mode((128, 16, 16, 384), 384) == "pallas"
    assert _auto_conv_mode((8, 16, 16, 384), 384) == "conv"  # tiny batch
    assert _auto_conv_mode((128, 32, 32, 576), 192) == "conv"
    assert _auto_conv_mode((128, 8, 8, 576), 576) == "conv"  # flip-flop site
    assert _auto_conv_mode((128, 5, 7, 960), 960) == "conv"  # h != w
    assert _auto_conv_mode((2, 8, 8, 12), 24) == "conv"

    # numerics through a real table hit (4^2 x 960 -> 960 => pad256)
    rng = np.random.RandomState(5)
    mod = Conv2d(features=960, kernel_size=3, padding=1)
    x = jnp.asarray(rng.randn(1, 4, 4, 960).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)
    monkeypatch.setenv("FRIDO_CONV_MODE", "auto")
    got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_conv_smalls_mode(monkeypatch):
    """FRIDO_CONV_SMALLS re-lowers small-spatial convs (<= the HW gate)
    as dots — same values as the conv emitter; larger spatials and
    strided sites are untouched."""
    rng = np.random.RandomState(7)

    # 3x3 at 8^2: routed (shift9); at 16^2: untouched
    for hw, label in [(8, "routed"), (16, "untouched")]:
        mod = Conv2d(features=24, kernel_size=3, padding=1)
        x = jnp.asarray(rng.randn(2, hw, hw, 12).astype(np.float32))
        params = mod.init(jax.random.PRNGKey(0), x)
        want = mod.apply(params, x)
        monkeypatch.setenv("FRIDO_CONV_SMALLS", "shift9")
        got = mod.apply(params, x)
        monkeypatch.delenv("FRIDO_CONV_SMALLS")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5, err_msg=label)

    # 1x1 skip at 4^2: reshaped-matmul path (any FRIDO_CONV_SMALLS value)
    mod1 = Conv2d(features=24, kernel_size=1)
    x1 = jnp.asarray(rng.randn(2, 4, 4, 12).astype(np.float32))
    params1 = mod1.init(jax.random.PRNGKey(1), x1)
    want1 = mod1.apply(params1, x1)
    monkeypatch.setenv("FRIDO_CONV_SMALLS", "shift9")
    got1 = mod1.apply(params1, x1)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1),
                               atol=1e-5, rtol=1e-5)
    # strided 3x3 at small spatial falls through to the emitter
    mod2 = Conv2d(features=24, kernel_size=3, stride=2, padding=1)
    params2 = mod2.init(jax.random.PRNGKey(2), x1)
    assert mod2.apply(params2, x1).shape == (2, 2, 2, 24)
