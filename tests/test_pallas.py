"""Pallas kernel numerics vs. the jnp reference formulations.

Runs the TPU kernels through the Pallas interpreter on the CPU test
platform (SURVEY.md §4: unit tests per kernel — "VQ lookup vs. naive
argmin"); on real TPU the same code compiles via Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frido_tpu.ops.pallas.attention import (_reference_attention,
                                            flash_attention)
from frido_tpu.ops.pallas.vq_pallas import vq_argmin
from frido_tpu.ops.vq import vq_distances


@pytest.mark.parametrize("nq,nk,d", [
    (256, 256, 64),     # latent self-attention tile
    (1024, 77, 64),     # text cross-attention (ragged kv -> lane padding)
    (100, 100, 32),     # unaligned both axes
    (4096, 4096, 64),   # deepest latent grid, multiple kv blocks
])
def test_flash_attention_matches_reference(nq, nk, d):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (2, nq, d), jnp.float32)
    k = jax.random.normal(k2, (2, nk, d), jnp.float32)
    v = jax.random.normal(k3, (2, nk, d), jnp.float32)
    scale = d ** -0.5
    got = flash_attention(q, k, v, scale, block_q=128, block_k=256)
    want = _reference_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_attention_multihead_layout():
    # 4-D [b, h, n, d] path used by CrossAttention
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    q = jax.random.normal(k1, (2, 4, 64, 32), jnp.float32)
    kv = jax.random.normal(k2, (2, 4, 48, 32), jnp.float32)
    got = flash_attention(q, kv, kv, 32 ** -0.5, block_q=128, block_k=128)
    want = _reference_attention(q.reshape(8, 64, 32), kv.reshape(8, 48, 32),
                                kv.reshape(8, 48, 32), 32 ** -0.5)
    np.testing.assert_allclose(np.asarray(got).reshape(8, 64, 32),
                               np.asarray(want), atol=2e-5, rtol=2e-5)


def test_flash_attention_gradients_match_reference():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(k1, (1, 64, 16), jnp.float32)
    k = jax.random.normal(k2, (1, 40, 16), jnp.float32)
    v = jax.random.normal(k3, (1, 40, 16), jnp.float32)
    scale = 0.25

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, block_q=128,
                                       block_k=128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("n,k,d", [
    (512, 512, 4),       # tiny codebook, single block
    (1000, 300, 8),      # unaligned N and K (codebook padding masked)
    (4096, 8192, 4),     # f16 scale production shape, multiple k blocks
])
def test_vq_argmin_matches_naive(n, k, d):
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    z = jax.random.normal(k1, (n, d), jnp.float32)
    e = jax.random.normal(k2, (k, d), jnp.float32)
    got = vq_argmin(z, e, block_n=256, block_k=1024)
    want = jnp.argmin(vq_distances(z, e), axis=1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("shape,groups", [
    ((2, 16, 16, 64), 32),
    ((3, 8, 8, 96), 32),     # cpg=3, odd channel count per lane tile
])
@pytest.mark.parametrize("fuse_silu", [False, True])
def test_group_norm_pallas_matches_reference(shape, groups, fuse_silu):
    from frido_tpu.ops.pallas.norm_pallas import (_reference_gn,
                                                  group_norm_pallas)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    x = jax.random.normal(k1, shape, jnp.float32)
    scale = 1.0 + 0.1 * jax.random.normal(k2, (shape[-1],))
    bias = 0.1 * jax.random.normal(k3, (shape[-1],))
    got = group_norm_pallas(x, scale, bias, groups, 1e-6, fuse_silu)
    want = _reference_gn(x, scale, bias, groups, 1e-6, fuse_silu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_group_norm_opt_in_routing(monkeypatch):
    """Round 4: GroupNorm routes to XLA by default — the t2i headline
    measured 3.40 img/s with all Pallas kernels off vs 2.97 with the GN
    kernel dispatched (docs/r4_chip/), the same custom-call/layout-copy
    tax that retired the smalls attention kernel. FRIDO_GN_PALLAS=1 opts
    the kernel back in. Values must match either way."""
    from frido_tpu.ops.norm import group_norm

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
    x = jax.random.normal(k1, (2, 32, 32, 64), jnp.float32)  # hw >= 256
    scale = 1.0 + 0.1 * jax.random.normal(k2, (64,))
    bias = 0.1 * jax.random.normal(k3, (64,))
    monkeypatch.delenv("FRIDO_GN_PALLAS", raising=False)
    want = group_norm(x, scale, bias, 32, 1e-6)
    monkeypatch.setenv("FRIDO_GN_PALLAS", "1")
    got = group_norm(x, scale, bias, 32, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_group_norm_pallas_gradients():
    from frido_tpu.ops.pallas.norm_pallas import (_reference_gn,
                                                  group_norm_pallas)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(6), 3)
    x = jax.random.normal(k1, (2, 8, 8, 64), jnp.float32)
    scale = 1.0 + 0.1 * jax.random.normal(k2, (64,))
    bias = 0.1 * jax.random.normal(k3, (64,))

    g1 = jax.grad(lambda a, s, b: jnp.sum(
        group_norm_pallas(a, s, b, 32, 1e-6, True) ** 2),
        argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(lambda a, s, b: jnp.sum(
        _reference_gn(a, s, b, 32, 1e-6, True) ** 2),
        argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_vq_argmin_tie_breaks_to_first_index():
    # duplicated codebook rows: argmin must pick the first (torch semantics,
    # quantize.py:279-284)
    e = jnp.concatenate([jnp.ones((4, 4)), jnp.ones((4, 4)),
                         jnp.zeros((4, 4))], axis=0)
    z = jnp.ones((16, 4))
    idx = vq_argmin(z, e, block_n=8, block_k=4)
    np.testing.assert_array_equal(np.asarray(idx), np.zeros(16, np.int32))


@pytest.mark.parametrize("bh,nq,nk,d", [
    (24, 256, 256, 32),   # flagship ds-2 self-attn (12 heads x CFG batch)
    (16, 64, 64, 32),     # ds-4 site
    (8, 16, 16, 32),      # ds-8 site (tiny)
    (6, 100, 100, 32),    # unaligned seq, bh not divisible by 8
    (8, 256, 77, 64),     # short cross-attn shape
    (8, 256, 256, 512),   # VQGAN 16x16 single-head: d dominates VMEM
])
def test_smalls_attention_matches_reference(bh, nq, nk, d):
    from frido_tpu.ops.pallas.attention import smalls_attention

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(k1, (bh, nq, d), jnp.float32)
    k = jax.random.normal(k2, (bh, nk, d), jnp.float32)
    v = jax.random.normal(k3, (bh, nk, d), jnp.float32)
    scale = d ** -0.5
    got = smalls_attention(q, k, v, scale)
    want = _reference_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_smalls_attention_opt_in_routing(monkeypatch):
    """Round 4: smalls attention routes to XLA by default (in-program
    profiling showed the custom calls + their boundary layout copies cost
    more than XLA's fused form at the production config); the kernel is
    opt-in via FRIDO_SMALLS_ATTN=1."""
    from frido_tpu.nn.transformer import _use_smalls

    # the flagship ds-2 self-attention site that the kernel used to take
    monkeypatch.delenv("FRIDO_SMALLS_ATTN", raising=False)
    assert not _use_smalls(256, 256, 32, 24 * 256 * 256)
    monkeypatch.setenv("FRIDO_SMALLS_ATTN", "1")
    assert _use_smalls(256, 256, 32, 24 * 256 * 256)
    # opted in, the original floors still hold
    assert not _use_smalls(16, 16, 32, 8 * 16 * 16)


def test_smalls_attention_multihead_layout_and_grads():
    from frido_tpu.ops.pallas.attention import smalls_attention

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(k1, (2, 4, 64, 32), jnp.float32)  # [B, H, S, d]
    k = jax.random.normal(k2, (2, 4, 64, 32), jnp.float32)
    v = jax.random.normal(k3, (2, 4, 64, 32), jnp.float32)
    scale = 32 ** -0.5
    got = smalls_attention(q, k, v, scale)
    want = _reference_attention(
        q.reshape(8, 64, 32), k.reshape(8, 64, 32),
        v.reshape(8, 64, 32), scale).reshape(2, 4, 64, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    def f(fn, a, b, c):
        return jnp.sum(fn(a, b, c, scale) ** 2)

    g1 = jax.grad(f, argnums=(1, 2, 3))(smalls_attention, q, k, v)
    g2 = jax.grad(f, argnums=(1, 2, 3))(
        lambda a, b, c, s: _reference_attention(
            a.reshape(8, 64, 32), b.reshape(8, 64, 32),
            c.reshape(8, 64, 32), s).reshape(2, 4, 64, 32), q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("shape,cout", [
    ((2, 16, 16, 64), 64),     # square UNet-like site
    ((2, 8, 8, 96), 32),       # Cout < Cin
    ((4, 4, 4, 128), 256),     # tiny spatial, bb covers batch
])
def test_conv3x3_pallas_matches_reference(shape, cout):
    from frido_tpu.ops.pallas.conv_pallas import (_reference_conv,
                                                  conv3x3_pallas,
                                                  fits_pallas_conv)

    assert fits_pallas_conv(shape, cout)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, shape, jnp.float32)
    w = jax.random.normal(k2, (3, 3, shape[-1], cout), jnp.float32) * 0.05
    b = jax.random.normal(k3, (cout,), jnp.float32)
    got = np.asarray(conv3x3_pallas(x, w, b))
    want = np.asarray(_reference_conv(x, w, b))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_conv3x3_pallas_gradients():
    from frido_tpu.ops.pallas.conv_pallas import (_reference_conv,
                                                  conv3x3_pallas)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (2, 8, 8, 32), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 32, 32), jnp.float32) * 0.05
    b = jax.random.normal(k3, (32,), jnp.float32)
    g_got = jax.grad(lambda *a: conv3x3_pallas(*a).sum(), argnums=(0, 1, 2))(
        x, w, b)
    g_want = jax.grad(lambda *a: _reference_conv(*a).sum(),
                      argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)


def test_conv_mode_pallas_on_conv2d(monkeypatch):
    """FRIDO_CONV_MODE=pallas routes eligible Conv2d sites through the
    kernel (interpret mode on CPU) and falls back on ineligible ones."""
    from frido_tpu.nn.layers import Conv2d

    monkeypatch.setenv("FRIDO_PALLAS", "interpret")
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    mod = Conv2d(features=32, kernel_size=3, padding=1)
    params = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)
    monkeypatch.setenv("FRIDO_CONV_MODE", "pallas")
    got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
    # strided / non-pad-1 convs fall back to the emitter unchanged
    mod2 = Conv2d(features=32, kernel_size=3, stride=2, padding=1)
    params2 = mod2.init(jax.random.PRNGKey(1), x)
    assert mod2.apply(params2, x).shape == (2, 4, 4, 32)


@pytest.mark.parametrize("spade", [False, True])
def test_conv3x3_fused_matches_reference(spade):
    """GroupNorm (-> SPADE) -> SiLU -> conv as ONE kernel is the same math
    as the chained reference ops (the ResBlock prologue,
    /root/reference/frido/modules/diffusionmodules/pyunet.py:178-186)."""
    from frido_tpu.ops.pallas.conv_pallas import (_reference_fused,
                                                  conv3x3_norm_silu_pallas,
                                                  fits_fused_conv)

    shape, cout, groups = (2, 8, 8, 64), 32, 32
    assert fits_fused_conv(shape, cout, spade)
    ks = jax.random.split(jax.random.PRNGKey(2), 7)
    x = jax.random.normal(ks[0], shape, jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, shape[-1], cout), jnp.float32) * 0.05
    b = jax.random.normal(ks[2], (cout,), jnp.float32)
    nscale = 1.0 + 0.1 * jax.random.normal(ks[3], (shape[-1],), jnp.float32)
    nbias = 0.1 * jax.random.normal(ks[4], (shape[-1],), jnp.float32)
    gamma = beta = None
    if spade:
        gamma = 0.2 * jax.random.normal(ks[5], shape, jnp.float32)
        beta = 0.2 * jax.random.normal(ks[6], shape, jnp.float32)
    got = np.asarray(conv3x3_norm_silu_pallas(
        x, w, b, nscale, nbias, groups, 1e-5, gamma=gamma, beta=beta))
    want = np.asarray(_reference_fused(x, w, b, nscale, nbias, gamma, beta,
                                       groups, 1e-5))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_conv3x3_fused_gradients():
    """The fused kernel's custom VJP (reference-chain bwd) matches
    differentiating the chained ops directly, for every operand."""
    from frido_tpu.ops.pallas.conv_pallas import (_reference_fused,
                                                  conv3x3_norm_silu_pallas)

    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    x = jax.random.normal(ks[0], (2, 4, 4, 32), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, 32, 32), jnp.float32) * 0.05
    b = jax.random.normal(ks[2], (32,), jnp.float32)
    nscale = 1.0 + 0.1 * jax.random.normal(ks[3], (32,), jnp.float32)
    nbias = 0.1 * jax.random.normal(ks[4], (32,), jnp.float32)
    g_got = jax.grad(
        lambda *a: conv3x3_norm_silu_pallas(*a, 32, 1e-5).sum(),
        argnums=(0, 1, 2, 3, 4))(x, w, b, nscale, nbias)
    g_want = jax.grad(
        lambda *a: _reference_fused(*a, None, None, 32, 1e-5).sum(),
        argnums=(0, 1, 2, 3, 4))(x, w, b, nscale, nbias)
    for a, r in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("use_spade", [False, True])
def test_conv_mode_pallas_fused_resblock(monkeypatch, use_spade):
    """FRIDO_CONV_MODE=pallas_fused is a pure lowering change: identical
    param tree and matching outputs on the real ResBlock, for plain and
    SPADE norms, with and without precomputed SPADE tables."""
    from frido_tpu.nn.pyunet import ResBlock

    monkeypatch.setenv("FRIDO_PALLAS", "interpret")
    monkeypatch.delenv("FRIDO_CONV_MODE", raising=False)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    emb = jnp.asarray(rng.randn(2, 128).astype(np.float32))
    cond = (jnp.asarray(rng.randn(2, 4, 4, 16).astype(np.float32))
            if use_spade else None)
    blk = ResBlock(channels=64, out_channels=32, use_spade=use_spade)
    params = blk.init(jax.random.PRNGKey(0), x, emb, cond)
    want = blk.apply(params, x, emb, cond)
    monkeypatch.setenv("FRIDO_CONV_MODE", "pallas_fused")
    params_fused = blk.init(jax.random.PRNGKey(0), x, emb, cond)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_fused))
    got = blk.apply(params, x, emb, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
    if use_spade:
        # precomputed-table sampling path (spade_pre) hits the fused kernel
        pre = blk.apply(params, cond, (8, 8), method=ResBlock.spade_tables)
        want_pre = blk.apply(params, x, emb, None, True, pre)
        monkeypatch.delenv("FRIDO_CONV_MODE")
        ref_pre = blk.apply(params, x, emb, None, True, pre)
        np.testing.assert_allclose(np.asarray(want_pre), np.asarray(ref_pre),
                                   atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("use_spade", [False, True])
def test_conv_mode_auto_fused_routing(monkeypatch, use_spade):
    """ADVICE r3: FRIDO_CONV_MODE=auto must select the fused prologue
    kernel at sites listed in _AUTO_FUSED_TABLE (and only there), with
    values matching the default lowering on the real ResBlock."""
    from frido_tpu.nn import layers
    from frido_tpu.nn.pyunet import ResBlock

    monkeypatch.setenv("FRIDO_PALLAS", "interpret")
    # routing: listed + batch>=64 + spade => fused; every other gate => not
    monkeypatch.setattr(layers, "_AUTO_FUSED_TABLE", {(8, 64, 32)})
    assert layers._auto_fused((128, 8, 8, 64), 32, True)
    assert not layers._auto_fused((128, 8, 8, 64), 32, False)  # spade gate
    assert not layers._auto_fused((8, 8, 8, 64), 32, True)     # batch gate
    assert not layers._auto_fused((128, 8, 8, 64), 64, True)   # unlisted
    assert not layers._auto_fused((128, 8, 6, 64), 32, True)   # h != w

    # numerics through the real ResBlock at a listed site (batch/spade
    # gates dropped so the CPU-sized batch routes through the fused kernel)
    monkeypatch.setattr(
        layers, "_auto_fused",
        lambda shape, cout, spade: (shape[1], shape[3], cout) in {(8, 64, 32)})
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    emb = jnp.asarray(rng.randn(2, 128).astype(np.float32))
    cond = (jnp.asarray(rng.randn(2, 4, 4, 16).astype(np.float32))
            if use_spade else None)
    blk = ResBlock(channels=64, out_channels=32, use_spade=use_spade)
    monkeypatch.delenv("FRIDO_CONV_MODE", raising=False)
    params = blk.init(jax.random.PRNGKey(0), x, emb, cond)
    want = blk.apply(params, x, emb, cond)
    monkeypatch.setenv("FRIDO_CONV_MODE", "auto")
    got = blk.apply(params, x, emb, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
