"""Golden parity of the JAX FID-InceptionV3 vs a hand-ported torch forward.

Pins the graph (pytorch-fid's modified pool3 variant — nopad average pools,
Mixed_7c max-pool branch, 1008-class fc) with random weights, so real FID
weights, once mounted via FRIDO_TPU_INCEPTION, produce numbers comparable to
torch-fidelity (``/root/reference/README.md:334-344``).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from frido_tpu.eval import inception  # noqa: E402
from frido_tpu.eval.fid import fid_from_features  # noqa: E402
from tests import torch_fid_inception as ref  # noqa: E402


@pytest.fixture(scope="module")
def pair():
    sd_np = inception.random_state_dict(seed=0)
    params = inception.import_torch_state_dict(sd_np)
    sd_t = {k: torch.from_numpy(v.copy()) for k, v in sd_np.items()}
    return params, sd_t


def _rand_images(seed, n=2, size=299):
    rng = np.random.RandomState(seed)
    return rng.rand(n, size, size, 3).astype(np.float32)


def test_feature_parity(pair):
    params, sd_t = pair
    imgs = _rand_images(1)
    x = imgs * 2.0 - 1.0
    ours = np.asarray(inception.features(params, jnp.asarray(x)))
    theirs = ref.features(
        sd_t, torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert ours.shape == (2, 2048)
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


def test_logits_parity(pair):
    params, sd_t = pair
    imgs = _rand_images(2)
    x = imgs * 2.0 - 1.0
    ours = np.asarray(inception.logits(params, jnp.asarray(x)))
    theirs = ref.logits(
        sd_t, torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert ours.shape == (2, inception.NUM_CLASSES_FID)
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


def test_logits_from_features_matches_tower(pair):
    """The host-side fc head over cached pool3 features (used by
    scripts/eval_fid.py --inception_score to avoid a second tower pass)
    must equal the full want_logits tower output. Passes the params
    explicitly — the env-loaded path needs the real FRIDO_TPU_INCEPTION
    asset, absent on this box."""
    import frido_tpu.eval.fid as fid_mod

    params, _ = pair
    imgs = _rand_images(7, n=3)
    feats = np.asarray(
        inception.features(params, jnp.asarray(imgs * 2.0 - 1.0)))
    full = np.asarray(inception.logits(params, jnp.asarray(imgs * 2.0 - 1.0)))
    np.testing.assert_allclose(
        fid_mod.logits_from_features(feats, params=params), full, atol=1e-4)


def test_preprocess_matches_torch_interpolate(pair):
    """Resize must match pytorch-fid's F.interpolate(bilinear,
    align_corners=False) — half-pixel centers, no antialias."""
    imgs = _rand_images(3, n=1, size=64)
    ours = np.asarray(inception.preprocess(jnp.asarray(imgs)))
    theirs = torch.nn.functional.interpolate(
        torch.from_numpy(imgs.transpose(0, 3, 1, 2)), size=(299, 299),
        mode="bilinear", align_corners=False).numpy()
    theirs = theirs.transpose(0, 2, 3, 1) * 2.0 - 1.0
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_avg_pool_nopad_semantics():
    """count_include_pad=False: border windows divide by valid tap count."""
    x = np.ones((1, 4, 4, 1), np.float32)
    out = np.asarray(inception._avg_pool_3x3_nopad(jnp.asarray(x)))
    # averaging ones must return ones everywhere ONLY with nopad counts
    np.testing.assert_allclose(out, np.ones_like(x), atol=1e-6)
    inc = torch.nn.functional.avg_pool2d(
        torch.ones(1, 1, 4, 4), 3, stride=1, padding=1,
        count_include_pad=True).numpy()
    assert inc.min() < 0.5  # sanity: include_pad would NOT be ones


def test_run_batched_pads_tail(pair):
    params, _ = pair
    imgs = _rand_images(4, n=3, size=32)
    feats = inception.run_batched(params, imgs, batch=2)
    assert feats.shape == (3, 2048)
    single = inception.run_batched(params, imgs[2:3], batch=2)
    np.testing.assert_allclose(feats[2], single[0], atol=1e-4)


def test_fid_pipeline_end_to_end(pair):
    """images -> features -> Frechet distance runs end to end: FID of a set
    against itself is 0 and against a shifted set is finite and >= 0.

    (Discriminative power can't be asserted with random weights — a deep
    random relu net contracts input differences to ~1e-4 at pool3, so the
    magnitude check lives with the real weights; the graph itself is pinned
    by the parity tests above.)"""
    params, _ = pair
    rng = np.random.RandomState(0)
    a = rng.rand(8, 32, 32, 3).astype(np.float32)
    feats_a = inception.run_batched(params, a, batch=4)
    assert fid_from_features(feats_a, feats_a) == pytest.approx(0.0, abs=1e-3)
    b = np.clip(a + 0.3, 0, 1)
    feats_b = inception.run_batched(params, b, batch=4)
    fid_ab = fid_from_features(feats_a, feats_b)
    assert np.isfinite(fid_ab) and fid_ab >= -1e-6
    assert np.abs(feats_a - feats_b).mean() > 0  # features do react to input


def test_importer_rejects_shape_drift():
    sd = inception.random_state_dict(seed=0)
    sd["Mixed_5b.branch1x1.conv.weight"] = sd[
        "Mixed_5b.branch1x1.conv.weight"][:, :64]
    with pytest.raises(ValueError):
        inception.import_torch_state_dict(sd)
    sd2 = inception.random_state_dict(seed=0)
    del sd2["fc.bias"]
    with pytest.raises(KeyError):
        inception.import_torch_state_dict(sd2)
