"""Eval metric sanity + closed-form checks (frido_tpu.eval.metrics)."""

import pytest

# <10-min tier: tools/pytest_cpu.sh -m fast (VERDICT r2 #7)
pytestmark = pytest.mark.fast

import numpy as np

from frido_tpu.eval.metrics import (clip_score, inception_score,
                                    precision_recall, psnr, psnr_ssim_batch,
                                    ssim)


def test_psnr_closed_form():
    a = np.zeros((8, 8))
    b = np.full((8, 8), 0.5)
    # mse = 0.25, range 2 -> 10 log10(4 / .25) = 12.04
    assert abs(psnr(a, b, data_range=2.0) - 10 * np.log10(16.0)) < 1e-9
    assert psnr(a, a) == float("inf")


def test_ssim_bounds_and_identity():
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (32, 32, 3))
    assert abs(ssim(x, x) - 1.0) < 1e-9
    noisy = x + rng.normal(0, 0.5, x.shape)
    s = ssim(x, noisy)
    assert 0.0 < s < 0.9
    # monotone in noise level
    s2 = ssim(x, x + rng.normal(0, 0.05, x.shape))
    assert s2 > s


def test_psnr_ssim_batch_shapes():
    rng = np.random.RandomState(1)
    a = rng.uniform(-1, 1, (4, 16, 16, 3))
    ps, ss = psnr_ssim_batch(a, a + 0.1)
    assert np.isfinite(ps) and 0 < ss <= 1


def test_inception_score_extremes():
    # maximally confident + diverse: N one-hot classes -> IS ~ n_classes
    n, c = 100, 10
    logits = np.full((n, c), -50.0)
    logits[np.arange(n), np.arange(n) % c] = 50.0
    mean, _ = inception_score(logits, splits=2)
    assert mean > c * 0.9
    # uniform predictions -> IS == 1
    mean_u, _ = inception_score(np.zeros((n, c)), splits=2)
    assert abs(mean_u - 1.0) < 1e-6


def test_precision_recall_identical_and_disjoint():
    rng = np.random.RandomState(2)
    feats = rng.normal(size=(64, 8))
    p, r = precision_recall(feats, feats.copy())
    assert p == 1.0 and r == 1.0
    far = feats + 1000.0
    p, r = precision_recall(feats, far)
    assert p == 0.0 and r == 0.0


def test_clip_score_aligned():
    rng = np.random.RandomState(3)
    e = rng.normal(size=(16, 32))
    assert abs(clip_score(e, e) - 2.5) < 1e-9
    assert clip_score(e, -e) == 0.0
