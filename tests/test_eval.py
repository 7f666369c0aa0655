"""FID math + auxiliary eval tests."""

import numpy as np
import pytest

from frido_tpu.eval.fid import (
    feature_statistics,
    fid_from_features,
    frechet_distance,
)


def test_fid_identical_is_zero():
    f = np.random.RandomState(0).randn(500, 16)
    assert abs(fid_from_features(f, f)) < 1e-6


def test_fid_mean_shift_analytic():
    # For equal covariance, FID == |mu1 - mu2|^2
    rng = np.random.RandomState(1)
    f1 = rng.randn(200000, 4)
    f2 = f1 + np.array([1.0, 0, 0, 0])
    fid = fid_from_features(f1, f2)
    assert fid == pytest.approx(1.0, abs=0.02)


def test_frechet_distance_symmetry():
    rng = np.random.RandomState(2)
    a = rng.randn(1000, 8)
    b = rng.randn(1000, 8) * 2 + 1
    m1, s1 = feature_statistics(a)
    m2, s2 = feature_statistics(b)
    d12 = frechet_distance(m1, s1, m2, s2)
    d21 = frechet_distance(m2, s2, m1, s1)
    assert d12 == pytest.approx(d21, rel=1e-6)
    assert d12 > 0
