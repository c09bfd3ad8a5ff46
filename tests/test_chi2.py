import numpy as np
import pytest
from numpy.testing import assert_allclose
from sklearn.feature_selection import chi2 as sklearn_chi2

from fastselect_tpu import chi2


@pytest.mark.parametrize("n,p,c", [(50, 10, 2), (200, 64, 3), (97, 31, 5)])
def test_matches_sklearn(n, p, c, rng):
    X = rng.rand(n, p) * 10
    y = rng.randint(0, c, n)
    s_ref, p_ref = sklearn_chi2(X, y)
    s, pv = chi2(X, y, backend="cpu")
    assert_allclose(s, s_ref, rtol=2e-4)
    assert_allclose(pv, p_ref, rtol=2e-3, atol=1e-9)


def test_exact_path_matches_sklearn(rng):
    X = rng.rand(120, 40) * 3
    y = rng.randint(0, 4, 120)
    s_ref, _ = sklearn_chi2(X, y)
    s, _ = chi2(X, y, exact=True)
    assert_allclose(s, s_ref, rtol=1e-10)


def test_integer_counts(rng):
    X = rng.randint(0, 20, (150, 25)).astype(float)
    y = rng.randint(0, 3, 150)
    s_ref, _ = sklearn_chi2(X, y)
    s, _ = chi2(X, y, backend="cpu")
    assert_allclose(s, s_ref, rtol=1e-5)


def test_zero_count_feature_is_zero_not_nan(rng):
    # Deliberate divergence from sklearn (which yields NaN):
    # reference Chi2.py:33-35 returns 0.0 for all-zero features.
    X = rng.rand(60, 5)
    X[:, 2] = 0.0
    y = rng.randint(0, 2, 60)
    s, pv = chi2(X, y, backend="cpu")
    assert s[2] == 0.0
    assert np.isfinite(pv).all()


def test_negative_raises(rng):
    X = rng.rand(30, 4) - 0.5
    y = rng.randint(0, 2, 30)
    with pytest.raises(ValueError, match="non-negative"):
        chi2(X, y)


def test_single_class(rng):
    X = rng.rand(30, 4)
    y = np.zeros(30)
    s, pv = chi2(X, y, backend="cpu")
    assert_allclose(s, 0.0)
    assert_allclose(pv, 1.0)


def test_shape_mismatch_raises(rng):
    with pytest.raises(ValueError):
        chi2(rng.rand(10, 3), np.zeros(8))
