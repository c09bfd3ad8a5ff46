import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal
from sklearn.exceptions import NotFittedError

from fastselect_tpu import SURF

from oracles import surf_scores


@pytest.mark.parametrize("use_star", [False, True])
def test_oracle_parity(use_star, rng):
    X = rng.rand(41, 23).astype(np.float32)
    X[:, 5] = rng.randint(0, 4, 41)
    y = rng.randint(0, 2, 41)
    m = SURF(n_features_to_select=5, backend="cpu",
             use_star=use_star).fit(X, y)
    expected = surf_scores(X, y, use_star=use_star)
    assert_allclose(m.feature_importances_, expected, atol=5e-6)


def test_relevant_feature_ranks_first(rng):
    n = 40
    y = np.repeat([0, 1], n // 2)
    X = np.column_stack([
        np.where(y == 0, 0.0, 5.0) + rng.randn(n) * 0.3,
        rng.randn(n),
        rng.randn(n),
    ]).astype(np.float32)
    m = SURF(n_features_to_select=1, backend="cpu").fit(X, y)
    assert m.top_features_[0] == 0


def test_zero_range_feature_scores_zero(rng):
    X = rng.rand(20, 3).astype(np.float32)
    X[:, 1] = 7.0
    y = rng.randint(0, 2, 20)
    m = SURF(n_features_to_select=1, backend="cpu").fit(X, y)
    assert_allclose(m.feature_importances_[1], 0.0, atol=1e-7)


def test_verbose(capsys, rng):
    X = rng.rand(12, 4).astype(np.float32)
    y = rng.randint(0, 2, 12)
    SURF(verbose=True, backend="cpu").fit(X, y)
    out = capsys.readouterr().out
    assert "Running SURF" in out and "completed" in out
    SURF(verbose=True, use_star=True, backend="cpu").fit(X, y)
    assert "Running SURF*" in capsys.readouterr().out


def test_not_fitted(rng):
    with pytest.raises(NotFittedError):
        SURF().transform(rng.rand(5, 3))


def test_gpu_backend_raises(rng):
    X = rng.rand(12, 4)
    y = rng.randint(0, 2, 12)
    with pytest.raises(RuntimeError):
        SURF(backend="gpu").fit(X, y)


def test_transform_selects_columns(rng):
    X = rng.rand(25, 8).astype(np.float32)
    y = rng.randint(0, 2, 25)
    m = SURF(n_features_to_select=4, backend="cpu").fit(X, y)
    Xt = m.transform(X)
    assert Xt.shape == (25, 4)
    assert_allclose(Xt, X[:, m.top_features_])


def test_discrete_limit_parameter():
    """discrete_limit thresholding (reference test_surf.py pattern):
    feature 0 has 11 unique values, feature 1 has 3."""
    X = np.array([[i, i % 3] for i in range(11)] * 2, dtype=np.float32)
    y = np.array([0] * 11 + [1] * 11)
    m = SURF(discrete_limit=10, backend="cpu").fit(X, y)
    assert_array_equal(m.is_discrete_, [False, True])
    m = SURF(discrete_limit=12, backend="cpu").fit(X, y)
    assert_array_equal(m.is_discrete_, [True, True])


def test_single_class_scores_nonpositive(rng):
    """Single-class input: no misses to learn from, so every score is a
    nonpositive intra-class-variation penalty (reference behaviour)."""
    X = rng.rand(30, 8).astype(np.float32)
    m = SURF(backend="cpu").fit(X, np.zeros(30))
    assert np.all(m.feature_importances_ <= 1e-7)


def test_nan_input_raises(rng):
    X = rng.rand(20, 5)
    X[3, 2] = np.nan
    with pytest.raises(ValueError):
        SURF(backend="cpu").fit(X, rng.randint(0, 2, 20))


@pytest.mark.parametrize("bad", [0, -3, 1.5, "five"])
def test_invalid_n_features_to_select_raises(bad, rng):
    X = rng.rand(25, 6)
    y = rng.randint(0, 2, 25)
    with pytest.raises((ValueError, TypeError)):
        SURF(n_features_to_select=bad, backend="cpu").fit(X, y)


def test_fit_transform_output_shape(rng):
    X = rng.rand(30, 10)
    y = rng.randint(0, 2, 30)
    out = SURF(n_features_to_select=4, backend="cpu").fit_transform(X, y)
    assert out.shape == (30, 4)
