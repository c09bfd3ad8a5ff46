import numpy as np
import pytest
from numpy.testing import assert_allclose

from fastselect_tpu import ReliefF

from oracles import relieff_scores


@pytest.mark.parametrize("k", [1, 3, 7])
def test_oracle_parity_binary(k, rng):
    X = rng.rand(35, 13).astype(np.float32)
    X[:, 2] = rng.randint(0, 3, 35)
    y = rng.randint(0, 2, 35)
    m = ReliefF(n_features_to_select=5, backend="cpu",
                n_neighbors=k).fit(X, y)
    assert_allclose(m.feature_importances_, relieff_scores(X, y, k=k),
                    atol=5e-6)


def test_oracle_parity_multiclass(rng):
    X = rng.rand(42, 9).astype(np.float32)
    y = rng.randint(0, 4, 42)
    m = ReliefF(n_features_to_select=3, backend="cpu",
                n_neighbors=3).fit(X, y)
    assert_allclose(m.feature_importances_, relieff_scores(X, y, k=3),
                    atol=5e-6)


def test_relevant_feature_ranking(rng):
    n = 30
    y = np.repeat([0, 1], n // 2)
    X = np.column_stack([
        np.where(y == 0, 0.0, 4.0) + rng.randn(n) * 0.2,
        rng.randn(n),
    ]).astype(np.float32)
    m = ReliefF(n_features_to_select=1, backend="cpu").fit(X, y)
    assert m.top_features_[0] == 0
    assert m.feature_importances_[0] > m.feature_importances_[1]


def test_zero_range_feature(rng):
    X = rng.rand(20, 3).astype(np.float32)
    X[:, 2] = 1.0
    y = rng.randint(0, 2, 20)
    m = ReliefF(backend="cpu").fit(X, y)
    assert_allclose(m.feature_importances_[2], 0.0, atol=1e-7)


def test_single_class(rng):
    X = rng.rand(10, 4)
    y = np.zeros(10)
    m = ReliefF(n_features_to_select=2, backend="cpu").fit(X, y)
    assert_allclose(m.feature_importances_, 0.0)
    assert list(m.top_features_) == [0, 1]


def test_small_class_warns(rng):
    X = rng.rand(10, 3)
    y = np.array([0] * 8 + [1] * 2)
    with pytest.warns(UserWarning, match="smallest class size"):
        ReliefF(n_neighbors=3, backend="cpu").fit(X, y)


@pytest.mark.parametrize("bad_k", [0, -1, 100])
def test_invalid_n_neighbors(bad_k, rng):
    X = rng.rand(12, 3)
    y = rng.randint(0, 2, 12)
    with pytest.raises(ValueError, match="n_neighbors"):
        ReliefF(n_neighbors=bad_k, backend="cpu").fit(X, y)


def test_invalid_backend(rng):
    X = rng.rand(12, 3)
    y = rng.randint(0, 2, 12)
    with pytest.raises(ValueError, match="backend"):
        ReliefF(backend="quantum").fit(X, y)


@pytest.mark.parametrize("sel,expected", [(2, 2), (0.5, 1), (1.0, 3)])
def test_n_features_to_select_variants(sel, expected, rng):
    X = rng.rand(16, 3)
    y = rng.randint(0, 2, 16)
    m = ReliefF(n_features_to_select=sel, backend="cpu").fit(X, y)
    assert len(m.top_features_) == expected


def test_discrete_limit(rng):
    X = np.column_stack([
        np.arange(22, dtype=float),
        np.arange(22) % 3,
    ])
    y = rng.randint(0, 2, 22)
    m = ReliefF(discrete_limit=10, backend="cpu").fit(X, y)
    assert list(m.is_discrete_) == [False, True]
