import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal
from sklearn.exceptions import NotFittedError

from fastselect_tpu import MultiSURF

from oracles import multisurf_scores


@pytest.fixture
def simple_data():
    """Feature 0: relevant continuous; 1: noise; 2: mostly-relevant
    discrete; 3: constant (mirrors the reference's semantic fixture
    design: small classes with some overlap so near-misses exist)."""
    X = np.array([
        [1.0, 5.1, 10, 3.0],
        [1.4, 3.9, 10, 3.0],
        [2.1, 6.2, 10, 3.0],
        [2.6, 5.4, 10, 3.0],
        [1.7, 4.4, 20, 3.0],
        [8.5, 5.2, 20, 3.0],
        [9.0, 4.1, 20, 3.0],
        [9.6, 6.1, 20, 3.0],
        [10.2, 4.6, 20, 3.0],
        [10.4, 4.3, 10, 3.0],
    ], dtype=np.float32)
    y = np.array([0, 0, 0, 0, 0, 1, 1, 1, 1, 1])
    return X, y


def test_ranking_and_constant_feature(simple_data):
    X, y = simple_data
    m = MultiSURF(n_features_to_select=1, backend="cpu",
                  discrete_limit=4).fit(X, y)
    assert set(m.top_features_) == {0}
    assert_allclose(m.feature_importances_[3], 0.0, atol=1e-7)


@pytest.mark.parametrize("use_star", [False, True])
def test_oracle_parity(use_star, rng):
    X = rng.rand(37, 19).astype(np.float32)
    X[:, 3] = rng.randint(0, 3, 37)
    X[:, 7] = rng.randint(0, 5, 37)
    y = rng.randint(0, 2, 37)
    m = MultiSURF(n_features_to_select=5, backend="cpu",
                  use_star=use_star).fit(X, y)
    expected = multisurf_scores(X, y, use_star=use_star)
    assert_allclose(m.feature_importances_, expected, atol=2e-6)
    assert_array_equal(np.argsort(m.feature_importances_)[::-1],
                       np.argsort(expected)[::-1])


def test_oracle_parity_multiclass(rng):
    X = rng.rand(30, 11).astype(np.float32)
    y = rng.randint(0, 3, 30)
    m = MultiSURF(n_features_to_select=3, backend="cpu").fit(X, y)
    assert_allclose(m.feature_importances_, multisurf_scores(X, y),
                    atol=2e-6)


def test_fit_transform_shape(simple_data):
    X, y = simple_data
    Xt = MultiSURF(n_features_to_select=3, backend="cpu").fit_transform(X, y)
    assert Xt.shape == (X.shape[0], 3)


def test_discrete_limit():
    X = np.array([[i, i % 3] for i in range(11)] * 2, dtype=np.float32)
    y = np.array([0] * 11 + [1] * 11)
    m = MultiSURF(discrete_limit=10, backend="cpu",
                  n_features_to_select=2).fit(X, y)
    assert_array_equal(m.is_discrete_, [False, True])
    m = MultiSURF(discrete_limit=12, backend="cpu",
                  n_features_to_select=2).fit(X, y)
    assert_array_equal(m.is_discrete_, [True, True])


def test_not_fitted(simple_data):
    X, _ = simple_data
    with pytest.raises(NotFittedError):
        MultiSURF().transform(X)


@pytest.mark.parametrize("bad", [-1, 0, 100])
def test_invalid_n_features(simple_data, bad):
    X, y = simple_data
    with pytest.raises(ValueError):
        MultiSURF(n_features_to_select=bad).fit(X, y)
    with pytest.raises(ValueError):
        MultiSURF(n_features_to_select=1.1).fit(X, y)
    with pytest.raises(TypeError):
        MultiSURF(n_features_to_select="hi").fit(X, y)


def test_verbose_output(simple_data, capsys):
    X, y = simple_data
    MultiSURF(verbose=True, backend="cpu").fit(X, y)
    assert "Running MultiSURF" in capsys.readouterr().out
    MultiSURF(verbose=True, use_star=True, backend="cpu").fit(X, y)
    assert "Running MultiSURF*" in capsys.readouterr().out


def test_invalid_backend(simple_data):
    X, y = simple_data
    with pytest.raises(ValueError):
        MultiSURF(n_features_to_select=4, backend="cuda").fit(X, y)


def test_tpu_is_a_valid_backend_string():
    # Unlike the reference (where 'tpu' raises), this framework accepts it.
    m = MultiSURF(backend="tpu")
    assert m.backend == "tpu"


def test_gpu_backend_raises(simple_data):
    X, y = simple_data
    with pytest.raises(RuntimeError, match="no CUDA-enabled GPU is available"):
        MultiSURF(backend="gpu", n_features_to_select=2).fit(X, y)


def test_nan_raises(simple_data):
    X, y = simple_data
    X = X.copy()
    X[0, 0] = np.nan
    with pytest.raises(ValueError, match="NaN"):
        MultiSURF(backend="cpu", n_features_to_select=2).fit(X, y)


def test_single_class(simple_data):
    X, _ = simple_data
    y = np.zeros(X.shape[0])
    m = MultiSURF(backend="cpu", n_features_to_select=4).fit(X, y)
    assert np.all(m.feature_importances_ <= 1e-7)


def test_min_samples():
    with pytest.raises(ValueError, match="at least 2 samples"):
        MultiSURF(n_features_to_select=1).fit(np.ones((1, 3)), np.zeros(1))


def test_int_genotype_fast_path_matches_float_input(rng):
    """Small-int X (genotypes) skips the float cast + encode sweep; raw
    values are valid state codes (Hamming only tests equality), so the
    model must be identical to the float-input fit."""
    X = rng.randint(0, 3, (80, 40))
    y = rng.randint(0, 2, 80)
    m_int = MultiSURF(n_features_to_select=5, backend="cpu").fit(X, y)
    m_float = MultiSURF(n_features_to_select=5,
                        backend="cpu").fit(X.astype(np.float64), y)
    np.testing.assert_array_equal(m_int.top_features_,
                                  m_float.top_features_)
    np.testing.assert_allclose(m_int.feature_importances_,
                               m_float.feature_importances_, atol=1e-7)
    assert m_int.is_discrete_.all()
