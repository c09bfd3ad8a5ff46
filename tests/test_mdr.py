import math

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from fastselect_tpu import MDR
from fastselect_tpu.models.mdr import MAX_K_FOR_KERNEL
from fastselect_tpu.ops.mdr_op import batch_balanced_accuracy

from oracles import mdr_balanced_accuracy


@pytest.fixture(scope="module")
def epistasis_data():
    """XOR-style 2-SNP interaction: risk iff both genotypes are 2."""
    X = np.array([
        [2, 2], [2, 2], [2, 0], [0, 2],
        [0, 0], [1, 1], [1, 0], [0, 1],
    ], dtype=np.uint8)
    y = np.array([1, 1, 0, 0, 0, 0, 0, 0], dtype=np.uint8)
    return X, y


def test_finds_interaction(epistasis_data):
    X, y = epistasis_data
    clf = MDR(k=2, cv=2, backend="cpu").fit(X, y)
    assert clf.best_interaction_ == (0, 1)
    assert clf.best_cvc_ == 2
    assert math.isclose(clf.best_mean_testing_ba_, 1.0, abs_tol=1e-6)


def test_predict(epistasis_data):
    X, y = epistasis_data
    clf = MDR(k=2, cv=2, backend="cpu").fit(X, y)
    assert_array_equal(clf.predict(X), y)
    assert clf.transform(X).shape == (len(y), 1)


def test_kernel_matches_oracle(rng):
    n, p, k = 80, 6, 2
    X = rng.randint(0, 3, (n, p)).astype(np.int32)
    y = rng.randint(0, 2, n).astype(np.uint8)
    from itertools import combinations
    combos = np.array(list(combinations(range(p), k)), np.int32)
    got = batch_balanced_accuracy(X, y, combos, k)
    expected = np.array([mdr_balanced_accuracy(X, y, tuple(c))
                         for c in combos])
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_kernel_matches_oracle_k3(rng):
    n, p, k = 50, 5, 3
    X = rng.randint(0, 3, (n, p)).astype(np.int32)
    y = rng.randint(0, 2, n).astype(np.uint8)
    from itertools import combinations
    combos = np.array(list(combinations(range(p), k)), np.int32)
    got = batch_balanced_accuracy(X, y, combos, k)
    expected = np.array([mdr_balanced_accuracy(X, y, tuple(c))
                         for c in combos])
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_multiclass_raises(rng):
    X = rng.randint(0, 3, (30, 4)).astype(np.uint8)
    y = rng.randint(0, 3, 30)
    with pytest.raises(ValueError, match="binary"):
        MDR(backend="cpu").fit(X, y)


def test_bad_genotypes_raise(rng):
    X = rng.randint(0, 5, (30, 4)).astype(np.uint8)
    y = rng.randint(0, 2, 30)
    with pytest.raises(ValueError, match="0/1/2"):
        MDR(backend="cpu").fit(X, y)


def test_k_too_large(rng):
    X = rng.randint(0, 3, (30, 4)).astype(np.uint8)
    y = rng.randint(0, 2, 30)
    with pytest.raises(ValueError, match="MAX_K_FOR_KERNEL"):
        MDR(k=MAX_K_FOR_KERNEL + 1, backend="cpu").fit(X, y)
    with pytest.raises(ValueError, match="n_features"):
        MDR(k=5, cv=2, backend="cpu").fit(X, y)


def test_gpu_backend_raises(epistasis_data):
    X, y = epistasis_data
    with pytest.raises(RuntimeError):
        MDR(backend="gpu").fit(X, y)


def test_predict_proba_not_implemented(epistasis_data):
    X, y = epistasis_data
    clf = MDR(k=2, cv=2, backend="cpu").fit(X, y)
    with pytest.raises(NotImplementedError):
        clf.predict_proba(X)


def test_verbose(epistasis_data, capsys):
    X, y = epistasis_data
    MDR(k=2, cv=2, backend="cpu", verbose=True).fit(X, y)
    out = capsys.readouterr().out
    assert "Fit Complete" in out and "Best interaction" in out


# -- property-based: public predict == private LUT predict (reference
# test_mdr.py:135-150 pattern, hypothesis-generated genotype matrices) --
try:
    from hypothesis import given, settings, strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=10, deadline=None)
    @given(
        X=arrays(np.uint8, (20, 4), elements=st.integers(0, 2)),
        y=arrays(np.int64, (20,), elements=st.integers(0, 1)),
    )
    def test_predict_equals_internal_lut(X, y):
        if len(np.unique(y)) < 2:
            return
        from fastselect_tpu import MDR

        m = MDR(k=2, cv=2)
        m.fit(X, y)
        expected = m._internal_predict(
            X, m.best_interaction_, m.best_model_lookup_table_)
        np.testing.assert_array_equal(m.predict(X), expected)
except ImportError:  # pragma: no cover
    pass
