import numpy as np
import pandas as pd
import pytest
from numpy.testing import assert_allclose
from sklearn.exceptions import NotFittedError

from fastselect_tpu import CFS
from fastselect_tpu.models.cfs import _cfs_merit, _best_first_search
from fastselect_tpu.ops.contingency import pairwise_stat_matrix

from oracles import su_pair


@pytest.fixture(scope="module")
def sample_data():
    """f0: strong signal; f1: redundant copy of f0; f2: independent moderate
    signal; f3: noise; f4: constant; f5: high-cardinality discrete."""
    rs = np.random.RandomState(42)
    n = 200
    y = rs.randint(0, 2, n)
    f0 = y + rs.normal(0, 0.1, n)
    f1 = f0 + rs.normal(0, 0.05, n)
    f2 = y + rs.normal(0, 0.5, n)
    f2[y == 0] -= 0.5
    f3 = rs.rand(n) * 10
    f4 = np.full(n, 5.0)
    f5 = rs.randint(0, 40, n).astype(float)
    X = np.column_stack([f0, f1, f2, f3, f4, f5])
    return X, y


def test_selects_signal_not_redundant(sample_data):
    X, y = sample_data
    c = CFS(backend="cpu").fit(X, y)
    assert 0 in c.selected_indices_
    assert 1 not in c.selected_indices_  # redundant with f0
    assert 3 not in c.selected_indices_  # noise
    assert 4 not in c.selected_indices_  # constant
    assert c.merit_ > 0


def test_support_mask(sample_data):
    X, y = sample_data
    c = CFS(backend="cpu").fit(X, y)
    mask = c._get_support_mask()
    assert mask.dtype == bool
    assert mask.sum() == len(c.selected_indices_)
    assert_allclose(np.where(mask)[0], c.selected_indices_)


def test_pandas_roundtrip(sample_data):
    X, y = sample_data
    df = pd.DataFrame(X, columns=[f"f{i}" for i in range(X.shape[1])])
    c = CFS(backend="cpu").fit(df, y)
    out = c.transform(df)
    assert isinstance(out, pd.DataFrame)
    assert list(out.columns) == [f"f{i}" for i in c.selected_indices_]


def test_su_matrix_matches_oracle(rng):
    X = rng.randint(0, 5, (50, 6)).astype(np.int32)
    su = pairwise_stat_matrix(X, 5, "su")
    for i in range(6):
        for j in range(i + 1, 6):
            assert abs(su[i, j] - su_pair(X[:, i], X[:, j])) < 1e-4


def test_merit_formula():
    assert _cfs_merit(0.0, 0, 0.0) == 0.0
    # k=1: merit is just r_cf
    assert abs(_cfs_merit(0.8, 1, 0.0) - 0.8) < 1e-12
    # k=2 with known values
    expected = 2 * 0.45 / np.sqrt(2 + 2 * 1 * 0.2)
    assert abs(_cfs_merit(0.9, 2, 0.2) - expected) < 1e-12


def test_best_first_min_rcf_floor():
    r_cf = np.array([0.05, 0.08], dtype=np.float32)
    r_ff = np.zeros((2, 2), dtype=np.float32)
    assert _best_first_search(r_cf, r_ff) == []


def test_not_fitted(sample_data):
    X, _ = sample_data
    with pytest.raises(NotFittedError):
        CFS().transform(X)


def test_gpu_backend_raises(sample_data):
    X, y = sample_data
    with pytest.raises(RuntimeError):
        CFS(backend="gpu").fit(X, y)


def test_all_discrete_input(rng):
    y = rng.randint(0, 2, 80)
    X = np.column_stack([
        y ^ rng.binomial(1, 0.05, 80),      # strong
        rng.randint(0, 3, 80),              # noise
    ]).astype(np.int64)
    c = CFS(backend="cpu").fit(X, y)
    assert 0 in c.selected_indices_


def test_streaming_su_columns_match_full_matrix(monkeypatch, rng):
    """GWAS-p CFS (no (p, p) SU matrix) must select identically."""
    import fastselect_tpu.models.cfs as C

    X = rng.randint(0, 3, (100, 30)).astype(np.float64)
    X[:, 2] = (rng.rand(100) > 0.5) * 2.0
    y = (X[:, 2] > 0).astype(np.float64)
    full = C.CFS(backend="cpu").fit(X, y)
    monkeypatch.setattr(C, "FULL_SU_MAX_P", 5)  # force streaming
    stream = C.CFS(backend="cpu").fit(X, y)
    np.testing.assert_array_equal(stream.selected_indices_,
                                  full.selected_indices_)
    np.testing.assert_allclose(stream.merit_, full.merit_, rtol=1e-6)


def test_device_resident_su_matrix_matches_host(rng):
    """The device-resident SU matrix (accelerator CFS path) matches the
    host builder bitwise on the same backend, column by column."""
    import math
    from numpy.testing import assert_allclose
    from fastselect_tpu.ops.contingency import (matrix_column,
                                                pairwise_stat_matrix,
                                                pairwise_stat_matrix_device)
    X = rng.randint(0, 6, (70, 19)).astype(np.int32)
    host = pairwise_stat_matrix(X, 6, "su", device=None)
    np.fill_diagonal(host, 0.0)
    R_dev, p = pairwise_stat_matrix_device(X, 6, "su", device=None)
    assert p == 19
    for j in (0, 5, 18):
        assert_allclose(matrix_column(R_dev, j, p).astype(np.float32),
                        host[:, j].astype(np.float32), rtol=0, atol=0)
