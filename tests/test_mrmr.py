import numpy as np
import pytest
from numpy.testing import assert_allclose

from fastselect_tpu import mRMR
from fastselect_tpu.models.mrmr import _encode_union
from fastselect_tpu.mutual_information import (calculate_mi_matrices,
                                               calculate_mi_single_pair)

from oracles import mi_pair_bits


@pytest.fixture
def discrete_data(rng):
    X = rng.randint(0, 4, (60, 9))
    y = rng.randint(0, 3, 60)
    return X, y


def test_mi_matrices_match_oracle(discrete_data):
    X, y = discrete_data
    rel, red = calculate_mi_matrices(X, y, backend="cpu", unit="bit")
    p = X.shape[1]
    rel_o = np.array([mi_pair_bits(X[:, f], y) for f in range(p)])
    assert_allclose(rel, rel_o, atol=1e-4)
    for i in range(p):
        for j in range(i + 1, p):
            assert abs(red[i, j] - mi_pair_bits(X[:, i], X[:, j])) < 1e-4
            assert red[i, j] == red[j, i]
    assert_allclose(np.diag(red), 0.0)


def test_mi_single_pair(discrete_data):
    X, y = discrete_data
    got = calculate_mi_single_pair(X[:, 0], y, backend="cpu")
    assert abs(got - mi_pair_bits(X[:, 0], y)) < 1e-4


def test_mi_rejects_float():
    with pytest.raises(ValueError, match="integer"):
        calculate_mi_single_pair(np.array([0.5, 1.0]), np.array([1, 0]))


def test_mi_rejects_negative():
    with pytest.raises(ValueError, match="negative"):
        calculate_mi_matrices(np.array([[-1, 0], [1, 2]]),
                              np.array([0, 1]), backend="cpu")


def test_greedy_matches_oracle(discrete_data):
    X, y = discrete_data
    m = mRMR(n_features_to_select=4, backend="cpu").fit(X, y)
    rel, red = calculate_mi_matrices(*_encode_union(X, y)[:2],
                                     backend="cpu")
    sel = [int(np.argmax(rel))]
    rsum = red[:, sel[0]].copy()
    for i in range(1, 4):
        rem = [f for f in range(X.shape[1]) if f not in sel]
        best = rem[int(np.argmax(rel[rem] - rsum[rem] / i))]
        sel.append(best)
        rsum += red[:, best]
    assert list(m.top_features_) == sel


def test_redundant_feature_not_selected(rng):
    y = rng.randint(0, 2, 100)
    f0 = y.copy()           # perfectly relevant
    f1 = f0.copy()          # exact duplicate: redundant
    f2 = (y + rng.randint(0, 2, 100)) % 3   # partially relevant
    f3 = rng.randint(0, 3, 100)             # noise
    X = np.column_stack([f0, f1, f2, f3])
    m = mRMR(n_features_to_select=2, method="MID", backend="cpu").fit(X, y)
    assert m.top_features_[0] in (0, 1)
    # second pick must avoid the duplicate of the first
    assert m.top_features_[1] not in (0, 1)


def test_miq_method(discrete_data):
    X, y = discrete_data
    m = mRMR(n_features_to_select=3, method="MIQ", backend="cpu").fit(X, y)
    assert len(set(m.top_features_)) == 3


def test_encode_union():
    X = np.array([[5, 7], [9, 5]])
    y = np.array([7, 9])
    X_enc, y_enc, vocab = _encode_union(X, y)
    assert list(vocab) == [5, 7, 9]
    assert X_enc.tolist() == [[0, 1], [2, 0]]
    assert y_enc.tolist() == [1, 2]


def test_invalid_method():
    with pytest.raises(ValueError, match="MID"):
        mRMR(n_features_to_select=2, method="bogus")


def test_invalid_backend():
    with pytest.raises(ValueError, match="Backend"):
        mRMR(n_features_to_select=2, backend="bogus")


def test_gpu_backend_raises():
    with pytest.raises(RuntimeError):
        mRMR(n_features_to_select=2, backend="gpu")


def test_invalid_n_features(discrete_data):
    X, y = discrete_data
    with pytest.raises(ValueError, match="n_features_to_select"):
        mRMR(n_features_to_select=100, backend="cpu").fit(X, y)


def test_transform(discrete_data):
    X, y = discrete_data
    m = mRMR(n_features_to_select=4, backend="cpu").fit(X, y)
    assert m.transform(X).shape == (60, 4)


# ---------------------------------------------------------------------------
# Memory-bounded streaming greedy (GWAS p: no (p, p) matrix — VERDICT r1
# item 6)
# ---------------------------------------------------------------------------

def test_streaming_greedy_matches_full_matrix(monkeypatch, rng):
    import fastselect_tpu.models.mrmr as M

    X = rng.randint(0, 4, (120, 60)).astype(np.float64)
    y = rng.randint(0, 3, 120).astype(np.float64)
    full = M.mRMR(n_features_to_select=8, backend="cpu").fit(X, y)
    assert full.redundancy_matrix_ is not None

    monkeypatch.setattr(M, "FULL_REDUNDANCY_MAX_P", 10)  # force streaming
    stream = M.mRMR(n_features_to_select=8, backend="cpu").fit(X, y)
    assert stream.redundancy_matrix_ is None
    np.testing.assert_array_equal(stream.top_features_, full.top_features_)
    np.testing.assert_allclose(stream.relevance_scores_,
                               full.relevance_scores_)


def test_streaming_greedy_matches_full_matrix_miq(monkeypatch, rng):
    import fastselect_tpu.models.mrmr as M

    X = rng.randint(0, 3, (90, 40)).astype(np.float64)
    y = rng.randint(0, 2, 90).astype(np.float64)
    full = M.mRMR(n_features_to_select=6, method="MIQ",
                  backend="cpu").fit(X, y)
    monkeypatch.setattr(M, "FULL_REDUNDANCY_MAX_P", 10)
    stream = M.mRMR(n_features_to_select=6, method="MIQ",
                    backend="cpu").fit(X, y)
    np.testing.assert_array_equal(stream.top_features_, full.top_features_)


def test_pairwise_stat_columns_match_matrix(rng):
    from fastselect_tpu.ops.contingency import (pairwise_stat_columns,
                                                pairwise_stat_matrix)
    from fastselect_tpu.utils.backend import default_device

    X = rng.randint(0, 5, (80, 24)).astype(np.int32)
    dev = default_device("cpu")
    mat = pairwise_stat_matrix(X, 5, "mi", device=dev)
    for j in (0, 7, 23):
        col = pairwise_stat_columns(X, X[:, j], 5, "mi", device=dev)
        np.testing.assert_allclose(col, mat[:, j], rtol=1e-6, atol=1e-9)


def test_encode_union_bincount_path_matches_sorted(rng):
    """The O(n*p) small-int encode must give identical codes/vocabulary
    to the sorted-vocabulary path (reference mRMR.py:9-27 semantics)."""
    from fastselect_tpu.models.mrmr import _encode_union

    X = rng.choice([0, 2, 5, 9], (50, 12)).astype(np.int64)
    y = rng.choice([1, 2], 50).astype(np.int64)
    Xe_i, ye_i, vocab_i = _encode_union(X, y)
    Xe_f, ye_f, vocab_f = _encode_union(X.astype(np.float64),
                                        y.astype(np.float64))
    np.testing.assert_array_equal(vocab_i, vocab_f)
    np.testing.assert_array_equal(Xe_i, Xe_f)
    np.testing.assert_array_equal(ye_i, ye_f)


def test_device_resident_matrix_matches_host(rng):
    """pairwise_stat_matrix_device: entries bitwise-match the host
    builder (zero diagonal), and matrix_column reads match columns."""
    import math
    from fastselect_tpu.ops.contingency import (matrix_column,
                                                pairwise_stat_matrix,
                                                pairwise_stat_matrix_device)
    X = rng.randint(0, 5, (80, 23)).astype(np.int32)
    host = pairwise_stat_matrix(X, 5, "mi", device=None,
                                log_base=math.log(2.0))
    np.fill_diagonal(host, 0.0)
    R_dev, p = pairwise_stat_matrix_device(X, 5, "mi", device=None,
                                           log_base=math.log(2.0))
    assert p == 23
    dev = np.asarray(R_dev, np.float64)[:p, :p]
    assert_allclose(dev, host, rtol=0, atol=0)  # bitwise
    for j in (0, 7, 22):
        assert_allclose(matrix_column(R_dev, j, p), host[:, j],
                        rtol=0, atol=0)


def test_greedy_over_device_matrix_matches_fit(rng):
    """The device-column greedy (accelerator fit path) selects the same
    features as the host full-matrix fit."""
    import math
    from fastselect_tpu.ops.contingency import (matrix_column,
                                                pairwise_stat_matrix_device)
    X = rng.randint(0, 4, (100, 30))
    y = rng.randint(0, 2, 100)
    ref = mRMR(n_features_to_select=8).fit(X, y)
    Xe, ye, _ = _encode_union(X, y)
    s = int(max(Xe.max(), ye.max())) + 1
    R_dev, p = pairwise_stat_matrix_device(Xe, s, "mi", device=None,
                                           log_base=math.log(2.0))
    est = mRMR(n_features_to_select=8)
    est.n_features_in_ = p
    got = est._greedy_select(ref.relevance_scores_,
                             lambda j: matrix_column(R_dev, j, p))
    np.testing.assert_array_equal(got, ref.top_features_)


def test_redundancy_matrix_lazy_materialisation(rng):
    """Device-resident redundancy materialises on attribute access and
    survives pickling (fit path contract)."""
    import math
    import pickle
    from fastselect_tpu.ops.contingency import pairwise_stat_matrix_device
    X = rng.randint(0, 4, (60, 12))
    y = rng.randint(0, 2, 60)
    est = mRMR(n_features_to_select=4).fit(X, y)
    host_matrix = est.redundancy_matrix_.copy()
    # simulate the accelerator fit path: device handle, no host copy
    Xe, ye, _ = _encode_union(X, y)
    s = int(max(Xe.max(), ye.max())) + 1
    R_dev, p = pairwise_stat_matrix_device(Xe, s, "mi", device=None,
                                           log_base=math.log(2.0))
    est._redundancy_host = None
    est._redundancy_dev = R_dev
    assert_allclose(est.redundancy_matrix_, host_matrix, rtol=0, atol=0)
    assert est._redundancy_dev is None  # freed after materialisation
    est._redundancy_host = None
    est._redundancy_dev = R_dev
    clone = pickle.loads(pickle.dumps(est))
    assert_allclose(clone.redundancy_matrix_, host_matrix,
                    rtol=0, atol=0)
