"""Unit tests for the one-hot contingency builders (`ops/contingency.py`):
the state-0-dropped contraction must reproduce the full one-hot tables
bit for bit (every recovered entry is an exact integer subtraction)."""

import numpy as np
from numpy.testing import assert_array_equal, assert_allclose

from fastselect_tpu.ops.contingency import (
    StagedColumnStats, pairwise_stat_matrix, pairwise_stat_columns)
from fastselect_tpu.utils.backend import default_device


def _oracle_mi_matrix(X, s, n):
    """Direct per-pair joint-histogram MI (bits)."""
    p = X.shape[1]
    out = np.zeros((p, p))
    for i in range(p):
        for j in range(p):
            tab = np.zeros((s, s))
            for a, b in zip(X[:, i], X[:, j]):
                tab[a, b] += 1
            pxy = tab / n
            px = pxy.sum(1, keepdims=True)
            py = pxy.sum(0, keepdims=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                t = np.where(pxy > 1e-12,
                             pxy * np.log(pxy / (px * py + 1e-12)), 0.0)
            out[i, j] = t.sum() / np.log(2.0)
    return out


def test_pairwise_matrix_state0_drop_matches_oracle(rng):
    n, p, s = 120, 17, 5
    X = rng.randint(0, s, (n, p)).astype(np.int32)
    got = pairwise_stat_matrix(X, s, "mi", device=default_device("cpu"))
    ref = _oracle_mi_matrix(X, s, n)
    assert_allclose(got, ref, rtol=1e-5, atol=1e-7)
    assert_array_equal(got, got.T)  # bitwise symmetry contract


def test_staged_column_matches_full_matrix(rng):
    """Streamed redundancy columns (state-0-dropped) == full-matrix
    columns bit for bit."""
    n, p, s = 90, 40, 6
    X = rng.randint(0, s, (n, p)).astype(np.int32)
    dev = default_device("cpu")
    full = pairwise_stat_matrix(X, s, "mi", device=dev)
    staged = StagedColumnStats(X, s, device=dev)
    for j in (0, 7, 39):
        col = staged.column(j, "mi")
        assert_allclose(col, full[:, j], rtol=1e-6, atol=1e-12)


def test_staged_binary_target_fallback(rng):
    """s = 2 keeps the full contraction (nothing to drop)."""
    n, p = 60, 12
    X = rng.randint(0, 2, (n, p)).astype(np.int32)
    y = rng.randint(0, 2, n).astype(np.int32)
    staged = StagedColumnStats(X, 2, device=default_device("cpu"))
    rel = staged.stats_vs(y, 2, "mi")
    one = pairwise_stat_columns(
        np.concatenate([X, y[:, None]], axis=1), y, 2, "mi",
        device=default_device("cpu"))
    assert_allclose(rel, one[:p], rtol=1e-6, atol=1e-12)
