"""Preprocessing shared by the Relief-family estimators.

Mirrors the reference's shared numerics (``MultiSURF.py:141-144,409-420``,
``ReliefF.py:366-380``, ``SURF.py:347-355``):

* per-feature range scaling with zero-range (and, for ReliefF/SURF, discrete)
  features pinned to range 1.0, exposed as the reciprocal used in the scaled
  L1 distance;
* per-feature discreteness detection: a feature with at most
  ``discrete_limit`` unique values is discrete (Hamming distance), otherwise
  continuous (range-scaled L1).

The reference loops ``np.unique`` per column; at GWAS scale that is a real
hotspot, so this is a single vectorized column sort + adjacent-diff count.
"""

from __future__ import annotations

import numpy as np


def detect_discrete_features(x: np.ndarray, discrete_limit: int) -> np.ndarray:
    """Boolean mask of features with <= discrete_limit unique values.

    Equivalent to ``np.unique(x[:, f]).size <= discrete_limit`` per column
    (reference ``MultiSURF.py:416-420``) but computed with one vectorized
    sort over all columns.
    """
    n_samples = x.shape[0]
    if n_samples == 0:
        return np.zeros(x.shape[1], dtype=bool)
    xs = np.sort(x, axis=0)
    n_unique = 1 + (xs[1:] != xs[:-1]).sum(axis=0)
    return np.asarray(n_unique <= discrete_limit, dtype=bool)


def compute_recip_ranges(
    x: np.ndarray,
    is_discrete: np.ndarray | None = None,
    *,
    unit_range_for_discrete: bool = False,
) -> np.ndarray:
    """Reciprocal of per-feature ranges, float32.

    ``unit_range_for_discrete=True`` reproduces ReliefF/SURF semantics where
    discrete features get range 1.0 before the zero-range guard
    (``ReliefF.py:377-380``); MultiSURF applies only the zero-range guard
    (``MultiSURF.py:409-412``).
    """
    ranges = x.max(axis=0) - x.min(axis=0)
    if unit_range_for_discrete and is_discrete is not None:
        ranges = np.where(is_discrete, 1.0, ranges)
    ranges = np.where(ranges == 0, 1.0, ranges)
    return (1.0 / ranges).astype(np.float32)
