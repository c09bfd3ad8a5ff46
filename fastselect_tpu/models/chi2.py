"""Functional chi2 selector (reference ``Chi2.py:49-92``).

Sklearn-count-style chi-squared scores between each non-negative feature and
the class labels, with the reference's deliberate divergences preserved:
zero-count features score 0.0 (sklearn yields NaN), and a single-class y
returns ``(zeros, ones)``.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import chi2 as chi2_dist
from sklearn.utils.validation import check_array, check_X_y

from ..ops.chi2_op import chi2_stats, chi2_stats_exact
from ..utils.backend import resolve_backend, default_device


def _is_device_array(x) -> bool:
    try:
        import jax
        return isinstance(x, jax.Array)
    except ImportError:  # pragma: no cover
        return False


def chi2(X: np.ndarray, y: np.ndarray, *, backend: str = "auto",
         exact: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """Chi-squared statistics and p-values for each feature.

    Parameters
    ----------
    X : array-like of shape (n_samples, n_features)
        Non-negative count-like feature values.
    y : array-like of shape (n_samples,)
        Class labels.
    backend : {'auto', 'tpu', 'cpu'}, default='auto'
        Where to run the contingency matmul.
    exact : bool, default=False
        Use float64 host accumulation (bit-stable oracle path) instead of the
        fp32 device matmul.

    Returns
    -------
    (chi2_stats, p_values) : tuple of ndarray of shape (n_features,)
    """
    was_device = _is_device_array(X)
    if was_device and not exact:
        # Device-resident X (e.g. staged once with jax.device_put):
        # validate WITHOUT a host round-trip — pulling the matrix back
        # just to run check_array would cost more than the whole fit.
        # Non-negativity is checked with a device min-reduce (one scalar
        # D2H); y is host-sized and validated normally.
        import jax
        import jax.numpy as jnp
        if X.ndim != 2:
            raise ValueError("X must be 2-dimensional.")
        y = np.asarray(y)
        if y.shape[0] != X.shape[0]:
            raise ValueError(
                f"X and y have inconsistent lengths: {X.shape[0]} vs "
                f"{y.shape[0]}.")
        if float(jax.jit(jnp.min)(X)) < 0:
            raise ValueError(
                "Input matrix X must contain non-negative values.")
        n_samples, n_features = X.shape
        labels, y_mapped = np.unique(y, return_inverse=True)
        n_classes = len(labels)
        if n_classes < 2:
            return (np.zeros(n_features, dtype=np.float64),
                    np.ones(n_features, dtype=np.float64))
        dev = list(X.devices())[0]
        stats = chi2_stats(X, y_mapped, n_classes, device=dev)
        return stats, chi2_dist.sf(stats, n_classes - 1)

    X = check_array(X, dtype=[np.float64, np.float32], ensure_2d=True)
    X, y = check_X_y(X, y, y_numeric=True)

    if np.any(X < 0):
        raise ValueError("Input matrix X must contain non-negative values.")

    n_samples, n_features = X.shape
    labels, y_mapped = np.unique(y, return_inverse=True)
    n_classes = len(labels)

    if n_classes < 2:
        return (np.zeros(n_features, dtype=np.float64),
                np.ones(n_features, dtype=np.float64))

    effective = "cpu" if exact else resolve_backend(backend, "chi2")
    if effective != "cpu" and backend == "auto" and not was_device:
        # chi2 is O(n*p) compute over 4*n*p transferred bytes — for a
        # HOST-resident X the H2D alone costs more than the whole f64
        # BLAS path (the reference's own 2000x200000 benchmark config,
        # benchmarking/testing.py:10-13, is transfer-bound on any
        # accelerator).  'auto' therefore stays on host unless X already
        # lives on device; backend='tpu' still forces the device matmul.
        effective = "cpu"
    if effective == "cpu":
        # The CPU backend IS the f64 parity oracle: the reference's own
        # suite pins chi2 to sklearn at rtol 1e-6 and exact 0.0 for
        # constant features (tests/test_chi2.py:27-104), which fp32
        # accumulation cannot guarantee.
        stats = chi2_stats_exact(X, y_mapped, n_classes)
    else:
        stats = chi2_stats(X, y_mapped, n_classes,
                           device=default_device(effective))

    dof = n_classes - 1
    p_values = chi2_dist.sf(stats, dof)
    return stats, p_values
