"""Chi-squared statistic as a single one-hot contingency matmul.

The reference builds the class-by-feature "observed" matrix with a Numba
sample loop (``Chi2.py:7-22``) and a prange feature loop for the statistic
(``Chi2.py:24-47``).  On TPU the observed matrix is one MXU matmul:

    observed = onehot(y).T @ X        # (n_classes, n_features)

and the statistic is a tiny elementwise reduction over classes, fused by XLA.
Semantics match the reference: features whose total count is zero score 0.0
(deliberately different from sklearn's NaN), and expected counts <= 1e-12
are skipped.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n_classes",))
def _chi2_device(x: jnp.ndarray, y_mapped: jnp.ndarray, *, n_classes: int):
    x = x.astype(jnp.float32)  # device-resident int8 counts cast on-chip
    y_onehot = jax.nn.one_hot(y_mapped, n_classes, dtype=jnp.float32)
    # (c, n) @ (n, p) -> (c, p) on the MXU; fp32 accumulation.
    observed = jax.lax.dot_general(
        y_onehot, x,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    class_freqs = y_onehot.sum(axis=0)
    n_samples = jnp.float32(x.shape[0])
    feature_counts = observed.sum(axis=0)
    expected = class_freqs[:, None] * (feature_counts[None, :] / n_samples)
    resid = observed - expected
    term = jnp.where(expected > 1e-12,
                     resid * resid / jnp.where(expected > 1e-12, expected,
                                               1.0),
                     0.0)
    stats = term.sum(axis=0)
    return jnp.where(feature_counts == 0, 0.0, stats)


def chi2_stats(x: np.ndarray, y_mapped: np.ndarray, n_classes: int,
               device=None) -> np.ndarray:
    """Chi2 statistics per feature; y_mapped are 0..n_classes-1 codes."""
    from ..utils.backend import execution_context

    with execution_context(device):
        if isinstance(x, jax.Array) and not isinstance(x, np.ndarray):
            xs = x  # device-resident: no host round-trip, cast on-chip
        else:
            xs = np.asarray(x, dtype=np.float32)
            if device is not None and device.platform != "cpu":
                xs = jax.device_put(xs)  # uncommitted: the fast H2D path
        stats = _chi2_device(
            xs,
            jnp.asarray(y_mapped, dtype=jnp.int32),
            n_classes=n_classes,
        )
    return np.asarray(stats, dtype=np.float64)


def chi2_stats_exact(x: np.ndarray, y_mapped: np.ndarray,
                     n_classes: int) -> np.ndarray:
    """Float64 host reference path (parity oracle / tiny inputs)."""
    n_samples = x.shape[0]
    x64 = np.asarray(x, dtype=np.float64)
    # observed = onehot(y).T @ X as one f64 BLAS matmul (2*c*n*p flops,
    # multithreaded) — the same one-matmul formulation the device path
    # uses, ~10x faster again than per-class masked sums at the
    # reference's 2000x200000 benchmark shape
    indicator = np.zeros((n_classes, n_samples), dtype=np.float64)
    indicator[y_mapped, np.arange(n_samples)] = 1.0
    observed = indicator @ x64
    feature_counts = observed.sum(axis=0)
    class_freqs = np.bincount(y_mapped, minlength=n_classes).astype(np.float64)
    expected = class_freqs[:, None] * feature_counts[None, :] / n_samples
    with np.errstate(divide="ignore", invalid="ignore"):
        term = np.where(expected > 1e-12,
                        (observed - expected) ** 2 / expected, 0.0)
    stats = term.sum(axis=0)
    stats[feature_counts == 0] = 0.0
    return stats
