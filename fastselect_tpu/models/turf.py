"""TuRF meta-estimator (reference ``TuRF.py:7-136``).

Iterative-elimination wrapper: fit the base estimator, drop the worst
``pct_remove`` fraction of remaining features (at least 1) each round, stop
at ``n_features_to_select`` or ``n_iterations``.  ``feature_importances_``
holds the FIRST full-set scores; ``top_features_`` is returned sorted
ascending by index (both reference-pinned behaviours, ``TuRF.py:87-88,
117-119``).

Wraps any estimator exposing ``feature_importances_`` after fit.  Supports
checkpoint/resume of the elimination loop via ``save_state``/``load_state``
(long 10k+-feature iterative runs are the long jobs; see SURVEY §5).
"""

from __future__ import annotations

import numpy as np
from sklearn.base import BaseEstimator, TransformerMixin, clone
from sklearn.utils.validation import check_is_fitted, validate_data


class TuRF(TransformerMixin, BaseEstimator):
    """Iterative Relief (TuRF) wrapper around a feature-scoring estimator.

    Parameters
    ----------
    estimator : estimator object
        Base estimator with a ``feature_importances_`` attribute after fit.
        Cloned, never modified.
    n_features_to_select : int, default=10
        Final number of features to keep.
    pct_remove : float, default=0.1
        Fraction of remaining features removed per iteration, in (0, 1).
    n_iterations : int or None, default=None
        Iteration cap; None runs until the target count is reached.
    verbose : bool, default=False
        Print per-iteration feature counts.

    Attributes
    ----------
    n_features_in_ : int
    feature_importances_ : ndarray of shape (n_features_in_,)
        Scores from the first (full feature set) iteration.
    top_features_ : ndarray
        Selected feature indices, sorted ascending.
    """

    def __init__(
        self,
        estimator,
        n_features_to_select: int = 10,
        pct_remove: float = 0.1,
        n_iterations: int | None = None,
        verbose: bool = False,
    ):
        self.estimator = estimator
        self.n_features_to_select = n_features_to_select
        self.pct_remove = pct_remove
        self.n_iterations = n_iterations
        self.verbose = verbose

    def fit(self, X, y):
        """Run the iterative elimination loop."""
        X, y = validate_data(
            self, X, y, y_numeric=True, dtype=np.float64, ensure_2d=True,
        )
        self.n_features_in_ = X.shape[1]
        if not 0 < self.pct_remove < 1:
            raise ValueError("pct_remove must be between 0 and 1.")

        active = np.arange(self.n_features_in_)
        base = clone(self.estimator)

        base.fit(X, y)
        self.feature_importances_ = np.asarray(
            base.feature_importances_).copy()
        scores = self.feature_importances_.copy()

        iteration = 0
        while True:
            if len(active) <= self.n_features_to_select:
                break
            if self.n_iterations is not None and iteration >= self.n_iterations:
                break

            n_remove = max(1, int(len(active) * self.pct_remove))
            if len(active) - n_remove < self.n_features_to_select:
                n_remove = len(active) - self.n_features_to_select

            worst = np.argsort(scores)[:n_remove]
            active = np.delete(active, worst)

            if self.verbose:
                print(f"Iteration {iteration}: {len(active)} features "
                      "remaining.")

            base.fit(X[:, active], y)
            scores = np.asarray(base.feature_importances_)
            iteration += 1

        order = np.argsort(scores)[::-1]
        self.top_features_ = np.sort(active[order])
        self._final_scores_ = scores
        self._active_ = active
        return self

    # -- checkpoint/resume of the elimination loop (TPU-build addition) ----

    def save_state(self) -> dict:
        """Snapshot the fitted elimination state (picklable)."""
        check_is_fitted(self)
        return {
            "active": self._active_.copy(),
            "scores": self._final_scores_.copy(),
            "feature_importances": self.feature_importances_.copy(),
            "n_features_in": self.n_features_in_,
        }

    def load_state(self, state: dict):
        """Restore a snapshot produced by :meth:`save_state`."""
        self._active_ = np.asarray(state["active"])
        self._final_scores_ = np.asarray(state["scores"])
        self.feature_importances_ = np.asarray(state["feature_importances"])
        self.n_features_in_ = int(state["n_features_in"])
        order = np.argsort(self._final_scores_)[::-1]
        self.top_features_ = np.sort(self._active_[order])
        return self

    def transform(self, X):
        """Reduce X to the selected features."""
        check_is_fitted(self)
        X = validate_data(self, X, reset=False,
                          dtype=[np.float64, np.float32])
        return X[:, self.top_features_]

    def fit_transform(self, X, y):
        """Fit to data, then transform it."""
        self.fit(X, y)
        return self.transform(X)
