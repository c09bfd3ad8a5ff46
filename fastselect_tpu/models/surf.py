"""SURF / SURF* estimator (reference ``SURF.py:220-425``).

Threshold is the focal sample's mean pairwise distance.  Near hits subtract
and near misses add unit-weighted feature diffs; SURF* additionally adds
far hits and subtracts far misses (reference ``SURF.py:191-193`` — note the
sign convention differs from MultiSURF*, which has no far-hit term).
"""

from __future__ import annotations

import numpy as np

from ._relief_base import BaseReliefSelector
from ..ops.relief import relief_scores


class SURF(BaseReliefSelector):
    """TPU-accelerated feature selection using the SURF algorithm.

    Parameters
    ----------
    n_features_to_select : int or float, default=0.2
        Number (int) or fraction (float in (0, 1]) of top features to keep.
    backend : {'auto', 'tpu', 'cpu'}, default='auto'
        Compute backend ('gpu' raises; this framework is TPU-native).
    use_star : bool, default=False
        Run SURF*, which adds updates from "far" neighbors.
    discrete_limit : int, default=10
        Features with at most this many unique values are discrete.
    n_jobs : int, default=-1
        API-compatibility no-op; XLA manages its own parallelism.
    verbose : bool, default=False
        Print progress messages during fit.
    transfer_dtype : {None, 'float32', 'float16', 'bfloat16'}, default=None
        Staging dtype for the host-to-device copy of continuous data on
        TPU fits ('float16'/'bfloat16' halve H2D bytes at ~1e-3
        relative score precision).  None auto-selects float16 for
        large p >> n float matrices (the transfer-bound regime) and
        exact float32 otherwise; pass 'float32' to force exact
        staging.  The dtype used is recorded in ``transfer_dtype_``.

    Attributes
    ----------
    n_features_in_ : int
    feature_importances_ : ndarray of shape (n_features,)
    top_features_ : ndarray of shape (n_features_to_select,)
    is_discrete_ : ndarray of shape (n_features,)
    effective_backend_ : str
    """

    _algo_name = "SURF"
    _validate_dtype = np.float64

    def __init__(
        self,
        n_features_to_select: int | float = 0.2,
        backend: str = "auto",
        use_star: bool = False,
        discrete_limit: int = 10,
        n_jobs: int = -1,
        verbose: bool = False,
        transfer_dtype: str | None = None,
    ):
        self.n_features_to_select = n_features_to_select
        self.backend = backend
        self.use_star = use_star
        self.discrete_limit = discrete_limit
        self.n_jobs = n_jobs
        self.verbose = verbose
        self.transfer_dtype = transfer_dtype

    def _score(self, X, y, analysis, n_select):
        self.effective_backend_ = self._resolve_backend()
        _, y_enc = np.unique(y, return_inverse=True)
        self._log_running("SURF*" if self.use_star else "SURF")
        scores = relief_scores(
            X, y_enc.astype(np.int32), analysis.recip,
            analysis.is_discrete,
            algo="surf", use_star=self.use_star,
            device=self._device(),
            codes=analysis.codes, n_states=analysis.n_states,
        )
        if self.verbose:
            print("Feature scoring completed.")
        return scores
