"""Shared sklearn-API plumbing for the Relief-family estimators.

The reference repeats the estimator scaffolding per algorithm
(``MultiSURF.py:273-489``, ``SURF.py:220-425``, ``ReliefF.py:239-452``);
here it lives once.  Subclasses define ``_algo_name`` and ``_score``.
"""

from __future__ import annotations

import functools

import numpy as np
from sklearn.base import BaseEstimator, TransformerMixin
from sklearn.utils.validation import check_is_fitted, validate_data

from ..utils.backend import resolve_backend, default_device, tpu_available
from ..utils.validation import resolve_n_features_to_select, check_min_samples
from ..utils.preprocessing import (detect_discrete_features,
                                   compute_recip_ranges,
                                   analyze_features_device,
                                   FeatureAnalysis)


@functools.cache
def _pallas_max_n():
    from ..ops.relief_pallas import PALLAS_MAX_N
    return PALLAS_MAX_N


# Auto half-width staging threshold: above this element count a
# TPU-bound p >> n float fit is transfer-dominated (H2D floors at
# ~40 MB/s on tunnelled links; the engine itself runs in O(100 ms)),
# so halving the staged bytes roughly halves the fit.  16.8M f32
# elements = 67 MB staged.
_AUTO_F16_MIN_ELEMS = 1 << 24


@functools.cache
def _jitted_nan_check():
    """Module-level jitted NaN probe so repeated device-resident fits hit
    the jit cache (a per-call lambda would retrace every fit)."""
    import jax
    import jax.numpy as jnp
    return jax.jit(lambda a: jnp.isnan(a.astype(jnp.float32)).any())


class BaseReliefSelector(TransformerMixin, BaseEstimator):
    """Common fit/transform skeleton; not part of the public API."""

    _algo_name = "Relief"
    _validate_dtype = np.float64

    def _validate_parameters(self, n_samples, n_features):
        if self.backend not in ("auto", "tpu", "cpu", "gpu"):
            raise ValueError(
                "backend must be one of 'auto', 'tpu', 'cpu', or 'gpu'"
            )
        from ..utils.preprocessing import _resolve_transfer_dtype
        _resolve_transfer_dtype(getattr(self, "transfer_dtype", None))
        check_min_samples(n_samples, self._algo_name)
        return resolve_n_features_to_select(
            self.n_features_to_select, n_features)

    def _resolve_backend(self):
        return resolve_backend(self.backend, self._algo_name)

    def _device(self):
        return default_device(self.effective_backend_)

    def _log_running(self, star_name: str | None = None):
        if getattr(self, "verbose", False):
            name = star_name or self._algo_name
            print(f"Running {name} on the "
                  f"{self.effective_backend_.upper()} now...")

    def fit(self, X, y):
        """Score all features and select the top ones.

        Parameters
        ----------
        X : array-like of shape (n_samples, n_features)
            Training samples. NaN values are rejected.  A ``jax.Array``
            already resident on an accelerator is accepted and never
            round-trips to the host (the HBM-resident fit path).
        y : array-like of shape (n_samples,)
            Numeric class labels.

        Returns
        -------
        self : object
        """
        if self._is_device_array(X):
            return self._fit_device(X, y)
        fast = self._int_fast_analysis(X)
        X, y = validate_data(
            self, X, y, y_numeric=True,
            # small-int input (genotypes): keep the integer dtype — the
            # float cast would copy GBs only to be re-encoded back to
            # int8 (any injective per-column coding gives identical
            # Hamming match counts, so raw values ARE valid codes)
            dtype="numeric" if fast is not None else self._validate_dtype,
            ensure_2d=True,
        )
        self.n_features_in_ = X.shape[1]
        n_samples = X.shape[0]
        n_select = self._validate_parameters(n_samples, self.n_features_in_)

        analysis = fast if fast is not None else self._analyze(X)
        self.is_discrete_ = analysis.is_discrete

        if analysis.x_dev is not None and n_samples <= _pallas_max_n():
            # all-continuous TPU-bound fit: the analysis sweep already
            # staged X on device — score from that copy (single upload)
            X = analysis.x_dev
        scores = self._score(X, y, analysis, n_select)
        if scores is None:  # algorithm-specific early-out already populated
            return self

        self.feature_importances_ = scores
        self.top_features_ = np.argsort(scores)[::-1][:n_select]
        return self

    def _score(self, X, y, analysis, n_select):  # pragma: no cover
        raise NotImplementedError

    @staticmethod
    def _is_device_array(X) -> bool:
        try:
            import jax
            return (isinstance(X, jax.Array)
                    and all(d.platform != "cpu" for d in X.devices()))
        except Exception:  # pragma: no cover
            return False

    def _fit_device(self, X, y):
        """HBM-resident fit: X stays on device end to end.

        All-discrete data scores straight from on-device state codes;
        pure-continuous data flows into the Pallas engine as a device
        array.  Mixed data falls back to one host round-trip (the hybrid
        engine splits columns host-side).
        """
        from ..utils.preprocessing import analyze_features_device_array

        if X.ndim != 2:
            raise ValueError("X must be 2-D")
        y = np.asarray(y)
        if y.shape[0] != X.shape[0]:
            raise ValueError(
                "X and y have inconsistent numbers of samples")
        if bool(_jitted_nan_check()(X)):
            raise ValueError("Input X contains NaN.")
        self.n_features_in_ = X.shape[1]
        n_select = self._validate_parameters(X.shape[0],
                                             self.n_features_in_)

        analysis = analyze_features_device_array(X, self.discrete_limit)
        self.is_discrete_ = analysis.is_discrete
        if analysis.is_discrete.any() and not analysis.is_discrete.all():
            X = np.asarray(X)  # mixed: hybrid splits columns host-side

        scores = self._score(X, y, analysis, n_select)
        if scores is None:
            return self
        self.feature_importances_ = scores
        self.top_features_ = np.argsort(scores)[::-1][:n_select]
        return self

    def _int_fast_analysis(self, X):
        """Encode-free analysis for small-non-negative-integer input
        (the GWAS genotype case): every column is discrete by
        construction (cardinality <= max+1 <= discrete_limit) and the
        raw values serve directly as state codes — no float32 copy, no
        per-column encode sweep, 4x less H2D.  Returns None when the
        fast path does not apply."""
        if not isinstance(X, np.ndarray) or X.ndim != 2 or X.size == 0:
            return None
        if not np.issubdtype(X.dtype, np.integer):
            return None
        mn, mx = int(X.min()), int(X.max())
        limit = int(getattr(self, "discrete_limit", 10))
        if mn < 0 or mx + 1 > min(limit, 127):
            return None
        p = X.shape[1]
        return FeatureAnalysis(
            np.ones(p, bool), np.ones(p, np.float32),
            codes=np.asarray(X, np.int8), n_states=mx + 1)

    def _staging_dtype(self, X) -> str | None:
        """H2D staging dtype for a TPU-bound fit.

        An explicit ``transfer_dtype`` always wins (pass 'float32' to
        force exact staging).  With the default ``None``, large float
        matrices in the p >> n regime auto-stage at float16: those fits
        are entirely H2D-transfer-bound (the engine runs in O(100 ms)
        while the f32 upload takes seconds at the ~40 MB/s link floor),
        and half-width staging halves the fit at a ~1e-3 relative cost
        in score precision (integer-valued discrete columns up to 2048
        are exact in f16, so discreteness detection is unaffected for
        ordinary coded data).  The policy is recorded in the fitted
        ``transfer_dtype_`` attribute."""
        td = getattr(self, "transfer_dtype", None)
        if td is None:
            n, p = X.shape
            if (X.size >= _AUTO_F16_MIN_ELEMS and p >= 4 * n
                    and np.issubdtype(X.dtype, np.floating)):
                td = "float16"
                if getattr(self, "verbose", False):
                    print("Auto-selected float16 H2D staging for this "
                          "transfer-bound p >> n fit (~1e-3 relative "
                          "score cost; pass transfer_dtype='float32' "
                          "for exact staging).")
        self.transfer_dtype_ = td or "float32"
        return td

    def _analyze(self, X) -> FeatureAnalysis:
        """Per-feature discreteness / ranges / state codes.

        Large inputs headed for a TPU use the single-device-sweep
        analyzer (the reference's per-column ``np.unique`` probe is a
        host hotspot at GWAS scale, ``MultiSURF.py:416-420``); small or
        CPU-bound fits keep the cheap vectorized host probe.

        Analysis dtype: TPU-bound fits analyse at float32 (the engines'
        compute dtype; the chip has no native f64), for every input
        size, so a dataset classifies features identically whether it
        takes the host or the device probe.  CPU fits analyse at the
        validated input dtype, matching the reference exactly.
        """
        tpu_bound = self.backend in ("auto", "tpu") and tpu_available()
        if X.size >= 1 << 22 and tpu_bound:
            return analyze_features_device(
                X, self.discrete_limit,
                transfer_dtype=self._staging_dtype(X))
        x_an = X.astype(np.float32, copy=False) if tpu_bound else X
        is_disc = detect_discrete_features(x_an, self.discrete_limit)
        return FeatureAnalysis(is_disc, compute_recip_ranges(x_an))

    def transform(self, X):
        """Reduce X to the selected top features."""
        check_is_fitted(self)
        X = validate_data(self, X, reset=False,
                          dtype=[np.float64, np.float32])
        return X[:, self.top_features_]

    def fit_transform(self, X, y):
        """Fit to data, then transform it."""
        self.fit(X, y)
        return self.transform(X)
