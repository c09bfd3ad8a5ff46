"""TuRF meta-estimator (reference ``TuRF.py:7-136``).

Iterative-elimination wrapper: fit the base estimator, drop the worst
``pct_remove`` fraction of remaining features (at least 1) each round, stop
at ``n_features_to_select`` or ``n_iterations``.  ``feature_importances_``
holds the FIRST full-set scores; ``top_features_`` is returned sorted
ascending by index (both reference-pinned behaviours, ``TuRF.py:87-88,
117-119``).

Wraps any estimator exposing ``feature_importances_`` after fit.  Supports
checkpoint/resume of the elimination loop MID-RUN: with
``checkpoint_path`` set, every iteration atomically persists
(active set, scores, iteration); a killed run re-fit with the same path
resumes from the last completed iteration instead of restarting (long
10k+-feature iterative runs are the long jobs; see SURVEY §5).
``save_state``/``load_state`` expose the same state dict in-memory.
"""

from __future__ import annotations

import os
import pickle
import tempfile

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
    checkpoint_path : str or None, default=None
        File path for per-iteration elimination-state snapshots.  Each
        round the loop state is written atomically; a subsequent
        ``fit`` on data with the same feature count resumes from the
        last completed iteration (the snapshot is deleted when the fit
        finishes).  Restart-based recovery for pod runs — see
        ``parallel.distributed``.

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
        checkpoint_path: str | None = None,
    ):
        self.estimator = estimator
        self.n_features_to_select = n_features_to_select
        self.pct_remove = pct_remove
        self.n_iterations = n_iterations
        self.verbose = verbose
        self.checkpoint_path = checkpoint_path

    def fit(self, X, y):
        """Run the iterative elimination loop."""
        # small-int input (genotypes) keeps its dtype end to end: the
        # wrapped Relief estimator's encode-free int8 fast path then
        # applies to every iteration (no float64 copy of a GWAS matrix)
        keep_int = (isinstance(X, np.ndarray)
                    and np.issubdtype(X.dtype, np.integer))
        X, y = validate_data(
            self, X, y, y_numeric=True,
            dtype="numeric" if keep_int else np.float64, ensure_2d=True,
        )
        self.n_features_in_ = X.shape[1]
        if not 0 < self.pct_remove < 1:
            raise ValueError("pct_remove must be between 0 and 1.")

        base = clone(self.estimator)
        scorer = self._make_fast_scorer(base, X, y)
        if scorer is not None:
            return self._fit_loop(X, y, None, scorer)
        return self._fit_loop(X, y, base, None)

    def _fit_loop(self, X, y, base, scorer):
        """Shared elimination loop.

        ``scorer(active) -> scores[len(active)]`` is the device-resident
        fast path; otherwise ``base.fit(X[:, active], y)`` re-validates
        and re-uploads every round (the reference's behaviour,
        ``TuRF.py:110-111``).

        With ``checkpoint_path`` set, the loop state is snapshotted
        after every scoring round, and a prior snapshot matching this
        dataset's feature count resumes the loop mid-elimination.
        """
        self._data_fp_ = self._data_fingerprint(X, y)
        resumed = self._load_checkpoint()
        if resumed is not None:
            active = np.asarray(resumed["active"])
            scores = np.asarray(resumed["scores"])
            self.feature_importances_ = np.asarray(
                resumed["feature_importances"])
            iteration = int(resumed["iteration"])
            if self.verbose:
                print(f"Resuming TuRF from iteration {iteration} "
                      f"({len(active)} features remaining).")
        else:
            active = np.arange(self.n_features_in_)
            if scorer is not None:
                scores = scorer(active)
            else:
                base.fit(X, y)
                scores = np.asarray(base.feature_importances_)
            self.feature_importances_ = scores.copy()
            iteration = 0
            self._write_checkpoint(active, scores, iteration)

        while True:
            if len(active) <= self.n_features_to_select:
                break
            if (self.n_iterations is not None
                    and iteration >= self.n_iterations):
                break

            n_remove = max(1, int(len(active) * self.pct_remove))
            if len(active) - n_remove < self.n_features_to_select:
                n_remove = len(active) - self.n_features_to_select

            worst = np.argsort(scores)[:n_remove]
            active = np.delete(active, worst)

            if self.verbose:
                print(f"Iteration {iteration}: {len(active)} features "
                      "remaining.")

            if scorer is not None:
                scores = scorer(active)
            else:
                base.fit(X[:, active], y)
                scores = np.asarray(base.feature_importances_)
            iteration += 1
            self._write_checkpoint(active, scores, iteration)

        order = np.argsort(scores)[::-1]
        self.top_features_ = np.sort(active[order])
        self._final_scores_ = scores
        self._active_ = active
        self._iteration_ = iteration
        if self.checkpoint_path and os.path.exists(self.checkpoint_path):
            os.remove(self.checkpoint_path)
        return self

    # -- per-iteration checkpoint plumbing ---------------------------------

    @staticmethod
    def _data_fingerprint(X, y) -> str:
        """Cheap dataset identity for checkpoint-resume validation:
        shapes/dtype plus a strided value sample (max ~64 KB read), so a
        stale snapshot from a different dataset with the same feature
        count cannot silently resume with wrong scores."""
        import hashlib

        X = np.asarray(X)
        y = np.asarray(y)
        h = hashlib.sha1()
        h.update(repr((X.shape, str(X.dtype), y.shape,
                       str(y.dtype))).encode())
        step = max(1, X.size // 8192)
        h.update(np.ascontiguousarray(X.reshape(-1)[::step]).tobytes())
        h.update(np.ascontiguousarray(y).tobytes())
        return h.hexdigest()

    def _state_dict(self, active, scores, iteration) -> dict:
        return {
            "active": np.asarray(active).copy(),
            "scores": np.asarray(scores).copy(),
            "feature_importances": np.asarray(
                self.feature_importances_).copy(),
            "n_features_in": int(self.n_features_in_),
            "data_fingerprint": getattr(self, "_data_fp_", None),
            "iteration": int(iteration),
        }

    def _write_checkpoint(self, active, scores, iteration) -> None:
        if not self.checkpoint_path:
            return
        # atomic write (tmp + rename in the target dir): a kill mid-dump
        # must never leave a truncated snapshot behind
        d = os.path.dirname(os.path.abspath(self.checkpoint_path))
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".turf.tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                pickle.dump(self._state_dict(active, scores, iteration), f)
            os.replace(tmp, self.checkpoint_path)
        except BaseException:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise

    def _load_checkpoint(self):
        """Mid-run state to resume from: an explicit ``load_state`` dict
        takes precedence, else a ``checkpoint_path`` snapshot matching
        this dataset's feature count."""
        state = getattr(self, "_resume_state_", None)
        self._resume_state_ = None
        if state is None and self.checkpoint_path and os.path.exists(
                self.checkpoint_path):
            with open(self.checkpoint_path, "rb") as f:
                state = pickle.load(f)
        if state is None:
            return None
        if int(state["n_features_in"]) != self.n_features_in_:
            return None  # different dataset: start fresh
        fp = state.get("data_fingerprint")
        if fp is not None and fp != getattr(self, "_data_fp_", None):
            return None  # same width, different data: start fresh
        return state

    def _make_fast_scorer(self, base, X, y):
        """Device-resident iteration fast path.

        The reference's kernels accept a ``feat_idx`` subset argument
        that TuRF never uses (``MultiSURF.py:16`` vs ``TuRF.py:110``);
        the TPU equivalent: when the base estimator is a Relief selector
        and every feature is discrete, encode X once, keep the codes in
        HBM, and re-run the SAME compiled discrete-MXU engine each round
        with dropped feature columns zeroed on device — a zeroed column
        always matches, contributing exactly 0 to distances and scores,
        identical to slicing it out.  No re-upload, no re-compile.

        Returns ``scorer(active_indices) -> scores[len(active)]`` or
        None when the fast path does not apply.
        """
        from ._relief_base import BaseReliefSelector
        from ..utils.backend import tpu_available, resolve_backend

        if not isinstance(base, BaseReliefSelector):
            return None
        backend = getattr(base, "backend", "auto")
        if backend not in ("auto", "tpu") or not tpu_available():
            return None
        limit = getattr(base, "discrete_limit", 10)
        # small-int X: every column is discrete by construction and raw
        # values are valid state codes (injective per-column coding) —
        # no discreteness probe, no float cast, no encode sweep
        small_int = (np.issubdtype(np.asarray(X).dtype, np.integer)
                     and X.size and int(np.min(X)) >= 0
                     and int(np.max(X)) + 1 <= min(int(limit), 127))
        if small_int:
            is_disc = np.ones(X.shape[1], bool)
        else:
            from ..utils.preprocessing import detect_discrete_features
            is_disc = detect_discrete_features(X, limit)
        if not is_disc.all():
            if not is_disc.any() and X.shape[0] <= 131072:
                return self._make_fast_continuous_scorer(base, X, y)
            return None

        algo = base._algo_name.lower()
        kwargs = {}
        if algo == "relieff":
            classes, y_enc = np.unique(y, return_inverse=True)
            if len(classes) < 2:
                return None
            kwargs["n_neighbors"] = base.n_neighbors
            kwargs["class_probs"] = (
                np.bincount(y_enc) / len(y)).astype(np.float32)
        else:
            _, y_enc = np.unique(y, return_inverse=True)
            kwargs["use_star"] = getattr(base, "use_star", False)

        import jax
        import jax.numpy as jnp
        from ..ops.relief_discrete import (encode_discrete,
                                           relief_discrete_scores,
                                           stage_codes_device)
        from ..utils.backend import default_device, execution_context

        resolve_backend(backend, "TuRF")  # raise early if tpu forced w/o
        device = default_device("tpu")
        if small_int:
            codes_np = np.asarray(X, np.int8)
            n_states = int(np.max(X)) + 1
        else:
            codes_np, n_states = encode_discrete(
                np.asarray(X, np.float32))
        with execution_context(device):
            # bit-packed H2D for small cardinalities (4x fewer bytes)
            codes_dev = stage_codes_device(codes_np, n_states)

        @jax.jit
        def mask_cols(c, m):
            return c * m[None, :]

        p = X.shape[1]
        y32 = y_enc.astype(np.int32)

        def scorer(active):
            mask = np.zeros((p,), np.int8)
            mask[active] = 1
            with execution_context(device):
                masked = mask_cols(codes_dev, jnp.asarray(mask))
            scores = relief_discrete_scores(
                None, y32, algo=algo, codes=masked, n_states=n_states,
                device=device, **kwargs)
            return scores[active]

        return scorer

    def _make_fast_continuous_scorer(self, base, X, y):
        """Pure-continuous twin of the discrete fast path: per-feature
        range reciprocals are independent of which other columns are
        active, so a dropped feature is masked by zeroing its reciprocal
        (its scaled-L1 diffs become exactly 0 — identical to slicing it
        out) while X stays HBM-resident across iterations."""
        import jax
        import numpy as np
        from ..ops.relief_pallas import relief_pallas_scores
        from ..utils.backend import default_device, execution_context
        from ..utils.preprocessing import compute_recip_ranges

        algo = base._algo_name.lower()
        kwargs = {}
        if algo == "relieff":
            classes, y_enc = np.unique(y, return_inverse=True)
            if len(classes) < 2:
                return None
            kwargs["n_neighbors"] = base.n_neighbors
            kwargs["class_probs"] = (
                np.bincount(y_enc) / len(y)).astype(np.float32)
        else:
            _, y_enc = np.unique(y, return_inverse=True)
            kwargs["use_star"] = getattr(base, "use_star", False)

        device = default_device("tpu")
        X32 = np.asarray(X, np.float32)
        recip = compute_recip_ranges(X32)
        with execution_context(device):
            Xd = jax.device_put(X32)
        p = X.shape[1]
        disc = np.zeros((p,), bool)
        y32 = y_enc.astype(np.int32)

        def scorer(active):
            recip_m = np.zeros((p,), np.float32)
            recip_m[active] = recip[active]
            scores = relief_pallas_scores(
                Xd, y32, recip_m, disc, algo=algo, device=device,
                **kwargs)
            return scores[active]

        return scorer

    # -- checkpoint/resume of the elimination loop (TPU-build addition) ----

    def save_state(self) -> dict:
        """Snapshot the fitted elimination state (picklable).

        The dict has the same schema as the per-iteration
        ``checkpoint_path`` snapshots, plus ``complete=True``.
        """
        check_is_fitted(self)
        state = self._state_dict(self._active_, self._final_scores_,
                                 getattr(self, "_iteration_", 0))
        state["complete"] = True
        return state

    def load_state(self, state: dict):
        """Restore a snapshot.

        A finished-fit snapshot (``complete=True``, from
        :meth:`save_state`) restores the fitted attributes directly.  A
        mid-run snapshot (a ``checkpoint_path`` file's contents) is
        staged so the NEXT :meth:`fit` call resumes the elimination loop
        from that iteration instead of restarting.
        """
        if not state.get("complete", False):
            self._resume_state_ = dict(state)
            return self
        self._active_ = np.asarray(state["active"])
        self._final_scores_ = np.asarray(state["scores"])
        self.feature_importances_ = np.asarray(state["feature_importances"])
        self.n_features_in_ = int(state["n_features_in"])
        self._iteration_ = int(state.get("iteration", 0))
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
