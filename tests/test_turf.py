import numpy as np
import pytest
from numpy.testing import assert_array_equal
from sklearn.base import BaseEstimator

from fastselect_tpu import TuRF, MultiSURF


class MockScorer(BaseEstimator):
    """Deterministic importances: feature j scores j (ascending)."""

    def fit(self, X, y):
        self.feature_importances_ = np.linspace(
            0, 1, X.shape[1], dtype=np.float64)
        self.n_features_in_ = X.shape[1]
        return self


@pytest.fixture
def data(rng):
    X = rng.rand(20, 10)
    y = rng.randint(0, 2, 20)
    return X, y


def test_selects_last_features_with_mock(data):
    X, y = data
    # MockScorer ranks higher indices higher, so elimination keeps the tail.
    t = TuRF(MockScorer(), n_features_to_select=3, pct_remove=0.2).fit(X, y)
    assert_array_equal(t.top_features_, [7, 8, 9])


def test_feature_importances_are_first_round(data):
    X, y = data
    t = TuRF(MockScorer(), n_features_to_select=4, pct_remove=0.25).fit(X, y)
    assert t.feature_importances_.shape == (10,)
    assert_array_equal(t.feature_importances_,
                       np.linspace(0, 1, 10))


def test_n_iterations_cap(data):
    X, y = data
    t = TuRF(MockScorer(), n_features_to_select=2, pct_remove=0.1,
             n_iterations=1).fit(X, y)
    # One iteration removes max(1, int(10*0.1)) = 1 feature -> 9 remain.
    assert len(t._active_) == 9


def test_overshoot_clamp(data):
    X, y = data
    t = TuRF(MockScorer(), n_features_to_select=9, pct_remove=0.9).fit(X, y)
    assert len(t.top_features_) == 9


def test_invalid_pct_remove(data):
    X, y = data
    for bad in (0.0, 1.0, -0.5, 2.0):
        with pytest.raises(ValueError, match="pct_remove"):
            TuRF(MockScorer(), pct_remove=bad).fit(X, y)


def test_top_features_sorted_ascending(data):
    X, y = data
    t = TuRF(MockScorer(), n_features_to_select=4, pct_remove=0.3).fit(X, y)
    assert_array_equal(t.top_features_, np.sort(t.top_features_))


def test_transform_shape(data):
    X, y = data
    t = TuRF(MockScorer(), n_features_to_select=5, pct_remove=0.2).fit(X, y)
    assert t.transform(X).shape == (20, 5)


def test_verbose(data, capsys):
    X, y = data
    TuRF(MockScorer(), n_features_to_select=8, pct_remove=0.1,
         verbose=True).fit(X, y)
    assert "features remaining" in capsys.readouterr().out


def test_with_real_multisurf(rng):
    n = 30
    y = np.repeat([0, 1], n // 2)
    X = rng.rand(n, 8).astype(np.float32)
    X[:, 4] = np.where(y == 0, 0.0, 3.0) + rng.randn(n) * 0.2
    t = TuRF(MultiSURF(n_features_to_select=2, backend="cpu"),
             n_features_to_select=2, pct_remove=0.3).fit(X, y)
    assert 4 in t.top_features_


def test_checkpoint_roundtrip(data):
    X, y = data
    t = TuRF(MockScorer(), n_features_to_select=4, pct_remove=0.2).fit(X, y)
    state = t.save_state()
    t2 = TuRF(MockScorer(), n_features_to_select=4).load_state(state)
    assert_array_equal(t2.top_features_, t.top_features_)
    assert t2.transform(X).shape == t.transform(X).shape


def test_transform_before_fit_raises(data):
    from sklearn.exceptions import NotFittedError
    X, y = data
    with pytest.raises(NotFittedError):
        TuRF(MockScorer(), n_features_to_select=2).transform(X)


def test_transform_incorrect_dimensions(data):
    X, y = data
    t = TuRF(MockScorer(), n_features_to_select=2).fit(X, y)
    with pytest.raises(ValueError):
        t.transform(X[:, :-1])


# ---------------------------------------------------------------------------
# Mid-run checkpoint / resume (TPU-build addition: per-iteration snapshots
# let long elimination runs survive a killed process — SURVEY §5)
# ---------------------------------------------------------------------------

class CountingScorer(MockScorer):
    """MockScorer that counts fits and can die after `die_after` fits."""

    def __init__(self, die_after=None):
        self.die_after = die_after
        self.n_fits = 0

    def fit(self, X, y):
        self.n_fits += 1
        if self.die_after is not None and self.n_fits > self.die_after:
            raise RuntimeError("simulated crash")
        return super().fit(X, y)

    # die_after/n_fits are test plumbing, not sklearn params: keep clone
    # from resetting the counter mid-test
    def __sklearn_clone__(self):
        return self


def test_kill_and_resume_identical_selection(data, tmp_path):
    X, y = data
    ckpt = str(tmp_path / "turf.ckpt")
    kw = dict(n_features_to_select=2, pct_remove=0.15)

    reference = TuRF(MockScorer(), **kw).fit(X, y)

    dying = CountingScorer(die_after=3)
    with pytest.raises(RuntimeError, match="simulated crash"):
        TuRF(dying, checkpoint_path=ckpt, **kw).fit(X, y)
    assert (tmp_path / "turf.ckpt").exists()  # snapshot survived the kill

    resumer = CountingScorer()
    t = TuRF(resumer, checkpoint_path=ckpt, **kw).fit(X, y)
    assert_array_equal(t.top_features_, reference.top_features_)
    assert_array_equal(t.feature_importances_,
                       reference.feature_importances_)
    # the resumed run re-ran only the remaining iterations, not all of
    # them (3 scoring rounds already happened before the crash)
    full_fits = CountingScorer()
    TuRF(full_fits, checkpoint_path=str(tmp_path / "other.ckpt"),
         **kw).fit(X, y)
    assert resumer.n_fits == full_fits.n_fits - 3
    # successful fits clean their snapshot up
    assert not (tmp_path / "turf.ckpt").exists()


def test_checkpoint_ignored_for_different_dataset(data, tmp_path):
    X, y = data
    ckpt = str(tmp_path / "turf.ckpt")
    dying = CountingScorer(die_after=1)
    with pytest.raises(RuntimeError):
        TuRF(dying, checkpoint_path=ckpt, n_features_to_select=2,
             pct_remove=0.15).fit(X, y)
    X2 = np.concatenate([X, X], axis=1)  # different feature count
    t = TuRF(MockScorer(), checkpoint_path=ckpt, n_features_to_select=2,
             pct_remove=0.15).fit(X2, y)
    assert t.n_features_in_ == X2.shape[1]


def test_load_state_midrun_resumes_next_fit(data, tmp_path):
    X, y = data
    ckpt = str(tmp_path / "turf.ckpt")
    kw = dict(n_features_to_select=3, pct_remove=0.2)
    with pytest.raises(RuntimeError):
        TuRF(CountingScorer(die_after=2), checkpoint_path=ckpt,
             **kw).fit(X, y)
    import pickle
    with open(ckpt, "rb") as f:
        state = pickle.load(f)
    assert "iteration" in state and not state.get("complete", False)

    reference = TuRF(MockScorer(), **kw).fit(X, y)
    t = TuRF(MockScorer(), **kw).load_state(state).fit(X, y)
    assert_array_equal(t.top_features_, reference.top_features_)


def test_turf_keeps_small_int_dtype(data):
    """Small-int genotype X must flow through TuRF without a float64
    copy (the wrapped Relief estimator's encode-free path applies)."""
    X, y = data
    Xi = (X * 3).astype(np.int8)

    class DtypeSpy(MockScorer):
        seen = []

        def fit(self, X, y):
            DtypeSpy.seen.append(X.dtype)
            return super().fit(X, y)

    TuRF(DtypeSpy(), n_features_to_select=4, pct_remove=0.25).fit(Xi, y)
    assert all(np.issubdtype(d, np.integer) for d in DtypeSpy.seen)

    ref = TuRF(MockScorer(), n_features_to_select=4,
               pct_remove=0.25).fit(Xi.astype(np.float64), y)
    t = TuRF(MockScorer(), n_features_to_select=4,
             pct_remove=0.25).fit(Xi, y)
    np.testing.assert_array_equal(t.top_features_, ref.top_features_)


def test_checkpoint_ignored_for_same_width_different_data(data, tmp_path):
    """A stale snapshot from a dataset with the SAME feature count must
    not resume: the dataset fingerprint rejects it (ADVICE r2)."""
    X, y = data
    ckpt = str(tmp_path / "turf.ckpt")
    kw = dict(n_features_to_select=2, pct_remove=0.15)
    with pytest.raises(RuntimeError):
        TuRF(CountingScorer(die_after=1), checkpoint_path=ckpt,
             **kw).fit(X, y)
    X2 = X + 1.0  # same shape, different values
    fresh = CountingScorer()
    t = TuRF(fresh, checkpoint_path=ckpt, **kw).fit(X2, y)
    full = CountingScorer()
    TuRF(full, checkpoint_path=str(tmp_path / "o.ckpt"), **kw).fit(X2, y)
    assert fresh.n_fits == full.n_fits  # started from scratch
    reference = TuRF(MockScorer(), **kw).fit(X2, y)
    assert_array_equal(t.top_features_, reference.top_features_)
