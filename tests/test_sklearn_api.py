"""sklearn API compliance and persistence.

The reference runs ``check_estimator`` on the Relief family and TuRF
(``test_relieff.py:66-72``, ``test_turf.py:25-31`` upstream) — it drags
in dozens of behaviours (clone, get/set_params, validation error
messages, ``n_features_in_`` checks).  Fitted estimators must also
pickle round-trip (SURVEY.md §5 checkpoint/resume: fitted state is plain
picklable attributes)."""

import pickle

import numpy as np
import pytest
from numpy.testing import assert_array_equal
from sklearn.utils.estimator_checks import check_estimator

from fastselect_tpu import (MultiSURF, ReliefF, SURF, TuRF, mRMR, CFS,
                            MDR)


@pytest.mark.parametrize("est", [
    MultiSURF(backend="cpu"),
    SURF(backend="cpu"),
    ReliefF(n_neighbors=2, backend="cpu"),
    TuRF(MultiSURF(backend="cpu"), n_features_to_select=1),
], ids=["MultiSURF", "SURF", "ReliefF", "TuRF"])
def test_check_estimator(est):
    check_estimator(est)


@pytest.mark.parametrize("est", [
    MultiSURF(backend="cpu"),
    SURF(backend="cpu"),
    ReliefF(n_neighbors=2, backend="cpu"),
    TuRF(MultiSURF(backend="cpu"), n_features_to_select=1),
], ids=["MultiSURF", "SURF", "ReliefF", "TuRF"])
def test_clone_and_params_contract(est, rng):
    """The high-value subset of check_estimator behaviours, run fast:
    clone/get_params/set_params round-trip and fitted-attribute reset."""
    from sklearn.base import clone

    params = est.get_params(deep=False)
    cloned = clone(est)
    assert type(cloned) is type(est)
    for k, v in params.items():
        got = cloned.get_params(deep=False)[k]
        if hasattr(v, "get_params"):  # nested estimators deep-copy
            assert type(got) is type(v)
        else:
            assert got is v or got == v
    est2 = clone(est).set_params(**params)
    X = rng.rand(30, 6)
    y = rng.randint(0, 2, 30)
    est2.fit(X, y)
    assert est2.n_features_in_ == 6
    with pytest.raises(ValueError):
        est2.transform(rng.rand(30, 7))  # feature-count mismatch


@pytest.mark.parametrize("make", [
    lambda: MultiSURF(n_features_to_select=3, backend="cpu"),
    lambda: SURF(n_features_to_select=3, backend="cpu"),
    lambda: ReliefF(n_features_to_select=3, n_neighbors=3, backend="cpu"),
    lambda: mRMR(n_features_to_select=3),
    lambda: CFS(),
], ids=["MultiSURF", "SURF", "ReliefF", "mRMR", "CFS"])
def test_pickle_roundtrip(make, rng):
    X = rng.randint(0, 4, (40, 8)).astype(np.float64)
    y = rng.randint(0, 2, 40)
    est = make().fit(X, y)
    clone = pickle.loads(pickle.dumps(est))
    assert_array_equal(clone.transform(X), est.transform(X))


def test_pickle_roundtrip_mdr(rng):
    X = rng.randint(0, 3, (50, 6)).astype(np.uint8)
    y = rng.randint(0, 2, 50)
    est = MDR(k=2, cv=3).fit(X, y)
    clone = pickle.loads(pickle.dumps(est))
    assert_array_equal(clone.predict(X), est.predict(X))
