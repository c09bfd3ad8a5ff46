import math

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from fastselect_tpu import MDR
from fastselect_tpu.models.mdr import MAX_K_FOR_KERNEL
from fastselect_tpu.ops.mdr_op import batch_balanced_accuracy

from oracles import mdr_balanced_accuracy


@pytest.fixture(scope="module")
def epistasis_data():
    """XOR-style 2-SNP interaction: risk iff both genotypes are 2."""
    X = np.array([
        [2, 2], [2, 2], [2, 0], [0, 2],
        [0, 0], [1, 1], [1, 0], [0, 1],
    ], dtype=np.uint8)
    y = np.array([1, 1, 0, 0, 0, 0, 0, 0], dtype=np.uint8)
    return X, y


def test_finds_interaction(epistasis_data):
    X, y = epistasis_data
    clf = MDR(k=2, cv=2, backend="cpu").fit(X, y)
    assert clf.best_interaction_ == (0, 1)
    assert clf.best_cvc_ == 2
    assert math.isclose(clf.best_mean_testing_ba_, 1.0, abs_tol=1e-6)


def test_predict(epistasis_data):
    X, y = epistasis_data
    clf = MDR(k=2, cv=2, backend="cpu").fit(X, y)
    assert_array_equal(clf.predict(X), y)
    assert clf.transform(X).shape == (len(y), 1)


def test_kernel_matches_oracle(rng):
    n, p, k = 80, 6, 2
    X = rng.randint(0, 3, (n, p)).astype(np.int32)
    y = rng.randint(0, 2, n).astype(np.uint8)
    from itertools import combinations
    combos = np.array(list(combinations(range(p), k)), np.int32)
    got = batch_balanced_accuracy(X, y, combos, k)
    expected = np.array([mdr_balanced_accuracy(X, y, tuple(c))
                         for c in combos])
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_kernel_matches_oracle_k3(rng):
    n, p, k = 50, 5, 3
    X = rng.randint(0, 3, (n, p)).astype(np.int32)
    y = rng.randint(0, 2, n).astype(np.uint8)
    from itertools import combinations
    combos = np.array(list(combinations(range(p), k)), np.int32)
    got = batch_balanced_accuracy(X, y, combos, k)
    expected = np.array([mdr_balanced_accuracy(X, y, tuple(c))
                         for c in combos])
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_multiclass_raises(rng):
    X = rng.randint(0, 3, (30, 4)).astype(np.uint8)
    y = rng.randint(0, 3, 30)
    with pytest.raises(ValueError, match="binary"):
        MDR(backend="cpu").fit(X, y)


def test_bad_genotypes_raise(rng):
    X = rng.randint(0, 5, (30, 4)).astype(np.uint8)
    y = rng.randint(0, 2, 30)
    with pytest.raises(ValueError, match="0/1/2"):
        MDR(backend="cpu").fit(X, y)


def test_k_too_large(rng):
    X = rng.randint(0, 3, (30, 4)).astype(np.uint8)
    y = rng.randint(0, 2, 30)
    with pytest.raises(ValueError, match="MAX_K_FOR_KERNEL"):
        MDR(k=MAX_K_FOR_KERNEL + 1, backend="cpu").fit(X, y)
    with pytest.raises(ValueError, match="n_features"):
        MDR(k=5, cv=2, backend="cpu").fit(X, y)


def test_gpu_backend_raises(epistasis_data):
    X, y = epistasis_data
    with pytest.raises(RuntimeError):
        MDR(backend="gpu").fit(X, y)


def test_predict_proba_not_implemented(epistasis_data):
    X, y = epistasis_data
    clf = MDR(k=2, cv=2, backend="cpu").fit(X, y)
    with pytest.raises(NotImplementedError):
        clf.predict_proba(X)


def test_verbose(epistasis_data, capsys):
    X, y = epistasis_data
    MDR(k=2, cv=2, backend="cpu", verbose=True).fit(X, y)
    out = capsys.readouterr().out
    assert "Fit Complete" in out and "Best interaction" in out


# -- property-based: public predict == private LUT predict (reference
# test_mdr.py:135-150 pattern, hypothesis-generated genotype matrices) --
try:
    from hypothesis import given, settings, strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=10, deadline=None)
    @given(
        X=arrays(np.uint8, (20, 4), elements=st.integers(0, 2)),
        y=arrays(np.int64, (20,), elements=st.integers(0, 1)),
    )
    def test_predict_equals_internal_lut(X, y):
        if len(np.unique(y)) < 2:
            return
        from fastselect_tpu import MDR

        m = MDR(k=2, cv=2)
        m.fit(X, y)
        expected = m._internal_predict(
            X, m.best_interaction_, m.best_model_lookup_table_)
        np.testing.assert_array_equal(m.predict(X), expected)
except ImportError:  # pragma: no cover
    pass


# -- round 4: chunk-outer/fold-inner search machinery --------------------

def test_unrank_combos_matches_itertools():
    from itertools import combinations

    from fastselect_tpu.ops.mdr_op import unrank_combos

    for p, k in [(5, 1), (6, 2), (9, 3), (10, 4), (7, 6)]:
        expected = np.array(list(combinations(range(p), k)), np.int32)
        got = unrank_combos(p, k, 0, expected.shape[0])
        assert_array_equal(got, expected)
        # arbitrary interior window
        r0, r1 = expected.shape[0] // 3, 2 * expected.shape[0] // 3
        assert_array_equal(unrank_combos(p, k, r0, r1), expected[r0:r1])


def test_fold_scorer_matches_per_fold_batch():
    from itertools import combinations

    from fastselect_tpu.ops.mdr_op import MDRFoldScorer

    rng = np.random.RandomState(3)
    X = rng.randint(0, 3, (40, 7)).astype(np.int32)
    y = rng.randint(0, 2, 40)
    y[:4] = [0, 1, 0, 1]
    combos = np.array(list(combinations(range(7), 2)), np.int32)

    folds = [np.arange(0, 30), np.arange(10, 40), np.arange(0, 40, 2)]
    w_case = np.zeros((3, 40), np.float32)
    w_ctrl = np.zeros((3, 40), np.float32)
    for f, tr in enumerate(folds):
        w_case[f, tr] = (y[tr] == 1)
        w_ctrl[f, tr] = (y[tr] != 1)

    got = MDRFoldScorer(X, w_case, w_ctrl, 2)(combos)
    assert got.shape == (3, combos.shape[0])
    for f, tr in enumerate(folds):
        expected = batch_balanced_accuracy(X[tr], y[tr], combos, 2)
        np.testing.assert_allclose(got[f], expected, atol=1e-6)


def test_sharded_fold_scorer_matches_single():
    from itertools import combinations

    from fastselect_tpu.ops.mdr_op import MDRFoldScorer
    from fastselect_tpu.parallel import ShardedMDRFoldScorer

    rng = np.random.RandomState(7)
    X = rng.randint(0, 3, (30, 8)).astype(np.int32)
    y = rng.randint(0, 2, 30)
    y[:2] = [0, 1]
    combos = np.array(list(combinations(range(8), 3)), np.int32)
    w_case = np.zeros((2, 30), np.float32)
    w_ctrl = np.zeros((2, 30), np.float32)
    w_case[0, :20] = (y[:20] == 1)
    w_ctrl[0, :20] = (y[:20] != 1)
    w_case[1, 10:] = (y[10:] == 1)
    w_ctrl[1, 10:] = (y[10:] != 1)

    single = MDRFoldScorer(X, w_case, w_ctrl, 3)(combos)
    sharded = ShardedMDRFoldScorer(X, w_case, w_ctrl, 3)(combos)
    np.testing.assert_allclose(sharded, single, atol=1e-6)


def test_device_unrank_matches_host():
    import jax.numpy as jnp

    from fastselect_tpu.ops.mdr_op import (_comb_tables, _unrank_device,
                                           unrank_combos)

    for p, k in [(9, 3), (12, 4), (7, 2)]:
        tables = jnp.asarray(_comb_tables(p, k))
        n = math.comb(p, k)
        ranks = jnp.arange(n, dtype=jnp.int32)
        got = np.asarray(_unrank_device(ranks, tables, k=k))
        assert_array_equal(got, unrank_combos(p, k, 0, n))


def test_search_all_matches_chunked_scorer():
    from itertools import combinations

    from fastselect_tpu.ops.mdr_op import MDRFoldScorer

    rng = np.random.RandomState(11)
    p, k = 9, 3
    X = rng.randint(0, 3, (50, p)).astype(np.int32)
    y = rng.randint(0, 2, 50)
    y[:2] = [0, 1]
    w_case = np.zeros((2, 50), np.float32)
    w_ctrl = np.zeros((2, 50), np.float32)
    w_case[0, :40] = (y[:40] == 1)
    w_ctrl[0, :40] = (y[:40] != 1)
    w_case[1, 5:] = (y[5:] == 1)
    w_ctrl[1, 5:] = (y[5:] != 1)
    sc = MDRFoldScorer(X, w_case, w_ctrl, k)
    combos = np.array(list(combinations(range(p), k)), np.int32)
    bas = sc(combos)
    n_combos = combos.shape[0]
    # tiny chunk forces multiple streamed ranges
    vals, ranks = sc.search_all(p, n_combos, chunk=16)
    for f in range(2):
        assert vals[f] == bas[f].max()
        assert ranks[f] == int(bas[f].argmax())  # first-max tie-break


def test_sharded_search_all_matches_single():
    from fastselect_tpu.ops.mdr_op import MDRFoldScorer
    from fastselect_tpu.parallel import ShardedMDRFoldScorer

    rng = np.random.RandomState(13)
    p, k = 10, 3
    X = rng.randint(0, 3, (40, p)).astype(np.int32)
    y = rng.randint(0, 2, 40)
    y[:2] = [0, 1]
    w_case = np.zeros((3, 40), np.float32)
    w_ctrl = np.zeros((3, 40), np.float32)
    for f, sl in enumerate((slice(0, 30), slice(10, 40), slice(0, 40, 2))):
        w_case[f, sl] = (y[sl] == 1)
        w_ctrl[f, sl] = (y[sl] != 1)
    n_combos = math.comb(p, k)
    sv, sr = MDRFoldScorer(X, w_case, w_ctrl, k).search_all(
        p, n_combos, chunk=16)
    gv, gr = ShardedMDRFoldScorer(X, w_case, w_ctrl, k).search_all(
        p, n_combos, chunk=16)
    np.testing.assert_allclose(gv, sv, atol=1e-6)
    assert_array_equal(gr, sr)


def test_exact_selection_key_matches_f64_oracle():
    """Device search ranks combos by the exact integer key tp*N + tn*P,
    which must order identically to f64 balanced accuracy (P, N are
    combo-independent per fold) — the PARITY.md precision contract."""
    from itertools import combinations

    from fastselect_tpu.ops.mdr_op import MDRFoldScorer

    rng = np.random.RandomState(7)
    p, k = 8, 2
    n = 60
    X = rng.randint(0, 3, (n, p)).astype(np.int32)
    y = rng.randint(0, 2, n)
    y[:2] = [0, 1]
    w_case = np.zeros((2, n), np.float32)
    w_ctrl = np.zeros((2, n), np.float32)
    w_case[0, :50] = (y[:50] == 1)
    w_ctrl[0, :50] = (y[:50] != 1)
    w_case[1, 10:] = (y[10:] == 1)
    w_ctrl[1, 10:] = (y[10:] != 1)

    combos = np.array(list(combinations(range(p), k)), np.int32)
    n_combos = combos.shape[0]
    sc = MDRFoldScorer(X, w_case, w_ctrl, k)
    assert sc.exact
    _, ranks = sc.search_all(p, n_combos, chunk=8)

    # f64 host oracle with the reference's high-risk rule (MDR.py:66-70)
    for f in range(2):
        case_w = w_case[f].astype(np.float64)
        ctrl_w = w_ctrl[f].astype(np.float64)
        P, N = case_w.sum(), ctrl_w.sum()
        best_ba, best_r = -1.0, -1
        for r, cmb in enumerate(combos):
            cells = (X[:, cmb] * (3 ** np.arange(k - 1, -1, -1))).sum(1)
            case = np.bincount(cells, weights=case_w, minlength=9)
            ctrl = np.bincount(cells, weights=ctrl_w, minlength=9)
            high = (ctrl == 0) | (case / np.maximum(ctrl, 1e-30) > P / N)
            ba = (case[high].sum() / P + ctrl[~high].sum() / N) / 2
            if ba > best_ba:  # strict >: first-in-lex-order tie-break
                best_ba, best_r = ba, r
        assert ranks[f] == best_r
