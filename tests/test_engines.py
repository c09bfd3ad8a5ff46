"""Cross-engine parity: the discrete MXU engine and the fused Pallas
kernels must reproduce the generic XLA engine (which is itself pinned to
the reference CPU semantics by the oracle tests) bit-for-bit in ranking
and to float tolerance in scores."""

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from fastselect_tpu.ops.relief import pack_chunks, _relief_engine
from fastselect_tpu.ops.relief_discrete import (
    relief_discrete_scores, encode_discrete)
from fastselect_tpu.ops.relief_pallas import relief_pallas_scores


def _generic_scores(x, y, recip, disc, algo, star, k, cp):
    n, p = x.shape
    xf, yv, valid, recipf, discf, (t, cj) = pack_chunks(x, y, recip, disc)
    out = _relief_engine(
        xf, yv, valid, recipf, discf, np.float32(n), cp,
        algo=algo, use_star=star, k=k, t=t, cj=cj)
    return np.asarray(out, np.float32)[:p] / n


CASES = [("multisurf", False, 0, 2), ("multisurf", True, 0, 2),
         ("surf", False, 0, 2), ("surf", True, 0, 3),
         ("relieff", False, 5, 3)]


@pytest.mark.parametrize("algo,star,k,ncls", CASES)
def test_discrete_engine_matches_generic(algo, star, k, ncls, rng):
    n, p = 61, 37
    x = rng.randint(0, 3, (n, p)).astype(np.float32)
    y = rng.randint(0, ncls, n).astype(np.int32)
    x[:, 0] = y % 3  # informative feature
    cp = np.bincount(y, minlength=ncls).astype(np.float32) / n
    ref = _generic_scores(x, y, np.ones(p, np.float32),
                          np.ones(p, bool), algo, star, k, cp)
    got = relief_discrete_scores(x, y, algo=algo, use_star=star,
                                 n_neighbors=k, class_probs=cp)
    assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    assert_array_equal(np.argsort(got), np.argsort(ref))


def test_encode_discrete_ranks_and_chunking(rng):
    # values deliberately non-contiguous and per-column distinct
    x = np.array([[3.5, 10.0], [3.5, -2.0], [7.0, 10.0], [-1.0, -2.0]],
                 np.float32)
    codes, s = encode_discrete(x, f_chunk=1)
    assert s == 3
    assert_array_equal(codes[:, 0], [1, 1, 2, 0])
    assert_array_equal(codes[:, 1], [1, 0, 1, 0])


def test_discrete_engine_streamed_blocks_match(rng):
    """Host-streamed per-block dispatch (>=16 focal blocks) must match
    the monolithic engine."""
    n, p = 160, 23
    codes = rng.randint(0, 3, (n, p)).astype(np.int8)
    y = rng.randint(0, 2, n).astype(np.int32)
    mono = relief_discrete_scores(None, y, algo="multisurf",
                                  codes=codes, n_states=3)
    streamed = relief_discrete_scores(None, y, algo="multisurf",
                                      codes=codes, n_states=3, ti=8)
    assert_allclose(streamed, mono, atol=1e-6)


def test_discrete_engine_precomputed_codes(rng):
    n, p = 48, 23
    codes = rng.randint(0, 3, (n, p)).astype(np.int8)
    y = rng.randint(0, 2, n).astype(np.int32)
    via_x = relief_discrete_scores(codes.astype(np.float32), y,
                                   algo="multisurf")
    via_codes = relief_discrete_scores(None, y, algo="multisurf",
                                       codes=codes, n_states=3)
    assert_allclose(via_x, via_codes, atol=1e-7)


def _tpu_present():
    import jax
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:  # pragma: no cover
        return False


@pytest.mark.skipif(not _tpu_present(),
                    reason="Pallas TPU kernels need a real TPU; the "
                    "interpreter path is exercised by scripts/ manually "
                    "(mirrors the reference's skip-gated GPU consistency "
                    "tests, SURVEY.md §4.5)")
@pytest.mark.parametrize("algo,star,k,ncls", CASES)
def test_pallas_kernels_match_generic(algo, star, k, ncls, rng):
    n, p = 300, 200
    x = rng.rand(n, p).astype(np.float32)
    x[:, :40] = rng.randint(0, 3, (n, 40))  # mixed discrete + continuous
    y = rng.randint(0, ncls, n).astype(np.int32)
    disc = np.zeros(p, bool)
    disc[:40] = True
    recip = (1.0 / np.maximum(x.max(0) - x.min(0), 1e-9)).astype(np.float32)
    cp = np.bincount(y, minlength=ncls).astype(np.float32) / n
    ref = _generic_scores(x, y, recip, disc, algo, star, k, cp)
    got = relief_pallas_scores(x, y, recip, disc, algo=algo, use_star=star,
                               n_neighbors=k, class_probs=cp)
    assert_allclose(got, ref, atol=1e-4)
    assert_array_equal(np.argsort(got), np.argsort(ref))


@pytest.mark.skipif(not _tpu_present(),
                    reason="hybrid engine runs Pallas kernels (TPU only)")
@pytest.mark.parametrize("algo,star,k,ncls", CASES)
def test_hybrid_engine_matches_generic(algo, star, k, ncls, rng):
    from fastselect_tpu.ops.relief_hybrid import relief_hybrid_scores

    n, p = 300, 96
    x = rng.rand(n, p).astype(np.float32)
    x[:, :40] = rng.randint(0, 3, (n, 40))
    x[:, 60:70] = rng.randint(0, 5, (n, 10))
    y = rng.randint(0, ncls, n).astype(np.int32)
    disc = np.zeros(p, bool)
    disc[:40] = True
    disc[60:70] = True
    recip = (1.0 / np.maximum(x.max(0) - x.min(0), 1e-9)).astype(np.float32)
    cp = np.bincount(y, minlength=ncls).astype(np.float32) / n
    ref = _generic_scores(x, y, recip, disc, algo, star, k, cp)
    got = relief_hybrid_scores(x, y, recip, disc, algo=algo, use_star=star,
                               n_neighbors=k, class_probs=cp)
    assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
    assert_array_equal(np.argsort(got), np.argsort(ref))


@pytest.mark.skipif(not _tpu_present(),
                    reason="device-resident TuRF fast path needs a TPU")
def test_turf_fast_path_matches_generic_loop(rng):
    """Zero-masked device-resident iterations must reproduce the
    reference column-slicing loop exactly (same eliminations, same
    final selection)."""
    from fastselect_tpu import TuRF, MultiSURF

    n, p = 200, 64
    X = rng.randint(0, 3, (n, p)).astype(np.float64)
    y = rng.randint(0, 2, n)
    X[:, 5] = y * 2
    X[:, 11] = (y + rng.randint(0, 2, n)).clip(0, 2)

    fast = TuRF(MultiSURF(), n_features_to_select=8, pct_remove=0.25)
    fast.fit(X, y)
    slow = TuRF(MultiSURF(backend="cpu"), n_features_to_select=8,
                pct_remove=0.25)
    slow.fit(X, y)
    assert_array_equal(fast.top_features_, slow.top_features_)
    assert_allclose(fast.feature_importances_, slow.feature_importances_,
                    rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not _tpu_present(),
                    reason="continuous TuRF fast path needs a TPU")
def test_turf_continuous_fast_path_matches_generic_loop(rng):
    from fastselect_tpu import TuRF, MultiSURF

    n, p = 220, 48
    X = rng.rand(n, p)
    y = rng.randint(0, 2, n)
    X[:, 7] += y * 0.8

    fast = TuRF(MultiSURF(), n_features_to_select=6, pct_remove=0.3)
    fast.fit(X, y)
    slow = TuRF(MultiSURF(backend="cpu"), n_features_to_select=6,
                pct_remove=0.3)
    slow.fit(X, y)
    assert_array_equal(fast.top_features_, slow.top_features_)
    assert_allclose(fast.feature_importances_, slow.feature_importances_,
                    rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not _tpu_present(),
                    reason="HBM-resident fit path needs a TPU")
def test_device_array_fit_matches_host_fit(rng):
    """fit(X) with X already a device array must give the same model as
    the host-array path (and never round-trip X for pure cases)."""
    import jax
    from fastselect_tpu import MultiSURF, ReliefF

    # all-discrete
    Xd_host = rng.randint(0, 3, (200, 64)).astype(np.int8)
    y = rng.randint(0, 2, 200)
    Xd = jax.device_put(Xd_host)
    a = MultiSURF(n_features_to_select=5).fit(Xd, y)
    b = MultiSURF(n_features_to_select=5).fit(
        Xd_host.astype(np.float64), y)
    assert_allclose(a.feature_importances_, b.feature_importances_,
                    rtol=1e-4, atol=1e-6)
    assert_array_equal(a.top_features_, b.top_features_)

    # pure continuous
    Xc_host = rng.rand(300, 48).astype(np.float32)
    y2 = rng.randint(0, 2, 300)
    Xc = jax.device_put(Xc_host)
    a = ReliefF(n_features_to_select=5, n_neighbors=5).fit(Xc, y2)
    b = ReliefF(n_features_to_select=5, n_neighbors=5).fit(Xc_host, y2)
    assert_allclose(a.feature_importances_, b.feature_importances_,
                    rtol=1e-4, atol=1e-6)

    # NaN rejection on device
    Xn = Xc_host.copy()
    Xn[5, 7] = np.nan
    with pytest.raises(ValueError, match="NaN"):
        MultiSURF().fit(jax.device_put(Xn), y2)


def test_all_discrete_estimator_routes_to_mxu_engine(rng):
    """End-to-end: an all-discrete fit goes through the discrete engine
    and still matches the semantic oracle ranking."""
    from fastselect_tpu import MultiSURF
    from oracles import multisurf_scores

    n, p = 40, 12
    X = rng.randint(0, 3, (n, p)).astype(np.float64)
    y = rng.randint(0, 2, n)
    X[:, 2] = y * 2  # strongly relevant
    m = MultiSURF(n_features_to_select=3, backend="cpu").fit(X, y)
    expected = multisurf_scores(X, y)
    assert_allclose(m.feature_importances_, expected, atol=2e-6)
    assert m.top_features_[0] == 2


@pytest.mark.skipif(not _tpu_present(),
                    reason="hybrid engine runs Pallas kernels (TPU only)")
def test_hybrid_blocked_matches_square(monkeypatch, rng):
    """The focal-super-block streaming path must reproduce the square
    hybrid engine exactly (same semantics, bounded HBM)."""
    import fastselect_tpu.ops.relief_hybrid as H

    n, p = 700, 96
    x = rng.rand(n, p).astype(np.float32)
    x[:, :40] = rng.randint(0, 3, (n, 40))
    y = rng.randint(0, 2, n).astype(np.int32)
    disc = np.zeros(p, bool)
    disc[:40] = True
    recip = (1.0 / np.maximum(x.max(0) - x.min(0), 1e-9)).astype(np.float32)
    square = H.relief_hybrid_scores(x, y, recip, disc, algo="multisurf")
    monkeypatch.setattr(H, "HYBRID_SQUARE_MAX_N", 64)  # force blocking
    blocked = H.relief_hybrid_scores(x, y, recip, disc, algo="multisurf")
    assert_allclose(blocked, square, atol=2e-6, rtol=1e-6)
    assert_array_equal(np.argsort(blocked), np.argsort(square))


@pytest.mark.skipif(not _tpu_present(),
                    reason="large-n hybrid runs Pallas kernels (TPU only)")
def test_hybrid_large_n_matches_generic(rng):
    """Mixed data beyond the old 24k cap (VERDICT r1 item 5): the
    blocked hybrid engine at n=50k must match the generic streaming
    engine, which the oracle suite pins to reference semantics."""
    from fastselect_tpu.ops.relief_hybrid import relief_hybrid_scores
    from fastselect_tpu.utils.backend import default_device

    n, p = 50000, 64
    x = rng.rand(n, p).astype(np.float32)
    x[:, :24] = rng.randint(0, 3, (n, 24))
    y = rng.randint(0, 2, n).astype(np.int32)
    disc = np.zeros(p, bool)
    disc[:24] = True
    recip = (1.0 / np.maximum(x.max(0) - x.min(0), 1e-9)).astype(np.float32)
    dev = default_device("tpu")
    got = relief_hybrid_scores(x, y, recip, disc, algo="multisurf",
                               device=dev)
    # generic streaming engine with the SAME mixed mask (Hamming on the
    # discrete columns), running on the same chip
    cp = np.bincount(y, minlength=2).astype(np.float32) / n
    ref = _generic_scores(x, y, recip, disc, "multisurf", False, 0, cp)
    assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Class-sorted v2 discrete engines (segment-restricted pass 2, symmetric
# pass 1): parity vs the generic oracle-pinned engine at every tier
# ---------------------------------------------------------------------------

def _force_v2(monkeypatch, sym=True, mono=False):
    import fastselect_tpu.ops.relief_discrete as RD
    monkeypatch.setattr(RD, "_V2_MIN_N", 1)
    if not sym:
        monkeypatch.setattr(RD, "_SYM_MAX_N", 0)
    return RD


@pytest.mark.parametrize("algo,star,k,ncls", CASES)
@pytest.mark.parametrize("tier", ["sym", "mono", "streamed"])
def test_discrete_v2_matches_generic(algo, star, k, ncls, tier,
                                     monkeypatch, rng):
    _force_v2(monkeypatch, sym=(tier == "sym"))
    n, p = 230, 37
    x = rng.randint(0, 3, (n, p)).astype(np.float32)
    y = rng.randint(0, ncls, n).astype(np.int32)
    x[:, 0] = y % 3
    cp = np.bincount(y, minlength=ncls).astype(np.float32) / n
    ref = _generic_scores(x, y, np.ones(p, np.float32),
                          np.ones(p, bool), algo, star, k, cp)
    ti = 16 if tier == "streamed" else None  # nb >= 16 -> host-streamed
    got = relief_discrete_scores(x, y, algo=algo, use_star=star,
                                 n_neighbors=k, class_probs=cp, ti=ti)
    assert_allclose(got, ref, atol=3e-6, rtol=1e-5)
    assert_array_equal(np.argsort(got), np.argsort(ref))


def test_discrete_v2_device_resident_codes(monkeypatch, rng):
    """The HBM-resident fast path (TuRF) must sort/pad on device and
    match the host path."""
    import jax
    _force_v2(monkeypatch)
    n, p = 200, 24
    x = rng.randint(0, 3, (n, p)).astype(np.float32)
    y = rng.randint(0, 2, n).astype(np.int32)
    codes, s = encode_discrete(x)
    host = relief_discrete_scores(None, y, algo="multisurf",
                                  codes=codes, n_states=s)
    dev = relief_discrete_scores(None, y, algo="multisurf",
                                 codes=jax.device_put(codes), n_states=s)
    assert_allclose(dev, host, atol=2e-7, rtol=1e-6)


def test_v2_mixed_boundary_blocks_match_generic(monkeypatch, rng):
    """Blocks straddling a class boundary (full-span contraction) and
    unbalanced class sizes must still be exact."""
    import fastselect_tpu.ops.relief_discrete as RD
    _force_v2(monkeypatch)
    n, p = 300, 29
    x = rng.randint(0, 3, (n, p)).astype(np.float32)
    # unbalanced 3-class split: boundaries nowhere near block edges
    y = np.array([0] * 201 + [1] * 80 + [2] * 19, np.int32)
    x[:, 1] = (y == 1) * 2.0
    cp = np.bincount(y, minlength=3).astype(np.float32) / n
    layout = RD._class_sorted_layout(y, 64)
    assert None in layout[3]  # at least one mixed block exercised
    ref = _generic_scores(x, y, np.ones(p, np.float32),
                          np.ones(p, bool), "multisurf", False, 0, cp)
    got = relief_discrete_scores(x, y, algo="multisurf", ti=64)
    assert_allclose(got, ref, atol=3e-6, rtol=1e-5)
    assert_array_equal(np.argsort(got), np.argsort(ref))


@pytest.mark.skipif(_tpu_present(),
                    reason="CPU-coverage smoke only — interpret mode "
                    "through the TPU runtime is pathologically slow, and "
                    "the real kernels are already tested above")
def test_pallas_interpret_smoke(rng):
    """Minimal CPU coverage for the Pallas kernels via interpret mode
    (VERDICT r1: without this, a kernel regression only surfaces when
    someone remembers FS_TEST_TPU=1).  Tiny shape — interpret-mode
    compiles cost ~15 s; full parity sweeps stay TPU-gated."""
    n, p = 16, 8
    x = rng.rand(n, p).astype(np.float32)
    y = rng.randint(0, 2, n).astype(np.int32)
    recip = (1.0 / np.maximum(x.max(0) - x.min(0), 1e-9)).astype(np.float32)
    disc = np.zeros(p, bool)
    cp = np.bincount(y, minlength=2).astype(np.float32) / n
    ref = _generic_scores(x, y, recip, disc, "multisurf", False, 0, cp)
    got = relief_pallas_scores(x, y, recip, disc, algo="multisurf",
                               interpret=True)
    assert_allclose(got, ref, atol=1e-5)


def test_discrete_v2_gather_streamed_matches_generic(monkeypatch, rng):
    """Huge-device-codes virtual-sort path (no sorted/padded copy): the
    gather-mode engine must match the generic oracle, including a ragged
    feature tail covered by the overlap window and a ragged last focal
    block."""
    import jax
    import fastselect_tpu.ops.relief_discrete as RD
    _force_v2(monkeypatch)
    monkeypatch.setattr(RD, "_DEVICE_SORT_BUDGET", 1)  # force gather

    n, p = 210, 37  # n not a ti-multiple, p not an ft-multiple
    x = rng.randint(0, 3, (n, p)).astype(np.float32)
    y = rng.randint(0, 3, n).astype(np.int32)
    x[:, 2] = y % 3
    cp = np.bincount(y, minlength=3).astype(np.float32) / n
    for algo, star, k in [("multisurf", True, 0), ("surf", True, 0),
                          ("relieff", False, 5)]:
        ref = _generic_scores(x, y, np.ones(p, np.float32),
                              np.ones(p, bool), algo, star, k, cp)
        codes, s = encode_discrete(x)
        got = relief_discrete_scores(
            None, y, algo=algo, use_star=star, n_neighbors=k,
            class_probs=cp, codes=jax.device_put(codes), n_states=s,
            ti=64, ft=16)
        # f32 accumulation-order noise only (same bound as the v1
        # discrete test); the gather path is separately pinned to the
        # sorted v2 path to ~1 ulp
        assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
        assert_array_equal(np.argsort(got), np.argsort(ref))
        sorted_v2 = relief_discrete_scores(
            None, y, algo=algo, use_star=star, n_neighbors=k,
            class_probs=cp, codes=codes, n_states=s, ti=64, ft=16)
        assert_allclose(got, sorted_v2, atol=5e-7)


def test_v2_relieff_default_class_probs_falls_back(monkeypatch, rng):
    """Op-level relieff with the default class_probs=None must not take
    the per-class v2 plans (rules[1+c] would not exist) — it falls back
    to the v1 path and matches it."""
    import fastselect_tpu.ops.relief_discrete as RD
    _force_v2(monkeypatch)
    x = rng.randint(0, 3, (120, 15)).astype(np.float32)
    y = rng.randint(0, 3, 120).astype(np.int32)
    got = relief_discrete_scores(x, y, algo="relieff", n_neighbors=4)
    assert np.isfinite(got).all()
    assert RD._v2_layout(y, 120, 8, "relieff", None) is None


def test_v2_bitwise_deterministic_across_runs(monkeypatch, rng):
    """Fixed layout -> bitwise identical scores across runs (the race
    guarantee of SURVEY §5 extends to the v2 engines)."""
    _force_v2(monkeypatch)
    x = rng.randint(0, 3, (300, 31)).astype(np.float32)
    y = rng.randint(0, 2, 300).astype(np.int32)
    a = relief_discrete_scores(x, y, algo="multisurf", ti=64)
    b = relief_discrete_scores(x, y, algo="multisurf", ti=64)
    assert_array_equal(a, b)


@pytest.mark.skipif(not _tpu_present(),
                    reason="HBM-resident fit path needs a TPU")
def test_device_int8_genotype_fit_matches_host(rng):
    """int8 genotype matrices already in HBM (the GWAS staging idiom)
    must fit identically to the host-array path."""
    import jax
    from fastselect_tpu import MultiSURF

    n, p = 300, 96
    X = rng.randint(0, 3, (n, p)).astype(np.int8)
    y = rng.randint(0, 2, n)
    X[:, 3] = (y * 2).astype(np.int8)
    host = MultiSURF(n_features_to_select=8).fit(X, y)
    dev = MultiSURF(n_features_to_select=8).fit(jax.device_put(X), y)
    assert_array_equal(dev.top_features_, host.top_features_)
    assert_allclose(dev.feature_importances_, host.feature_importances_,
                    atol=1e-6)


@pytest.mark.skipif(not _tpu_present(),
                    reason="single-upload staging path needs a TPU")
def test_single_upload_staged_fit_consistent(rng):
    """A host continuous X big enough to trigger the device analysis
    sweep (>= 2^22 elements) is staged on device during analysis
    (FeatureAnalysis.x_dev) and scored from that copy with no second
    upload; the result must match the generic XLA engine."""
    from fastselect_tpu import MultiSURF

    n, p = 300, 16384  # 4.9M elements -> analyze_features_device path
    x = rng.rand(n, p).astype(np.float32)
    y = rng.randint(0, 2, n).astype(np.int32)
    est = MultiSURF(n_features_to_select=8).fit(x, y)
    recip = (1.0 / (x.max(axis=0) - x.min(axis=0))).astype(np.float32)
    import jax
    dev = next(d for d in jax.devices() if d.platform != "cpu")
    ref = relief_pallas_scores(x, y, recip, np.zeros(p, bool),
                               algo="multisurf", device=dev)
    # same kernels, same tiling — staging must not change the math
    assert_allclose(est.feature_importances_, ref, atol=1e-6)


@pytest.mark.skipif(not _tpu_present(),
                    reason="hybrid engine runs Pallas kernels (TPU only)")
@pytest.mark.parametrize("algo,star,k,ncls", CASES)
def test_hybrid_v2_discrete_half_matches_generic(monkeypatch, algo, star,
                                                 k, ncls, rng):
    """With the v2 gate forced open, the hybrid square path class-sorts
    rows and runs the segment-restricted pass 2 on its discrete half —
    scores must still match the generic engine."""
    import fastselect_tpu.ops.relief_discrete as rd
    from fastselect_tpu.ops.relief_hybrid import relief_hybrid_scores

    monkeypatch.setattr(rd, "_V2_MIN_N", 16)
    n, p = 300, 96
    x = rng.rand(n, p).astype(np.float32)
    x[:, :40] = rng.randint(0, 3, (n, 40))
    y = rng.randint(0, ncls, n).astype(np.int32)
    disc = np.zeros(p, bool)
    disc[:40] = True
    recip = (1.0 / np.maximum(x.max(0) - x.min(0), 1e-9)).astype(np.float32)
    cp = np.bincount(y, minlength=ncls).astype(np.float32) / n
    # compare against the generic engine on the SAME class-sorted row
    # order the hybrid uses internally — the permutation itself perturbs
    # f32 continuous-distance sums at the last bit, which is not what
    # this test is about (the segment-restricted discrete pass 2 is)
    perm = np.argsort(y, kind="stable")
    ref = _generic_scores(x[perm], y[perm], recip, disc, algo, star, k,
                          cp)
    got = relief_hybrid_scores(x, y, recip, disc, algo=algo, use_star=star,
                               n_neighbors=k, class_probs=cp)
    assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
    # no exact-argsort assert: the fixture has no planted signal, so
    # adjacent ranks are last-bit ties between engines


def test_sym_zone_single_predicate():
    """The tile-size chooser and _run_v2 must agree on the symmetric
    zone: the chooser's ft cap is 2048 exactly when _sym_zone holds for
    the padded sample count (regression for the r2 drift bug)."""
    from fastselect_tpu.ops.relief_discrete import (
        _discrete_tile_sizes, _sym_zone, _round_up)

    for n in (100, 4096, 16384, 24576, 24577, 30000, 98304):
        for p in (128, 512, 65536, 200000):
            for s in (2, 3, 10):
                ti, ft = _discrete_tile_sizes(n, p, s)
                n_pad = _round_up(n, ti)
                if _sym_zone(n_pad, p, s):
                    assert ft <= 2048, (n, p, s)
                else:
                    assert ft <= 1024, (n, p, s)


@pytest.mark.parametrize("s,bits", [(2, 2), (3, 2), (4, 2), (5, 4),
                                    (16, 4), (17, None)])
def test_pack_codes_roundtrip(s, bits, rng):
    """Bit-packed H2D staging must round-trip exactly for every
    cardinality tier (2-bit, 4-bit, raw int8 above 16 states)."""
    from fastselect_tpu.ops.relief_discrete import (_pack_codes,
                                                    stage_codes_device)

    for p in (1, 3, 8, 13):  # ragged and aligned widths
        codes = rng.randint(0, s, (9, p)).astype(np.int8)
        packed = _pack_codes(codes, s)
        if bits is None:
            assert packed is None
        else:
            assert packed[1] == bits
            assert packed[0].shape == (9, -(-p // (8 // bits)))
        out = np.asarray(stage_codes_device(codes, s))
        assert out.dtype == np.int8
        assert_array_equal(out, codes)


def test_staged_discrete_fit_matches_unstaged(rng):
    """relief_discrete_scores through the packed staging path equals the
    host-codes path bit for bit (integer pass 1 both ways)."""
    from fastselect_tpu.ops.relief_discrete import relief_discrete_scores
    import jax

    n, p = 64, 37
    codes = rng.randint(0, 3, (n, p)).astype(np.int8)
    y = rng.randint(0, 2, n).astype(np.int32)
    host = relief_discrete_scores(None, y, algo="multisurf", codes=codes,
                                  n_states=3)
    staged = relief_discrete_scores(
        None, y, algo="multisurf", codes=codes, n_states=3,
        device=jax.devices()[0])
    assert_array_equal(host, staged)


@pytest.mark.parametrize("s", [3, 5])  # 2-bit and 4-bit packing tiers
def test_discrete_v2_gather_packed_matches_unpacked(monkeypatch, s, rng):
    """Gather-mode v2 over a bit-packed HBM-resident code matrix (the
    GWAS memory layout) must equal the unpacked gather path to ~1 ulp,
    including ragged p with byte-boundary tail windows."""
    import jax
    import fastselect_tpu.ops.relief_discrete as RD
    _force_v2(monkeypatch)
    monkeypatch.setattr(RD, "_DEVICE_SORT_BUDGET", 1)   # force gather
    monkeypatch.setattr(RD, "_PACKED_PROMOTE_BUDGET", 0)  # no promote

    n, p = 210, 37  # p not a multiple of ft nor of the packing ratio
    codes = rng.randint(0, s, (n, p)).astype(np.int8)
    y = rng.randint(0, 2, n).astype(np.int32)
    cp = np.bincount(y, minlength=2).astype(np.float32) / n
    for algo, star, k in [("multisurf", True, 0), ("surf", False, 0),
                          ("relieff", False, 5)]:
        layout = RD._v2_layout(y, n, 64, algo, cp)
        assert layout is not None
        kw = dict(algo=algo, use_star=star, k=k, ti=64, ft=16,
                  device=None)
        plain = RD._run_v2(jax.device_put(codes), y, layout, n, p, s,
                           cp, **kw)
        pk = RD.stage_codes_packed(codes, s)
        assert isinstance(pk, RD.PackedCodes)
        packed = RD._run_v2(pk, y, layout, n, p, s, cp, **kw)
        assert_allclose(packed, plain, atol=5e-7, err_msg=algo)


@pytest.mark.parametrize("s", [3, 5])
def test_discrete_v2_packed_promote_matches_unpacked(monkeypatch, s, rng):
    """PackedCodes whose sorted copy fits HBM are PROMOTED to the
    resident v2 engine (device unpack+sort in plane feature order,
    scores remapped host-side) — must equal the unpacked path."""
    import jax
    import fastselect_tpu.ops.relief_discrete as RD
    _force_v2(monkeypatch)

    n, p = 210, 37
    codes = rng.randint(0, s, (n, p)).astype(np.int8)
    y = rng.randint(0, 2, n).astype(np.int32)
    cp = np.bincount(y, minlength=2).astype(np.float32) / n
    for algo, star, k in [("multisurf", True, 0), ("surf", False, 0),
                          ("relieff", False, 5)]:
        layout = RD._v2_layout(y, n, 64, algo, cp)
        assert layout is not None
        kw = dict(algo=algo, use_star=star, k=k, ti=64, ft=16,
                  device=None)
        plain = RD._run_v2(jax.device_put(codes), y, layout, n, p, s,
                           cp, **kw)
        pk = RD.stage_codes_packed(codes, s)
        assert isinstance(pk, RD.PackedCodes)
        assert pk.n * pk.p <= RD._PACKED_PROMOTE_BUDGET  # promotes
        packed = RD._run_v2(pk, y, layout, n, p, s, cp, **kw)
        # pad columns past p carry engine-dependent f32 residue and are
        # sliced off by every caller — compare the real features only
        assert_allclose(packed[:p], plain[:p], atol=5e-7, err_msg=algo)
