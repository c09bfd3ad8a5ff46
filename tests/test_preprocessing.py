"""Unit tests for the device analysis sweep (`utils/preprocessing.py`).

The sweep replaces the reference's per-column host ``np.unique`` probe
(``MultiSURF.py:416-420``) and additionally stages continuous X on
device so the engine never re-uploads (single-upload fits).
"""

import numpy as np
import pytest

from fastselect_tpu.utils import preprocessing as pp


def test_device_sweep_continuous_stages_x_and_skips_codes(rng):
    x = rng.rand(64, 300).astype(np.float32) * 5.0
    an = pp.analyze_features_device(x, discrete_limit=10, f_chunk=128)
    assert not an.is_discrete.any()
    assert an.codes is None
    assert an.x_dev is not None
    np.testing.assert_allclose(np.asarray(an.x_dev), x, rtol=1e-6)
    # ranges match the host probe
    np.testing.assert_allclose(
        an.recip, pp.compute_recip_ranges(x), rtol=1e-6)


def test_device_sweep_single_chunk_reuses_upload(rng):
    x = rng.rand(16, 100).astype(np.float32)
    an = pp.analyze_features_device(x, discrete_limit=5, f_chunk=1024)
    assert an.x_dev is not None
    np.testing.assert_allclose(np.asarray(an.x_dev), x, rtol=1e-6)


def test_device_sweep_mixed_returns_codes_not_xdev(rng):
    x = rng.rand(32, 64).astype(np.float32)
    x[:, :16] = rng.randint(0, 3, (32, 16))  # discrete block first
    an = pp.analyze_features_device(x, discrete_limit=10, f_chunk=16)
    assert an.is_discrete[:16].all() and not an.is_discrete[16:].any()
    assert an.x_dev is None
    assert an.codes is not None
    # discrete columns carry valid rank codes
    for f in range(16):
        col = an.codes[:, f]
        vals = np.unique(x[:, f])
        expect = np.searchsorted(vals, x[:, f])
        np.testing.assert_array_equal(col, expect)
    assert an.n_states == 3


def test_device_sweep_budget_gate(monkeypatch, rng):
    monkeypatch.setattr(pp, "_XDEV_BUDGET_BYTES", 100)
    x = rng.rand(16, 64).astype(np.float32)
    an = pp.analyze_features_device(x, discrete_limit=5, f_chunk=32)
    assert an.x_dev is None  # too big to stage; still analysed correctly
    assert not an.is_discrete.any()


def test_device_sweep_discrete_matches_host_probe(rng):
    x = rng.randint(0, 4, (40, 32)).astype(np.float32)
    an = pp.analyze_features_device(x, discrete_limit=10, f_chunk=8)
    assert an.is_discrete.all()
    assert an.x_dev is None
    assert an.n_states == 4
    np.testing.assert_array_equal(
        an.is_discrete, pp.detect_discrete_features(x, 10))


def test_timed_fit_tracks_peak_rss(rng):
    """Memory benchmarking contract: timed_fit samples host RSS during
    the fit (reference publishes *_memory.png curves; BASELINE pins
    ~400-500 MB flat for the Relief family)."""
    from fastselect_tpu.utils.profiling import timed_fit
    from fastselect_tpu import MultiSURF

    X = rng.rand(120, 40)
    y = rng.randint(0, 2, 120)
    t = timed_fit(lambda: MultiSURF(n_features_to_select=5), X, y)
    assert t.seconds > 0
    assert t.peak_rss_mb > 10  # a real process RSS, not a stub
    t2 = timed_fit(lambda: MultiSURF(n_features_to_select=5), X, y,
                   track_memory=False)
    assert t2.peak_rss_mb == 0.0


def test_half_width_staging_matches_f32(rng):
    """transfer_dtype='float16' stages chunks half-width and upcasts on
    device: x_dev comes back float32 and within f16 rounding of X."""
    x = rng.rand(32, 96).astype(np.float32)
    an16 = pp.analyze_features_device(x, discrete_limit=5, f_chunk=32,
                                      transfer_dtype="float16")
    assert an16.x_dev is not None
    assert np.asarray(an16.x_dev).dtype == np.float32
    np.testing.assert_allclose(np.asarray(an16.x_dev), x, rtol=2e-3)
    an32 = pp.analyze_features_device(x, discrete_limit=5, f_chunk=32)
    np.testing.assert_allclose(an16.recip, an32.recip, rtol=2e-3)
    np.testing.assert_array_equal(an16.is_discrete, an32.is_discrete)


def test_half_width_staging_bf16_and_single_chunk(rng):
    x = rng.rand(16, 24).astype(np.float32)
    an = pp.analyze_features_device(x, discrete_limit=5, f_chunk=64,
                                    transfer_dtype="bfloat16")
    assert an.x_dev is not None
    assert np.asarray(an.x_dev).dtype == np.float32
    np.testing.assert_allclose(np.asarray(an.x_dev), x, rtol=1e-2)


def test_transfer_dtype_validation():
    from fastselect_tpu import MultiSURF

    with pytest.raises(ValueError, match="transfer_dtype"):
        MultiSURF(transfer_dtype="int8").fit(
            np.random.rand(30, 8), np.arange(30) % 2)
    # valid values pass through cleanly on any backend
    m = MultiSURF(n_features_to_select=2, transfer_dtype="float16")
    m.fit(np.random.rand(30, 8), np.arange(30) % 2)
    assert m.top_features_.shape == (2,)


# -- round 4: auto half-width staging for transfer-bound p >> n fits ----

def test_staging_dtype_auto_policy(rng):
    """None auto-selects float16 only for large p >> n float matrices;
    explicit values always win; ints never auto-stage half-width."""
    import fastselect_tpu.models._relief_base as rb
    from fastselect_tpu import MultiSURF

    big_wide = np.zeros((10, 400), np.float32)     # p >= 4n
    big_tall = np.zeros((400, 10), np.float32)
    big_int = np.zeros((10, 400), np.int32)

    m = MultiSURF()
    # below the threshold: exact staging
    assert m._staging_dtype(big_wide) is None
    assert m.transfer_dtype_ == "float32"
    try:
        orig = rb._AUTO_F16_MIN_ELEMS
        rb._AUTO_F16_MIN_ELEMS = 1000
        assert m._staging_dtype(big_wide) == "float16"
        assert m.transfer_dtype_ == "float16"
        assert m._staging_dtype(big_tall) is None    # not p >> n
        assert m._staging_dtype(big_int) is None     # integer input
        m32 = MultiSURF(transfer_dtype="float32")
        assert m32._staging_dtype(big_wide) == "float32"
        assert m32.transfer_dtype_ == "float32"
    finally:
        rb._AUTO_F16_MIN_ELEMS = orig


def test_auto_f16_scores_close_to_exact(rng):
    """Scores from half-width staging stay within f16 rounding of the
    exact-f32 fit (the documented ~1e-3 relative effect)."""
    x = rng.rand(24, 200).astype(np.float32)
    an16 = pp.analyze_features_device(x, discrete_limit=5, f_chunk=64,
                                      transfer_dtype="float16")
    an32 = pp.analyze_features_device(x, discrete_limit=5, f_chunk=64)
    from fastselect_tpu.ops.relief import relief_scores
    y = rng.randint(0, 2, 24).astype(np.int32)
    s16 = relief_scores(np.asarray(an16.x_dev), y, an16.recip,
                        an16.is_discrete, algo="multisurf")
    s32 = relief_scores(np.asarray(an32.x_dev), y, an32.recip,
                        an32.is_discrete, algo="multisurf")
    np.testing.assert_allclose(s16, s32, atol=2e-3)
