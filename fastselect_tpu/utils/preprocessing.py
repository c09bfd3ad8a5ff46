"""Preprocessing shared by the Relief-family estimators.

Mirrors the reference's shared numerics (``MultiSURF.py:141-144,409-420``,
``ReliefF.py:366-380``, ``SURF.py:347-355``):

* per-feature range scaling with zero-range (and, for ReliefF/SURF, discrete)
  features pinned to range 1.0, exposed as the reciprocal used in the scaled
  L1 distance;
* per-feature discreteness detection: a feature with at most
  ``discrete_limit`` unique values is discrete (Hamming distance), otherwise
  continuous (range-scaled L1).

The reference loops ``np.unique`` per column; at GWAS scale that is a real
hotspot, so this is a single vectorized column sort + adjacent-diff count.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def detect_discrete_features(x: np.ndarray, discrete_limit: int) -> np.ndarray:
    """Boolean mask of features with <= discrete_limit unique values.

    Equivalent to ``np.unique(x[:, f]).size <= discrete_limit`` per column
    (reference ``MultiSURF.py:416-420``) but computed with one vectorized
    sort over all columns.
    """
    n_samples = x.shape[0]
    if n_samples == 0:
        return np.zeros(x.shape[1], dtype=bool)
    xs = np.sort(x, axis=0)
    n_unique = 1 + (xs[1:] != xs[:-1]).sum(axis=0)
    return np.asarray(n_unique <= discrete_limit, dtype=bool)


def compute_recip_ranges(
    x: np.ndarray,
    is_discrete: np.ndarray | None = None,
    *,
    unit_range_for_discrete: bool = False,
) -> np.ndarray:
    """Reciprocal of per-feature ranges, float32.

    ``unit_range_for_discrete=True`` reproduces ReliefF/SURF semantics where
    discrete features get range 1.0 before the zero-range guard
    (``ReliefF.py:377-380``); MultiSURF applies only the zero-range guard
    (``MultiSURF.py:409-412``).
    """
    ranges = x.max(axis=0) - x.min(axis=0)
    if unit_range_for_discrete and is_discrete is not None:
        ranges = np.where(is_discrete, 1.0, ranges)
    ranges = np.where(ranges == 0, 1.0, ranges)
    return (1.0 / ranges).astype(np.float32)


@dataclass
class FeatureAnalysis:
    """Per-feature preprocessing facts shared by the Relief engines."""
    is_discrete: np.ndarray          # (p,) bool
    recip: np.ndarray                # (p,) f32, 1/range with zero guard
    codes: np.ndarray | None = None  # (n, p) int8 ranks (discrete cols)
    n_states: int = 0                # max cardinality over discrete cols
    x_dev: object | None = None      # (n, p) f32 device-resident X, kept
    #                                  from the analysis sweep when every
    #                                  column is continuous — the engine
    #                                  consumes it directly so host X is
    #                                  uploaded exactly once per fit


# Module-level jitted helpers: defining these inside the analyze
# functions would create a fresh closure per call and RECOMPILE every
# fit (~25 s through this runtime's AOT compiler).


def _chunk_stats_fn(xc):
    import jax.numpy as jnp
    xc = xc.astype(jnp.float32)  # no-op for f32; upcast for f16 staging
    xs = jnp.sort(xc, axis=0)
    newv = jnp.concatenate(
        [jnp.ones((1, xc.shape[1]), bool), xs[1:] != xs[:-1]], axis=0)
    n_unique = newv.sum(axis=0)
    return xs, newv, n_unique, xs[-1] - xs[0]


def _chunk_encode_fn(xc, xs, newv, *, s):
    import jax.numpy as jnp
    rank = jnp.cumsum(newv, axis=0) - 1
    out = jnp.zeros(xc.shape, jnp.int8)
    for c in range(s - 1):
        vc = jnp.where((rank == c) & newv, xs, -jnp.inf).max(axis=0)
        vc = jnp.where(jnp.isneginf(vc), jnp.inf, vc)
        out = out + (xc > vc[None, :]).astype(jnp.int8)
    return out


_chunk_stats = None
_chunk_encode = None


def _jitted_helpers():
    global _chunk_stats, _chunk_encode
    if _chunk_stats is None:
        import jax
        from functools import partial
        _chunk_stats = jax.jit(_chunk_stats_fn)
        _chunk_encode = jax.jit(_chunk_encode_fn, static_argnames=("s",))
    return _chunk_stats, _chunk_encode


def _auto_f_chunk(n: int, itemsize: int = 4) -> int:
    """Feature-chunk width targeting ~48 MB STAGED per chunk: big enough
    that the measured per-put overhead does not bite (below ~32 MB the
    tunnel's fixed cost dominates, CLAUDE.md), small enough that a
    transfer-bound p >> n fit splits into several chunks whose device
    work pipelines under the next chunk's host cast + serialization
    (the deferred-pull sweep below)."""
    budget = (48 << 20) // itemsize
    return int(min(1 << 19, max(8192, budget // max(n, 1) // 8192 * 8192)))


# Keep the analysis sweep's device chunks (for single-upload continuous
# fits) only while the full f32 matrix fits comfortably next to the
# engine's own padded copy.
_XDEV_BUDGET_BYTES = 4 << 30


def analyze_features_device(x: np.ndarray, discrete_limit: int,
                            f_chunk: int | None = None,
                            transfer_dtype: str | None = None
                            ) -> FeatureAnalysis:
    """One device sweep computing discreteness, ranges, AND discrete state
    codes per feature chunk.

    The reference probes discreteness with a per-column host ``np.unique``
    loop (``MultiSURF.py:416-420``) — a real hotspot at GWAS scale
    (SURVEY.md §7).  Here each (n, f_chunk) chunk is sorted once on
    device; cardinality, range, and rank codes all come from that one
    sort.  Chunks with no discrete column skip the encode (and its D2H
    copy) entirely, and when the WHOLE matrix turns out continuous the
    uploaded f32 chunks are kept and assembled into a device-resident X
    (``FeatureAnalysis.x_dev``) so the engine never re-uploads — host
    continuous data crosses the host↔device boundary exactly once.

    ``transfer_dtype='float16'`` (or ``'bfloat16'``) halves the H2D
    bytes by staging chunks half-width and upcasting to float32 on
    device.  Ranges, discreteness, and scores are then computed from the
    rounded values (~1e-3 relative effect on continuous scores); exact
    float32 staging remains the default.
    """
    import jax

    stage_dtype = _resolve_transfer_dtype(transfer_dtype)
    stats, encode = _jitted_helpers()
    n, p = x.shape
    if f_chunk is None:
        f_chunk = _auto_f_chunk(n, np.dtype(stage_dtype).itemsize)
    codes = np.empty((n, p), np.int8)
    is_disc = np.empty(p, bool)
    rng = np.empty(p, np.float32)
    keep: list | None = ([] if n * p * 4 <= _XDEV_BUDGET_BYTES else None)

    n_states = 1

    # Deferred-pull pipeline: the per-chunk stat pull (np.asarray) is a
    # SYNC point — pulling chunk k's stats immediately would serialize
    # [host cast k+1] behind [transfer k + device sort k].  Instead the
    # pull lags one chunk behind the puts, so chunk k+1's cast and
    # serialization are already enqueued while chunk k's transfer/sort
    # drains.  The window is 2 chunks wide to bound the sort
    # temporaries held live in HBM.
    window: list = []

    def drain(entry):
        nonlocal keep, n_states
        f0, xc, xs, newv, n_unique, rg_d = entry
        nu = np.asarray(n_unique)
        d = nu <= discrete_limit
        is_disc[f0:f0 + f_chunk] = d
        rng[f0:f0 + f_chunk] = np.asarray(rg_d)
        if d.any():
            s_chunk = int(min(int(nu.max(initial=1)), discrete_limit))
            codes[:, f0:f0 + f_chunk] = np.asarray(
                encode(xc, xs, newv, s=max(s_chunk, 1)))
            n_states = max(n_states, int(nu[d].max()))
            keep = None  # mixed data takes the host hybrid path
        elif keep is not None:
            keep.append((f0, xc))

    for f0 in range(0, p, f_chunk):
        xc = jax.device_put(np.ascontiguousarray(
            x[:, f0:f0 + f_chunk], dtype=stage_dtype))
        xs, newv, n_unique, rg_d = stats(xc)
        window.append((f0, xc, xs, newv, n_unique, rg_d))
        if len(window) > 1:
            drain(window.pop(0))
    while window:
        drain(window.pop(0))

    rng[rng == 0] = 1.0
    recip = (1.0 / rng).astype(np.float32)
    if not is_disc.any():
        # nothing was encoded: hand back the staged device X (if kept)
        # and no codes at all
        return FeatureAnalysis(is_disc, recip, None, 1,
                               x_dev=_assemble_x_dev(keep, n, p))
    return FeatureAnalysis(is_disc, recip, codes, n_states)


def _resolve_transfer_dtype(transfer_dtype: str | None):
    """Numpy dtype used for the H2D staging copy (default: exact f32)."""
    if transfer_dtype is None or transfer_dtype == "float32":
        return np.float32
    if transfer_dtype == "float16":
        return np.float16
    if transfer_dtype == "bfloat16":
        import ml_dtypes
        return ml_dtypes.bfloat16
    raise ValueError(
        "transfer_dtype must be None, 'float32', 'float16', or "
        f"'bfloat16', got {transfer_dtype!r}")


def _assemble_x_dev(keep, n: int, p: int):
    """Concatenate kept analysis chunks into one (n, p) f32 device
    array (half-width staged chunks upcast on device)."""
    if not keep:
        return None
    if len(keep) == 1 and keep[0][1].dtype == np.float32:
        return keep[0][1]
    zeros, upd = _jitted_xdev_helpers()
    buf = zeros(n=n, p=p)
    while keep:  # consume destructively: each chunk frees after its copy
        f0, xc = keep.pop(0)
        buf = upd(buf, xc, np.int32(f0))
    return buf


_xdev_helpers = None


def _jitted_xdev_helpers():
    global _xdev_helpers
    if _xdev_helpers is None:
        import jax
        import jax.numpy as jnp

        def _zeros(*, n, p):
            return jnp.zeros((n, p), jnp.float32)

        def _upd(buf, xc, f0):
            return jax.lax.dynamic_update_slice(
                buf, xc.astype(jnp.float32), (0, f0))

        _xdev_helpers = (jax.jit(_zeros, static_argnames=("n", "p")),
                         jax.jit(_upd, donate_argnums=(0,)))
    return _xdev_helpers


def analyze_features_device_array(x, discrete_limit: int,
                                  f_chunk: int = 8192) -> FeatureAnalysis:
    """`analyze_features_device` for an X that is ALREADY a device array
    (the HBM-resident fit path): chunks are sliced, sorted, and encoded
    under jit, and the code matrix is assembled in place on device with
    buffer donation — X never round-trips to the host.
    """
    import jax
    import jax.numpy as jnp

    n, p = x.shape
    s = max(int(discrete_limit), 2)
    analyze_chunk = _jitted_analyze_chunk()

    # pad the feature axis so every chunk shares one compiled program
    fc = min(f_chunk, _round_up_int(p, 128))
    p_pad = _round_up_int(p, fc)
    n_uni = np.empty(p_pad, np.int64)
    rng_all = np.empty(p_pad, np.float32)
    codes = jnp.zeros((n, p_pad), jnp.int8)
    if p_pad > p:
        xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, p_pad - p)))
    else:
        xp = x
    for f0 in range(0, p_pad, fc):
        codes, nu, rg = analyze_chunk(codes, xp, jnp.int32(f0), fc=fc, s=s)
        n_uni[f0:f0 + fc] = np.asarray(nu)
        rng_all[f0:f0 + fc] = np.asarray(rg)
    is_disc = (n_uni <= discrete_limit)[:p]
    rng_all = rng_all[:p]
    n_states = int(n_uni[:p][is_disc].max(initial=2))
    # NOTE: codes keeps its trailing zero-state pad columns — the
    # discrete engine treats all-state-0 columns exactly like padding
    # (score 0), and callers slice scores back to the true p.
    rng_all[rng_all == 0] = 1.0
    return FeatureAnalysis(is_disc, (1.0 / rng_all).astype(np.float32),
                           codes, n_states)


def _round_up_int(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _analyze_chunk_fn(codes_buf, xa, f0, *, fc, s):
    import jax
    import jax.numpy as jnp
    xc = jax.lax.dynamic_slice(
        xa, (0, f0), (xa.shape[0], fc)).astype(jnp.float32)
    xs = jnp.sort(xc, axis=0)
    newv = jnp.concatenate(
        [jnp.ones((1, fc), bool), xs[1:] != xs[:-1]], axis=0)
    n_unique = newv.sum(axis=0)
    rng = xs[-1] - xs[0]
    rank = jnp.cumsum(newv, axis=0) - 1
    out = jnp.zeros(xc.shape, jnp.int8)
    for c in range(s - 1):
        vc = jnp.where((rank == c) & newv, xs, -jnp.inf).max(axis=0)
        vc = jnp.where(jnp.isneginf(vc), jnp.inf, vc)
        out = out + (xc > vc[None, :]).astype(jnp.int8)
    codes_buf = jax.lax.dynamic_update_slice(codes_buf, out, (0, f0))
    return codes_buf, n_unique, rng


_analyze_chunk = None


def _jitted_analyze_chunk():
    global _analyze_chunk
    if _analyze_chunk is None:
        import jax
        _analyze_chunk = jax.jit(_analyze_chunk_fn,
                                 static_argnames=("fc", "s"),
                                 donate_argnums=(0,))
    return _analyze_chunk
