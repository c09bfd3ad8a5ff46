"""Balanced-accuracy scoring of k-locus MDR models on TPU.

The reference scores every C(p, k) genotype combination with one CUDA thread
per combo building a 3^k contingency table in local memory
(``MDR.py:20-79``) or a Numba prange loop (``MDR.py:82-129``).  Here a tile
of combos is scored at once: gather the k genotype columns per combo, fold
them into base-3 cell indices, and build all case/control tables of the tile
with a one-hot reduction — static shapes, fully vectorised.

Padding is sample-safe: case/control weights carry the validity mask, so
fold sizes that differ by one sample reuse the same compiled program.
"""

from __future__ import annotations

from functools import lru_cache, partial
from math import comb

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@lru_cache(maxsize=32)
def _comb_cache(p: int, r: int) -> np.ndarray:
    """comb(v, r) for v in 0..p, exact int64."""
    vals = [comb(v, r) for v in range(p + 1)]
    if vals[-1] >= (1 << 62):  # pragma: no cover - absurd search size
        raise OverflowError(f"C({p},{r}) exceeds int64")
    return np.asarray(vals, np.int64)


def unrank_combos(p: int, k: int, r0: int, r1: int) -> np.ndarray:
    """Rows r0..r1 (exclusive) of ``itertools.combinations(range(p), k)``
    in lexicographic order, computed arithmetically with vectorised
    binomial unranking — no per-combo Python.  The reference materialises
    the whole C(p, k) array per fit (``MDR.py:247-250``); enumerating it
    lazily in Python (round 3) still cost cv * C(p, k) tuple iteration.

    Position i holds the smallest x > prev with
    ``comb(p-prev-1, k-i) - comb(p-x-1, k-i) > rank_remaining`` — found
    for the whole chunk at once with a searchsorted over the monotone
    comb(v, k-i) table (hockey-stick identity for the cumulative count).
    """
    m = r1 - r0
    out = np.empty((m, k), np.int32)
    rem = np.arange(r0, r1, dtype=np.int64)
    prev = np.full((m,), -1, np.int64)
    for i in range(k):
        cb = _comb_cache(p, k - i)
        top = cb[p - prev - 1]          # combos left in this suffix block
        A = top - rem                   # pick largest v with cb[v] < A
        v = np.searchsorted(cb, A, side="left") - 1
        x = p - v - 1
        rem -= top - cb[v + 1]
        out[:, i] = x
        prev = x
    return out


@partial(jax.jit, static_argnames=("k",))
def _mdr_tile_ba(X, w_case, w_ctrl, combos_tile, *, k: int):
    """Balanced accuracy for one tile of combos.

    X: (n_pad, p) int32 genotypes 0..2; w_case/w_ctrl: (n_pad,) f32
    sample weights (0 for padded rows); combos_tile: (tc, k) int32.
    Returns (tc,) f32.
    """
    n_cells = 3 ** k
    powers = jnp.asarray([3 ** (k - 1 - j) for j in range(k)], jnp.int32)
    gathered = jnp.take(X, combos_tile, axis=1)          # (n, tc, k)
    cells = (gathered * powers[None, None, :]).sum(-1)   # (n, tc)
    oh = jax.nn.one_hot(cells, n_cells, dtype=jnp.float32)  # (n, tc, cells)
    case = jnp.einsum("n,ncl->cl", w_case, oh,
                      preferred_element_type=jnp.float32)
    ctrl = jnp.einsum("n,ncl->cl", w_ctrl, oh,
                      preferred_element_type=jnp.float32)

    total_case = case.sum(-1)
    total_ctrl = ctrl.sum(-1)
    ok = (total_case > 0) & (total_ctrl > 0)
    thr = total_case / jnp.maximum(total_ctrl, 1.0)
    # Reference rule (MDR.py:66-70): empty-control cells are high risk;
    # otherwise high risk iff case/control > case-total/control-total.
    high = (ctrl == 0) | (case / jnp.maximum(ctrl, 1e-30) > thr[:, None])
    tp = jnp.where(high, case, 0.0).sum(-1)
    tn = jnp.where(~high, ctrl, 0.0).sum(-1)
    sens = tp / jnp.maximum(total_case, 1.0)
    spec = tn / jnp.maximum(total_ctrl, 1.0)
    return jnp.where(ok, (sens + spec) / 2.0, 0.0)


@partial(jax.jit, static_argnames=("k", "tc", "with_scores"))
def _mdr_chunk_ba_folds(X, w_case, w_ctrl, combos, *, k: int, tc: int,
                        with_scores: bool = False):
    """Balanced accuracies for a combo chunk across ALL folds at once.

    X: (n_pad, p) int32; w_case/w_ctrl: (F, n_pad) f32 per-fold sample
    weights (0 off-fold / padded); combos: (c_pad, k) with c_pad a
    multiple of tc.  Returns (F, c_pad) f32 — or, with
    ``with_scores=True``, a (ba, score) pair where ``score`` is the
    EXACT int32 rank key ``tp*N + tn*P`` (see below).

    The expensive part — gathering k columns per combo and building the
    one-hot cell tensor — happens once per tile and is contracted
    against every fold's weights in one einsum, instead of once per fold
    (the reference re-runs its kernel per fold, ``MDR.py:262-276``).

    Exact selection key: within a fold the case/control totals P and N
    are combo-independent, so ``BA = (tp/P + tn/N)/2`` is maximised
    exactly by the integer ``tp*N + tn*P``.  tp/tn are sums of 0/1
    weights (exact in f32 below 2^24 samples) and the product stays
    below 2^31 for n < 65536 (score <= 2*P*N <= n^2/2) — callers guard
    that and fall back to f32-BA selection beyond.  This removes the
    f32-resolution tie hazard of comparing BAs directly: the reference
    compares f64 BAs (``MDR.py:282-302``), and two combos whose f64 BAs
    differ below f32 epsilon would otherwise tie on device.
    """
    n_cells = 3 ** k
    powers = jnp.asarray([3 ** (k - 1 - j) for j in range(k)], jnp.int32)
    P = w_case.sum(-1)                                       # (F,) exact
    N = w_ctrl.sum(-1)

    def per_tile(t):
        tile = jax.lax.dynamic_slice(combos, (t * tc, 0), (tc, k))
        gathered = jnp.take(X, tile, axis=1)                 # (n, tc, k)
        cells = (gathered * powers[None, None, :]).sum(-1)   # (n, tc)
        oh = jax.nn.one_hot(cells, n_cells, dtype=jnp.float32)
        case = jnp.einsum("fn,ncl->fcl", w_case, oh,
                          preferred_element_type=jnp.float32)
        ctrl = jnp.einsum("fn,ncl->fcl", w_ctrl, oh,
                          preferred_element_type=jnp.float32)
        total_case = case.sum(-1)                            # (F, tc)
        total_ctrl = ctrl.sum(-1)
        ok = (total_case > 0) & (total_ctrl > 0)
        thr = total_case / jnp.maximum(total_ctrl, 1.0)
        high = (ctrl == 0) | (case / jnp.maximum(ctrl, 1e-30)
                              > thr[..., None])
        tp = jnp.where(high, case, 0.0).sum(-1)
        tn = jnp.where(~high, ctrl, 0.0).sum(-1)
        sens = tp / jnp.maximum(total_case, 1.0)
        spec = tn / jnp.maximum(total_ctrl, 1.0)
        ba = jnp.where(ok, (sens + spec) / 2.0, 0.0)         # (F, tc)
        if not with_scores:
            return ba
        score = (tp.astype(jnp.int32) * N.astype(jnp.int32)[:, None]
                 + tn.astype(jnp.int32) * P.astype(jnp.int32)[:, None])
        return ba, jnp.where(ok, score, 0)

    nt = combos.shape[0] // tc
    parts = jax.lax.map(per_tile, jnp.arange(nt))           # (nt, F, tc)
    f = w_case.shape[0]
    if not with_scores:
        return parts.transpose(1, 0, 2).reshape(f, -1)
    return tuple(a.transpose(1, 0, 2).reshape(f, -1) for a in parts)


def _comb_tables(p: int, k: int) -> np.ndarray:
    """(k, p+1) int32 binomial tables for device-side unranking:
    row i holds comb(v, k-i) for v in 0..p.  Caller guarantees
    comb(p, k) < 2^31 (the int32 device-search guard)."""
    return np.stack([_comb_cache(p, k - i) for i in range(k)]
                    ).astype(np.int32)


def _unrank_device(ranks, tables, *, k: int):
    """Device twin of :func:`unrank_combos`: lexicographic combination
    rows from rank indices, via searchsorted over the monotone binomial
    tables.  All int32 (guarded by the caller)."""
    p = tables.shape[1] - 1
    rem = ranks
    prev = jnp.full(ranks.shape, -1, jnp.int32)
    cols = []
    for i in range(k):
        cb = tables[i]
        top = cb[p - prev - 1]
        a = top - rem
        v = jnp.searchsorted(cb, a, side="left").astype(jnp.int32) - 1
        x = p - v - 1
        rem = rem - (top - cb[v + 1])
        cols.append(x)
        prev = x
    return jnp.stack(cols, axis=1)  # (m, k)


@partial(jax.jit, static_argnames=("k", "tc", "m", "exact"))
def _mdr_best_in_range(X, w_case, w_ctrl, tables, r0, n_combos,
                       *, k: int, tc: int, m: int, exact: bool = True):
    """Per-fold (best BA, selection score, global rank) over combo
    ranks [r0, r0+m).

    With ``exact=True`` (any fit with n < 65536) the maximum is picked
    by the exact integer key ``tp*N + tn*P`` (see
    :func:`_mdr_chunk_ba_folds`), matching the reference's f64 BA
    comparison bit-for-bit including ties; the returned score is that
    int32 key, which callers must also use for cross-chunk merging.
    With ``exact=False`` the score IS the f32 BA (documented tolerance:
    ties within f32 epsilon resolve by lexicographic rank).

    Combos are UNRANKED ON DEVICE and only the (F,) maxima leave the
    chip — at k=3, p=500 scale the host-combo design moves ~250 MB of
    combo rows up and ~400 MB of BAs down per fit; this moves a few
    bytes per chunk.  Ranks past n_combos clamp to the last combo: its
    duplicate BA can only TIE the real entry, and argmax's first-index
    rule keeps the real (earlier) one, preserving the reference's
    first-in-lexicographic-order tie-break.

    Overflow-safe: clamp the OFFSET before adding r0, so the padded
    tail of the last chunk never computes r0 + m - 1 (which can exceed
    INT32_MAX when n_combos is within one padded chunk of the 2^31
    guard and would wrap negative, indexing garbage combos)."""
    offs = jnp.arange(m, dtype=jnp.int32)
    ranks = r0 + jnp.minimum(offs, n_combos - 1 - r0)
    combos = _unrank_device(ranks, tables, k=k)
    if exact:
        bas, keys = _mdr_chunk_ba_folds(X, w_case, w_ctrl, combos,
                                        k=k, tc=tc, with_scores=True)
    else:
        bas = _mdr_chunk_ba_folds(X, w_case, w_ctrl, combos, k=k, tc=tc)
        keys = bas
    idx = jnp.argmax(keys, axis=1)                     # (F,) first max
    vals = jnp.take_along_axis(bas, idx[:, None], 1)[:, 0]
    scs = jnp.take_along_axis(keys, idx[:, None], 1)[:, 0]
    return vals, scs, r0 + idx.astype(jnp.int32)


class MDRFoldScorer:
    """Stages (X, per-fold weights) on device ONCE and scores streamed
    combo chunks for every fold per call — chunk-outer / fold-inner,
    one dispatch per chunk."""

    def __init__(self, X: np.ndarray, w_case: np.ndarray,
                 w_ctrl: np.ndarray, k: int, device=None):
        from ..utils.backend import execution_context
        n, _ = X.shape
        f = w_case.shape[0]
        self.k = int(k)
        self.n_cells = 3 ** self.k
        n_pad = _round_up(n, 64)
        # exact integer selection key fits int32 while 2*P*N <= n^2/2
        # < 2^31; beyond that fall back to f32-BA comparison
        self.exact = n_pad < 65536
        self.tc = int(max(8, min(1024, (48 * 1024 * 1024)
                                  // (n_pad * self.n_cells * 4))))
        Xp = np.zeros((n_pad, X.shape[1]), np.int32)
        Xp[:n] = X
        wc = np.zeros((f, n_pad), np.float32)
        wc[:, :n] = w_case
        wl = np.zeros((f, n_pad), np.float32)
        wl[:, :n] = w_ctrl
        self.device = device
        self._ctx = execution_context
        with execution_context(device):
            put = (jax.device_put if device is not None
                   and device.platform != "cpu" else jnp.asarray)
            self.Xd, self.wc, self.wl = put(Xp), put(wc), put(wl)

    def __call__(self, combos: np.ndarray) -> np.ndarray:
        """(F, n_combos) balanced accuracies for one combo chunk."""
        m = combos.shape[0]
        c_pad = _round_up(m, self.tc)
        combos_p = np.zeros((c_pad, self.k), np.int32)
        combos_p[:m] = combos
        with self._ctx(self.device):
            out = _mdr_chunk_ba_folds(
                self.Xd, self.wc, self.wl, jnp.asarray(combos_p),
                k=self.k, tc=self.tc)
            return np.asarray(out, np.float32)[:, :m]

    def search_all(self, p: int, n_combos: int,
                   chunk: int = 1 << 18):
        """Per-fold (best BA, best rank) over ALL C(p, k) combos, with
        combos unranked on device and only per-chunk maxima pulled back
        (see :func:`_mdr_best_in_range`).  Requires comb(p, k) < 2^31
        (int32 device arithmetic); dispatches are queued asynchronously
        and drained once at the end.

        Cross-chunk merging compares the exact integer selection key
        (n < 65536; see :func:`_mdr_chunk_ba_folds`), so the winner and
        its first-in-lexicographic-order tie-break match the
        reference's f64 comparison exactly; beyond that the key is the
        f32 BA itself and sub-epsilon ties resolve by rank order
        (documented in PARITY.md)."""
        f = self.wc.shape[0]
        m = _round_up(min(chunk, max(n_combos, 1)), self.tc)
        best_v = np.full((f,), -np.inf, np.float64)
        best_s = np.full((f,), -np.inf, np.float64)
        best_r = np.zeros((f,), np.int64)
        pending = []
        with self._ctx(self.device):
            tb = jnp.asarray(_comb_tables(p, self.k))
            nc = jnp.int32(n_combos)
            for r0 in range(0, n_combos, m):
                pending.append(_mdr_best_in_range(
                    self.Xd, self.wc, self.wl, tb, jnp.int32(r0), nc,
                    k=self.k, tc=self.tc, m=m, exact=self.exact))
            for vals, scs, ranks in pending:  # ascending ranks: strict >
                vals = np.asarray(vals, np.float64)
                scs = np.asarray(scs, np.float64)
                ranks = np.asarray(ranks, np.int64)
                upd = scs > best_s
                best_s[upd] = scs[upd]
                best_v[upd] = vals[upd]
                best_r[upd] = ranks[upd]
        return best_v, best_r


def batch_balanced_accuracy(X: np.ndarray, y: np.ndarray,
                            combos: np.ndarray, k: int,
                            device=None) -> np.ndarray:
    """Balanced accuracy of every combo's MDR model on (X, y)."""
    n, _ = X.shape
    n_combos = combos.shape[0]
    n_cells = 3 ** k
    # Tile size bounded so the one-hot tensor stays ~tens of MB.
    n_pad = _round_up(n, 64)
    tc = int(max(8, min(1024, (48 * 1024 * 1024) // (n_pad * n_cells * 4))))
    c_pad = _round_up(n_combos, tc)

    Xp = np.zeros((n_pad, X.shape[1]), np.int32)
    Xp[:n] = X
    w_case = np.zeros((n_pad,), np.float32)
    w_case[:n] = (y == 1)
    w_ctrl = np.zeros((n_pad,), np.float32)
    w_ctrl[:n] = (y != 1)
    combos_p = np.zeros((c_pad, k), np.int32)
    combos_p[:n_combos] = combos

    from ..utils.backend import execution_context

    out = np.empty((c_pad,), np.float32)
    with execution_context(device):
        Xd, wc, wl = (jnp.asarray(a) for a in (Xp, w_case, w_ctrl))
        for t0 in range(0, c_pad, tc):
            tile = jnp.asarray(combos_p[t0:t0 + tc])
            out[t0:t0 + tc] = np.asarray(
                _mdr_tile_ba(Xd, wc, wl, tile, k=k))
    return out[:n_combos]
