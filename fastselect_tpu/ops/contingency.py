"""Contingency-table statistics as one-hot matmuls on the MXU.

The reference builds joint histograms with per-sample scalar loops
(``mutual_information.py:25-46``, ``CFS.py:44-64``) or CUDA shared-memory
atomics (``mutual_information.py:70-115``).  On TPU a contingency table is a
matmul of one-hot encodings:

    counts[a, b] = sum_i onehot(u_i = a) * onehot(v_i = b)
                 = onehot(U).T @ onehot(V)

Batched over features (relevance vectors) and over feature-pair tiles
(redundancy / r_ff matrices), every table lands on the MXU.  One-hot
operands are bf16 — 0/1 is exact in bf16 and the MXU runs bf16 at ~4x
its f32 rate on v5e — with f32 accumulation, so counts are exact for
n < 2^24 samples.

Tiles are sliced on host and passed as jit arguments: the compiled program
is shape-keyed and reused for every tile (traced dynamic-slice offsets into
one-hot matmuls trigger pathological XLA-CPU compile times).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12

# 0/1 one-hot matmul operand dtype: bf16 is exact for 0/1 inputs and
# ~4x f32 MXU throughput; accumulation stays f32 (preferred_element_type)
_OH_DTYPE = jnp.bfloat16


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Statistics from count tables
# ---------------------------------------------------------------------------

def mi_from_tables(tables: jnp.ndarray, n: jnp.ndarray,
                   log_base: float) -> jnp.ndarray:
    """MI per table over the last two axes, reference
    ``mutual_information.py:25-46`` semantics: terms where p_xy > 1e-12,
    denominator p_x*p_y + 1e-12, divided by log_base."""
    p_xy = tables / n
    p_x = p_xy.sum(axis=-1, keepdims=True)
    p_y = p_xy.sum(axis=-2, keepdims=True)
    ratio = p_xy / (p_x * p_y + _EPS)
    terms = jnp.where(p_xy > _EPS, p_xy * jnp.log(jnp.maximum(ratio, _EPS)),
                      0.0)
    return terms.sum(axis=(-2, -1)) / log_base


def su_from_tables(tables: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Symmetrical uncertainty per table (reference ``CFS.py:44-77``):
    MI in bits with the CFS variant's guards (p_xy, p_x, p_y all > eps),
    normalised by the marginal entropies."""
    p_xy = tables / n
    p_x = p_xy.sum(axis=-1)
    p_y = p_xy.sum(axis=-2)
    h_x = jnp.where(p_x > _EPS, -p_x * jnp.log2(jnp.maximum(p_x, _EPS)),
                    0.0).sum(axis=-1)
    h_y = jnp.where(p_y > _EPS, -p_y * jnp.log2(jnp.maximum(p_y, _EPS)),
                    0.0).sum(axis=-1)
    denom_ok = (h_x + h_y) > _EPS
    px_b = p_x[..., :, None]
    py_b = p_y[..., None, :]
    valid = (p_xy > _EPS) & (px_b > _EPS) & (py_b > _EPS)
    ratio = p_xy / jnp.maximum(px_b * py_b, _EPS)
    mi = jnp.where(valid, p_xy * jnp.log2(jnp.maximum(ratio, _EPS)),
                   0.0).sum(axis=(-2, -1))
    return jnp.where(denom_ok, 2.0 * mi / jnp.where(denom_ok, h_x + h_y, 1.0),
                     0.0)


def entropy_from_counts(counts: jnp.ndarray) -> jnp.ndarray:
    """Shannon entropy (bits) from count vectors along the last axis
    (reference ``CFS.py:26-41``)."""
    n = counts.sum(axis=-1, keepdims=True)
    prob = counts / jnp.maximum(n, 1.0)
    terms = jnp.where(prob > _EPS,
                      -prob * jnp.log2(jnp.maximum(prob, _EPS)), 0.0)
    return terms.sum(axis=-1)


# Jitted entry points for host callers (eager op dispatch is extremely slow
# on some platforms; every device computation in this package goes through
# jit).
@partial(jax.jit, static_argnames=("log_base",))
def mi_tables_reduce(tables, n, log_base: float):
    return mi_from_tables(tables, n, log_base)


@jax.jit
def su_tables_reduce(tables, n):
    return su_from_tables(tables, n)


# ---------------------------------------------------------------------------
# Tiled builders (host-sliced tiles, one compiled program per shape)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("s_x", "s_y"))
def _target_tables_tile(Xt, yoh, *, s_x: int, s_y: int):
    """Count tables (tile, s_x, s_y) of each column of Xt against y."""
    n, tile = Xt.shape
    xoh = jax.nn.one_hot(Xt, s_x, dtype=_OH_DTYPE).reshape(n, tile * s_x)
    counts = jax.lax.dot_general(
        xoh, yoh,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return counts.reshape(tile, s_x, s_y)


def pair_tables(Xi, Xj, n_real, *, s: int):
    """(ti, tj, s, s) joint count tables of every column pair — the ONE
    builder behind both the single-device and the mesh-sharded pairwise
    statistic matrices (entries are exact integers in f32, so the two
    paths are bitwise-identical by construction).

    State 0 is dropped from both matmul operands and its row/column
    recovered from the (cheap) per-feature marginals: the joint table
    has only (s-1)^2 free entries once marginals are known, so the MXU
    contraction shrinks by (s-1)^2/s^2 (0.64x at s=5).  All recovered
    entries are exact integer subtractions in f32."""
    n, ti = Xi.shape
    tj = Xj.shape[1]
    if s < 3:  # nothing to save below 3 states
        xi_oh = jax.nn.one_hot(Xi, s, dtype=_OH_DTYPE).reshape(n, ti * s)
        xj_oh = jax.nn.one_hot(Xj, s, dtype=_OH_DTYPE).reshape(n, tj * s)
        counts = jax.lax.dot_general(
            xi_oh, xj_oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ti, s, tj, s).transpose(0, 2, 1, 3)
    else:
        sm = s - 1
        # one-hot over states 1..s-1 only
        xi_oh = jax.nn.one_hot(Xi - 1, sm, dtype=_OH_DTYPE).reshape(
            n, ti * sm)
        xj_oh = jax.nn.one_hot(Xj - 1, sm, dtype=_OH_DTYPE).reshape(
            n, tj * sm)
        sub = jax.lax.dot_general(
            xi_oh, xj_oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ti, sm, tj, sm).transpose(0, 2, 1, 3)
        # per-feature marginals (s values each): two tiny matmuls
        mi_marg = jax.lax.dot_general(
            jax.nn.one_hot(Xi, s, dtype=_OH_DTYPE),
            jnp.ones((n,), jnp.float32).astype(_OH_DTYPE),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (ti, s)
        mj_marg = jax.lax.dot_general(
            jax.nn.one_hot(Xj, s, dtype=_OH_DTYPE),
            jnp.ones((n,), jnp.float32).astype(_OH_DTYPE),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (tj, s)
        # recover row/col 0 from the marginals (exact integers in f32)
        row0 = (mj_marg[None, :, 1:] -
                sub.sum(axis=2))                      # (ti, tj, s-1)
        col0 = (mi_marg[:, None, 1:] -
                sub.sum(axis=3))                      # (ti, tj, s-1)
        c00 = (n_real - mi_marg[:, None, 1:].sum(-1)
               - mj_marg[None, :, 1:].sum(-1)
               + sub.sum(axis=(2, 3)))                # (ti, tj)
        top = jnp.concatenate([c00[..., None, None],
                               row0[..., None, :]], axis=-1)
        bot = jnp.concatenate([col0[..., :, None], sub], axis=-1)
        counts = jnp.concatenate([top, bot], axis=-2)  # (ti, tj, s, s)
    return counts


def pair_tables_reduce(counts, n_real, *, stat: str, log_base: float):
    """Reduce pair tables to the requested statistic matrix."""
    if stat == "mi":
        return mi_from_tables(counts, n_real, log_base)
    if stat == "su":
        return su_from_tables(counts, n_real)
    raise ValueError(stat)  # pragma: no cover


@partial(jax.jit, static_argnames=("s", "stat", "log_base"))
def _pair_tile_stat(Xi, Xj, n_real, *, s: int, stat: str, log_base: float):
    """(ti, tj) statistic matrix from the joint tables of all column
    pairs (shared builder: :func:`pair_tables`)."""
    return pair_tables_reduce(pair_tables(Xi, Xj, n_real, s=s), n_real,
                              stat=stat, log_base=log_base)


def feature_target_tables(X_enc: np.ndarray, y_enc: np.ndarray,
                          s_x: int, s_y: int, device=None) -> np.ndarray:
    """Joint count tables of each feature vs the target, (p, s_x, s_y)."""
    from ..utils.backend import execution_context

    n, p = X_enc.shape
    # tile so the (n, tile*s_x) one-hot stays ~256 MB and the dispatch
    # count stays low (each call is a full H2D+launch round trip);
    # int8 staging when the cardinality allows (4x less link traffic)
    budget = (256 << 20) // 4
    tile = int(min(8192, max(8, budget // max(n * s_x, 1))))
    p_pad = _round_up(p, tile)
    Xp = np.zeros((n, p_pad), np.int8 if s_x <= 127 else np.int32)
    Xp[:, :p] = X_enc
    outs = []
    with execution_context(device):
        yoh = _onehot_target(jax.device_put(np.asarray(y_enc, np.int32)),
                             s=s_y)
        for t0 in range(0, p_pad, tile):
            # uncommitted device_put: eager jnp.asarray takes a
            # catastrophically slower transfer path on some runtimes
            xt = jax.device_put(np.ascontiguousarray(Xp[:, t0:t0 + tile]))
            outs.append(np.asarray(_target_tables_tile(xt, yoh, s_x=s_x,
                                                       s_y=s_y)))
    return np.concatenate(outs, axis=0)[:p]


class StagedColumnStats:
    """Device-staged column statistics for the memory-bounded greedy
    loops (mRMR / CFS at GWAS p): they only ever consume redundancy
    columns of *selected* features — k columns, not the full matrix the
    reference always materialises (``mutual_information.py:184-193``).

    X's feature tiles are uploaded ONCE (the H2D is the dominant cost on
    tunnelled runtimes; re-staging per column would pay it k times) and
    every column statistic runs against the resident tiles.  Counts are
    exact integers in f32, so a column here is bitwise identical to the
    corresponding column of :func:`pairwise_stat_matrix`.
    """

    def __init__(self, X_enc: np.ndarray, s: int, device=None,
                 log_base: float = math.log(2.0)):
        import os
        from ..utils.backend import execution_context

        self.n, self.p = X_enc.shape
        self.s = int(s)
        self.device = device
        self.log_base = log_base
        budget = (256 << 20) // 4
        self.tile = int(min(8192, max(8, budget // max(self.n * s, 1))))
        self.p_pad = _round_up(self.p, self.tile)
        # >1 accelerator: round-robin the feature tiles across the mesh —
        # every column statistic then computes its p-tiles in parallel
        # (tiles are independent; the only comms is the tiny result)
        self._devs = [device]
        if (device is not None
                and os.environ.get("FS_NO_AUTO_SHARD") != "1"):
            devs = [d for d in jax.devices()
                    if d.platform == device.platform]
            if len(devs) > 1:
                self._devs = devs
        # int8 staging when codes fit (4x less tunnel traffic)
        dt = np.int8 if s <= 127 else np.int32
        self._tiles = []
        self._margs = []
        for i, t0 in enumerate(range(0, self.p_pad, self.tile)):
            blk = np.zeros((self.n, self.tile), dt)
            end = min(t0 + self.tile, self.p)
            if end > t0:
                blk[:, :end - t0] = X_enc[:, t0:end]
            with execution_context(self._devs[i % len(self._devs)]):
                self._tiles.append(jax.device_put(blk))
                if self.s >= 3:
                    # per-feature marginals, staged once: the column
                    # statistics then contract only states 1.. and
                    # recover state 0 (exact) — (s-1)/s of the matmul
                    self._margs.append(
                        _tile_marginals(self._tiles[-1], s=self.s))

    def _reduce(self, tables, stat):
        n_real = np.float32(self.n)
        if stat == "mi":
            return mi_tables_reduce(tables, n_real, self.log_base)
        if stat == "su":
            return su_tables_reduce(tables, n_real)
        raise ValueError(stat)  # pragma: no cover

    def stats_vs(self, v_enc: np.ndarray, s_v: int, stat: str) -> np.ndarray:
        """stat(X_f, v) for every feature f against the 1-D codes v."""
        from ..utils.backend import execution_context

        v32 = np.asarray(v_enc, np.int32)
        sub = self.s >= 3  # state-0-dropped contraction (see __init__)
        mv = (np.bincount(v32, minlength=s_v).astype(np.float32)
              if sub else None)
        vohs = {}
        pending = []
        for i, xt in enumerate(self._tiles):
            dev = self._devs[i % len(self._devs)]
            with execution_context(dev):
                if id(dev) not in vohs:
                    # jitted one-hot: eager device ops are pathologically
                    # slow on some runtimes, and this runs per column
                    vd = jax.device_put(v32)
                    vohs[id(dev)] = (_onehot_target_sub(vd, s=s_v) if sub
                                     else _onehot_target(vd, s=s_v))
                if sub:
                    tables = _staged_tables_tile_sub(
                        xt, vohs[id(dev)], self._margs[i],
                        jnp.asarray(mv), np.float32(self.n),
                        s_x=self.s, s_y=s_v)
                else:
                    tables = _staged_tables_tile(xt, vohs[id(dev)],
                                                 s_x=self.s, s_y=s_v)
                # async dispatch: every device's tiles run concurrently;
                # the host pulls results only after all are queued
                pending.append(self._reduce(tables, stat))
        outs = [np.asarray(r) for r in pending]
        return np.concatenate(outs)[:self.p].astype(np.float64)

    def column(self, j: int, stat: str) -> np.ndarray:
        """One COLUMN of the pairwise statistic matrix, O(p * s^2)."""
        from ..utils.backend import execution_context

        ti, off = divmod(int(j), self.tile)
        with execution_context(self._devs[ti % len(self._devs)]):
            # jitted slice (eager device ops are pathologically slow on
            # some runtimes), tiny D2H of the n codes
            col = np.asarray(_slice_col(self._tiles[ti], off), np.int32)
        return self.stats_vs(col, self.s, stat)


@jax.jit
def _slice_col(xt, off):
    return jax.lax.dynamic_slice_in_dim(xt, off, 1, axis=1)[:, 0]


@partial(jax.jit, static_argnames=("s",))
def _onehot_target(v32, *, s):
    return jax.nn.one_hot(v32, s, dtype=_OH_DTYPE)


@partial(jax.jit, static_argnames=("s_x", "s_y"))
def _staged_tables_tile(Xt, yoh, *, s_x: int, s_y: int):
    n, tile = Xt.shape
    xoh = jax.nn.one_hot(Xt.astype(jnp.int32), s_x,
                         dtype=_OH_DTYPE).reshape(n, tile * s_x)
    counts = jax.lax.dot_general(
        xoh, yoh,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return counts.reshape(tile, s_x, s_y)


@partial(jax.jit, static_argnames=("s_x", "s_y"))
def _staged_tables_tile_sub(Xt, voh_sub, mx, mv, n_real,
                            *, s_x: int, s_y: int):
    """State-0-dropped twin of ``_staged_tables_tile``: contract only
    states 1.. of both sides ((s_x-1)(s_y-1)/(s_x s_y) of the matmul)
    and recover state-0 row/column from the marginals ``mx`` (tile, s_x,
    staged once) and ``mv`` (s_y,).  Exact integer arithmetic in f32."""
    n, tile = Xt.shape
    sxm, sym = s_x - 1, s_y - 1
    xoh = jax.nn.one_hot(Xt.astype(jnp.int32) - 1, sxm,
                         dtype=_OH_DTYPE).reshape(n, tile * sxm)
    sub = jax.lax.dot_general(
        xoh, voh_sub,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(tile, sxm, sym)
    col0 = mx[:, 1:] - sub.sum(axis=2)          # (tile, s_x-1)
    row0 = mv[None, 1:] - sub.sum(axis=1)       # (tile, s_y-1)
    c00 = (n_real - mx[:, 1:].sum(-1) - mv[1:].sum()
           + sub.sum(axis=(1, 2)))              # (tile,)
    top = jnp.concatenate([c00[:, None, None], row0[:, None, :]],
                          axis=-1)              # (tile, 1, s_y)
    bot = jnp.concatenate([col0[:, :, None], sub], axis=-1)
    return jnp.concatenate([top, bot], axis=1)  # (tile, s_x, s_y)


@partial(jax.jit, static_argnames=("s",))
def _tile_marginals(Xt, *, s):
    """Per-feature state counts (tile, s) of one staged tile."""
    n = Xt.shape[0]
    return jax.lax.dot_general(
        jax.nn.one_hot(Xt.astype(jnp.int32), s, dtype=_OH_DTYPE),
        jnp.ones((n,), jnp.float32).astype(_OH_DTYPE),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("s",))
def _onehot_target_sub(v32, *, s):
    """One-hot of states 1..s-1 only (state 0 rows are all-zero)."""
    return jax.nn.one_hot(v32 - 1, s - 1, dtype=_OH_DTYPE)


def pairwise_stat_columns(X_enc: np.ndarray, col: np.ndarray, s: int,
                          stat: str, device=None,
                          log_base: float = math.log(2.0)) -> np.ndarray:
    """One COLUMN of the pairwise statistic matrix (one-shot staging;
    use :class:`StagedColumnStats` when reading several columns)."""
    from ..utils.backend import execution_context

    tables = feature_target_tables(X_enc, np.asarray(col, np.int32), s, s,
                                   device)
    n_real = np.float32(X_enc.shape[0])
    with execution_context(device):
        t = jnp.asarray(tables)
        if stat == "mi":
            out = mi_tables_reduce(t, n_real, log_base)
        elif stat == "su":
            out = su_tables_reduce(t, n_real)
        else:  # pragma: no cover
            raise ValueError(stat)
        return np.asarray(out, dtype=np.float64)


def _pair_tiles(X_enc: np.ndarray, s: int):
    """Padded feature tiles for the pairwise builders.

    (tile*s)^2 count block ~400 MB / (n, tile*s) one-hot ~256 MB caps;
    big tiles keep the MXU fed and the per-call dispatch overhead low.
    Tiles stage as int8 when the cardinality allows — 4x less H2D
    traffic (the dominant cost of a pairwise matrix on tunnelled
    runtimes); the one-hot comparisons consume int8 directly."""
    n, p = X_enc.shape
    lim_block = int((400 << 20) // 4) ** 0.5
    lim_onehot = ((256 << 20) // 4) // max(n, 1)
    tile = int(min(2048, max(4, min(lim_block, lim_onehot) // max(s, 1))))
    p_pad = _round_up(p, tile)
    Xp = np.zeros((n, p_pad), np.int8 if s <= 127 else np.int32)
    Xp[:, :p] = X_enc
    return tile, Xp, p_pad // tile


@jax.jit
def _symmetrize(A):
    """stat(i,j) == stat(j,i) bitwise, zero diagonal: mirror the upper
    triangle (same contract as the host assembly below)."""
    U = jnp.triu(A, 1)
    return U + U.T


@partial(jax.jit, static_argnames=("col_len",))
def _matrix_col(R, j, *, col_len):
    return jax.lax.dynamic_slice(R, (0, j), (col_len, 1))[:, 0]


def pairwise_stat_matrix_device(X_enc: np.ndarray, s: int, stat: str,
                                device=None,
                                log_base: float = math.log(2.0)):
    """Device-RESIDENT (p, p) pairwise statistic with zero diagonal.

    Same tile math as :func:`pairwise_stat_matrix` (entries are bitwise
    identical), but the assembled matrix never leaves the accelerator —
    greedy consumers (mRMR) read the k columns they select via
    :func:`matrix_column` instead of pulling the full O(p^2) f32 matrix
    over the link (~100 MB at p=5000; the dominant fit cost measured on
    tunnelled runtimes).  Returns (R_dev, p): R_dev is (p_pad, p_pad)
    f32 on ``device``."""
    from ..utils.backend import execution_context

    n, p = X_enc.shape
    tile, Xp, nt = _pair_tiles(X_enc, s)
    with execution_context(device):
        n_real = jnp.float32(n)
        tiles = [jax.device_put(
            np.ascontiguousarray(Xp[:, t * tile:(t + 1) * tile]))
            for t in range(nt)]
        rows = []
        for ti in range(nt):
            row = []
            for tj in range(nt):
                if tj < ti:
                    # filled by the jitted mirror; zeros keep the
                    # concatenate shapes static
                    row.append(jnp.zeros((tile, tile), jnp.float32))
                else:
                    row.append(_pair_tile_stat(
                        tiles[ti], tiles[tj], n_real,
                        s=s, stat=stat, log_base=log_base))
            rows.append(jnp.concatenate(row, axis=1))
        R = _symmetrize(jnp.concatenate(rows, axis=0))
    return R, p


def matrix_column(R_dev, j: int, p: int) -> np.ndarray:
    """Column j of a device-resident pairwise matrix, as host float64."""
    col = _matrix_col(R_dev, jnp.int32(j), col_len=R_dev.shape[0])
    return np.asarray(col, np.float64)[:p]


def pairwise_stat_matrix(X_enc: np.ndarray, s: int, stat: str,
                         device=None, log_base: float = math.log(2.0),
                         symmetric: bool = True) -> np.ndarray:
    """Full (p, p) pairwise statistic ('mi' or 'su') over feature pairs."""
    import os
    from ..utils.backend import execution_context

    n, p = X_enc.shape
    if (p >= 1024 and device is not None
            and os.environ.get("FS_NO_AUTO_SHARD") != "1"):
        devs = [d for d in jax.devices() if d.platform == device.platform]
        if len(devs) > 1:
            # >1 accelerator: feature-pair tiles across the mesh (counts
            # are exact ints, so entries match this path bitwise)
            from ..parallel.feature_shard import (
                sharded_pairwise_stat_matrix)
            out = sharded_pairwise_stat_matrix(X_enc, s, stat,
                                               devices=devs,
                                               log_base=log_base)
            if symmetric:
                # same bitwise-symmetry contract as the tiled host path
                upper = np.triu(out, 1)
                out = upper + upper.T + np.diag(np.diag(out))
            return out
    tile, Xp, nt = _pair_tiles(X_enc, s)
    p_pad = nt * tile

    out = np.zeros((p_pad, p_pad), np.float64)
    with execution_context(device):
        n_real = jnp.float32(n)
        tiles = [jax.device_put(
            np.ascontiguousarray(Xp[:, t * tile:(t + 1) * tile]))
            for t in range(nt)]
        for ti in range(nt):
            j_start = ti if symmetric else 0
            for tj in range(j_start, nt):
                blk = np.asarray(_pair_tile_stat(
                    tiles[ti], tiles[tj], n_real,
                    s=s, stat=stat, log_base=log_base))
                if symmetric and tj == ti:
                    # Mirror the upper triangle so stat(i,j) == stat(j,i)
                    # bitwise (the reference computes each pair once).
                    upper = np.triu(blk, 1)
                    blk = upper + upper.T + np.diag(np.diag(blk))
                out[ti * tile:(ti + 1) * tile,
                    tj * tile:(tj + 1) * tile] = blk
                if symmetric and tj != ti:
                    out[tj * tile:(tj + 1) * tile,
                        ti * tile:(ti + 1) * tile] = blk.T
    return out[:p, :p]
