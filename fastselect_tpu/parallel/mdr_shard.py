"""Combo-sharded MDR scoring over a device mesh.

The reference launches one CUDA thread per combination on ONE GPU
(``MDR.py:273-274``); at k >= 3 the C(p, k) grid explodes.  Here combo
index ranges are sharded across the mesh (SURVEY.md §2.3: "combos
enumerated host-side and sharded across chips"): each chip scores its
combo shard against the replicated (n, p) genotype matrix — combos are
independent, so the only communication is gathering the per-combo
balanced accuracies at the end.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .sharded import make_mesh, shard_map
from ..ops.mdr_op import _mdr_chunk_ba_folds, _mdr_tile_ba, _round_up


def sharded_batch_balanced_accuracy(
    X: np.ndarray,
    y: np.ndarray,
    combos: np.ndarray,
    k: int,
    *,
    devices=None,
    mesh: Mesh | None = None,
) -> np.ndarray:
    """Balanced accuracy of every combo's MDR model, combos sharded."""
    if mesh is None:
        mesh = make_mesh(devices)
    ndev = mesh.devices.size
    axis = mesh.axis_names[0]

    n, _ = X.shape
    n_combos = combos.shape[0]
    n_cells = 3 ** k
    n_pad = _round_up(n, 64)
    tc = int(max(8, min(1024,
                        (48 * 1024 * 1024) // (n_pad * n_cells * 4))))
    c_pad = _round_up(n_combos, tc * ndev)

    Xp = np.zeros((n_pad, X.shape[1]), np.int32)
    Xp[:n] = X
    w_case = np.zeros((n_pad,), np.float32)
    w_case[:n] = (y == 1)
    w_ctrl = np.zeros((n_pad,), np.float32)
    w_ctrl[:n] = (y != 1)
    combos_p = np.zeros((c_pad, k), np.int32)
    combos_p[:n_combos] = combos

    @partial(jax.jit, static_argnames=("k", "tc"))
    def _run(Xd, wc, wl, combos_a, *, k, tc):
        def local_fn(cmb):
            nt = cmb.shape[0] // tc

            def per_tile(t):
                tile = jax.lax.dynamic_slice(cmb, (t * tc, 0),
                                             (tc, cmb.shape[1]))
                return _mdr_tile_ba(Xd, wc, wl, tile, k=k)

            return jax.lax.map(per_tile, jnp.arange(nt)).reshape(-1)

        return shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(axis, None),),
            out_specs=P(axis),
            check_vma=False,
        )(combos_a)

    out = np.asarray(_run(jnp.asarray(Xp), jnp.asarray(w_case),
                          jnp.asarray(w_ctrl), jnp.asarray(combos_p),
                          k=k, tc=tc))
    return out[:n_combos]


class ShardedMDRFoldScorer:
    """Combo-sharded, all-folds-at-once MDR chunk scorer.

    Stages the genotype matrix and the per-fold train weights on the mesh
    ONCE (replicated — combos are the sharded axis), then scores each
    streamed combo chunk for every CV fold in one dispatch.  This is the
    chunk-outer / fold-inner structure: the expensive per-combo one-hot
    cell tensor is built once per chunk and contracted against all folds'
    weights, instead of re-launching the whole search per fold like the
    reference (``MDR.py:262-276``).
    """

    def __init__(self, X: np.ndarray, w_case: np.ndarray,
                 w_ctrl: np.ndarray, k: int, *, devices=None,
                 mesh: Mesh | None = None):
        if mesh is None:
            mesh = make_mesh(devices)
        self.mesh = mesh
        self.ndev = mesh.devices.size
        self.axis = mesh.axis_names[0]
        self.k = int(k)
        n_cells = 3 ** self.k
        n = X.shape[0]
        f = w_case.shape[0]
        n_pad = _round_up(n, 64)
        self.tc = int(max(8, min(1024,
                                 (48 * 1024 * 1024) // (n_pad * n_cells * 4))))
        self.exact = n_pad < 65536  # int32 selection-key guard
        Xp = np.zeros((n_pad, X.shape[1]), np.int32)
        Xp[:n] = X
        wc = np.zeros((f, n_pad), np.float32)
        wc[:, :n] = w_case
        wl = np.zeros((f, n_pad), np.float32)
        wl[:, :n] = w_ctrl
        self.Xd = jnp.asarray(Xp)
        self.wc = jnp.asarray(wc)
        self.wl = jnp.asarray(wl)

        @partial(jax.jit, static_argnames=("k", "tc"))
        def _run(Xd, wc_, wl_, combos_a, *, k, tc):
            def local_fn(cmb):
                return _mdr_chunk_ba_folds(Xd, wc_, wl_, cmb, k=k, tc=tc)

            return shard_map(
                local_fn, mesh=mesh,
                in_specs=(P(self.axis, None),),
                out_specs=P(None, self.axis),
                check_vma=False,
            )(combos_a)

        self._run = _run

    def __call__(self, combos: np.ndarray) -> np.ndarray:
        """(F, n_combos) balanced accuracies for one combo chunk."""
        m = combos.shape[0]
        c_pad = _round_up(m, self.tc * self.ndev)
        combos_p = np.zeros((c_pad, self.k), np.int32)
        combos_p[:m] = combos
        out = np.asarray(self._run(self.Xd, self.wc, self.wl,
                                   jnp.asarray(combos_p),
                                   k=self.k, tc=self.tc))
        return out[:, :m]

    def search_all(self, p: int, n_combos: int, chunk: int = 1 << 18):
        """Per-fold (best BA, best rank) over ALL C(p, k) combos with
        the rank range sharded over the mesh: each device unranks and
        scores its own contiguous rank slice (no combo H2D at all) and
        only the per-device (F,) maxima are gathered.  Requires
        comb(p, k) < 2^31 (int32 device arithmetic).  Maxima merge on
        the exact integer selection key (n < 65536) — see
        :func:`fastselect_tpu.ops.mdr_op._mdr_chunk_ba_folds`."""
        from ..ops.mdr_op import _comb_tables, _mdr_best_in_range

        f = self.wc.shape[0]
        m_local = _round_up(min(chunk, max(n_combos, 1)), self.tc)
        step = m_local * self.ndev
        tb = jnp.asarray(_comb_tables(p, self.k))
        nc = jnp.int32(n_combos)
        mesh, axis = self.mesh, self.axis

        @partial(jax.jit, static_argnames=("k", "tc", "m", "exact"))
        def _run(Xd, wc_, wl_, tb_, r0, nc_, *, k, tc, m, exact):
            def local_fn(Xl, wcl, wll, tbl, r0l, ncl):
                me = jax.lax.axis_index(axis).astype(jnp.int32)
                # clamp the per-device OFFSET before adding r0l so a
                # device whose slice starts past n_combos never computes
                # r0l + me*m > INT32_MAX (it would wrap negative); a
                # clamped device re-scores the last combo, which can
                # only tie the real maximum (strict > host merge keeps
                # the earlier, real entry).
                r0_dev = r0l + jnp.minimum(me * m, ncl - 1 - r0l)
                vals, scs, ranks = _mdr_best_in_range(
                    Xl, wcl, wll, tbl, r0_dev, ncl,
                    k=k, tc=tc, m=m, exact=exact)
                return vals[None, :], scs[None, :], ranks[None, :]

            return shard_map(
                local_fn, mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(), P()),
                out_specs=(P(axis, None), P(axis, None), P(axis, None)),
                check_vma=False,
            )(Xd, wc_, wl_, tb_, r0, nc_)

        best_v = np.full((f,), -np.inf, np.float64)
        best_s = np.full((f,), -np.inf, np.float64)
        best_r = np.zeros((f,), np.int64)
        pending = []
        for r0 in range(0, n_combos, step):
            pending.append(_run(self.Xd, self.wc, self.wl, tb,
                                jnp.int32(r0), nc,
                                k=self.k, tc=self.tc, m=m_local,
                                exact=self.exact))
        for vals, scs, ranks in pending:
            vals = np.asarray(vals, np.float64)    # (ndev, F)
            scs = np.asarray(scs, np.float64)
            ranks = np.asarray(ranks, np.int64)
            for d in range(vals.shape[0]):         # ascending rank order
                upd = scs[d] > best_s
                best_s[upd] = scs[d][upd]
                best_v[upd] = vals[d][upd]
                best_r[upd] = ranks[d][upd]
        return best_v, best_r
