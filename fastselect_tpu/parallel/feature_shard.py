"""Feature-sharded Relief scoring — the p >> n (GWAS) layout.

Dual of the sample-sharded layouts (SURVEY.md §2.3 / §5: shard features
when the sample axis is small — Ulysses-vs-ring duality): each chip holds
a feature shard of the code matrix, computes PARTIAL match counts over
its features, and the (n, n) match matrix is psum-merged over ICI.
Weights are then computed redundantly on every chip (cheap, O(n^2)), and
pass 2 runs entirely locally per feature shard — the per-feature score
partials need no further communication; the final (p,) vector is
assembled with one tiled all_gather.

Per-chip memory: O(n * p / ndev + n^2); per-fit comms: one psum of the
(n, n) int32 match matrix + one all_gather of (p/ndev,) floats.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .sharded import make_mesh, shard_map
from ..ops.relief import pair_weight_rules, _round_up
from ..ops.relief_discrete import (_match_rows, _accumulate_discrete,
                                   _discrete_tile_sizes)


def feature_sharded_relief_discrete_scores(
    codes: np.ndarray,
    y: np.ndarray,
    *,
    algo: str = "multisurf",
    use_star: bool = False,
    n_neighbors: int = 0,
    n_states: int | None = None,
    class_probs: np.ndarray | None = None,
    devices=None,
    mesh: Mesh | None = None,
) -> np.ndarray:
    """All-discrete Relief scores with the feature axis sharded.

    When the class-sorted v2 layout applies, rows are sorted by class
    host-side (feature scores are row-permutation-invariant) and pass 2
    runs segment-restricted per class: each class's focal rows contract
    their hit rule only over that class's j-segment and their miss rules
    only over the other classes' segments — the same flop reduction the
    single-chip v2 engine gets (``relief_discrete._accumulate_plan``),
    entirely local to each feature shard.
    """
    from ..ops import relief_discrete as rd

    n, p = codes.shape
    if n_states is None:
        n_states = int(np.max(codes)) + 1
    if mesh is None:
        mesh = make_mesh(devices)
    ndev = mesh.devices.size
    axis = mesh.axis_names[0]

    _, ft = _discrete_tile_sizes(n, max(p // ndev, 1), n_states)
    n_pad = _round_up(n, 8)

    layout = (None if isinstance(codes, jax.Array)
              else rd._v2_layout(np.asarray(y), n, 8, algo, class_probs))
    v2_plans = None
    if layout is not None:
        classes, perm, segments, _, n_pad = layout
        codes = np.asarray(codes, np.int8)[perm]
        y = np.asarray(y, np.int32)[perm]
        cls_t = tuple(int(c) for c in classes)
        segs_all = list(segments) + [(0, n_pad)]
        segs_t = tuple(int(s0) for s0, _ in segs_all)
        lens_t = tuple(int(sl) for _, sl in segs_all)
        v2_plans = tuple(
            tuple((spec, tuple(sg)) for spec, sg in
                  rd._plan_segments(algo, use_star, cls_t, pos))
            for pos in range(len(classes)))

    # feature shard: equal ft-aligned slices per device
    pb = _round_up(-(-p // ndev), ft)
    p_pad = pb * ndev
    cpad = np.zeros((n_pad, p_pad), np.int8)
    cpad[:n, :p] = codes
    yv = np.full((n_pad,), -1, np.int32)
    yv[:n] = y
    valid = np.zeros((n_pad,), np.float32)
    valid[:n] = 1.0
    if class_probs is None:
        class_probs = np.zeros((1,), np.float32)
    k = int(n_neighbors)
    s = int(n_states)

    @partial(jax.jit, static_argnames=("bits",))
    def _run(cpk_a, yv_a, valid_a, n_real, cp, *, bits):
        def local_fn(cpk_shard, y_a, v_a, nr, cpl):
            # cpk_shard: this device's feature slice, bit-packed
            # (n_pad, pb // (8//bits)) uint8 when bits > 0 (shard-wise
            # staging — the unpacked matrix never exists on one device)
            if bits:
                c_shard = rd._unpack_codes_planes(cpk_shard, bits=bits,
                                                  p=pb)
            else:
                c_shard = cpk_shard
            # Partial mismatches over MY features; psum makes it total.
            # _match_rows counts matches, so D needs the global p_pad:
            match_local = _match_rows(c_shard, c_shard, ft, s)
            match = jax.lax.psum(match_local, axis)
            D = (jnp.int32(p_pad) - match).astype(jnp.float32)
            iid = jnp.arange(D.shape[0], dtype=jnp.int32)
            rules = pair_weight_rules(
                D, y_a, v_a, iid, y_a, v_a, nr, cpl,
                algo=algo, use_star=use_star, k=k)
            if v2_plans is None:
                part = _accumulate_discrete(c_shard, c_shard, rules,
                                            ft, s)
            else:
                # pass 2 restricted per class: sorted rows make each
                # class a static focal slice with a single-class plan
                part = jnp.zeros((pb,), jnp.float32)
                for pos, plan in enumerate(v2_plans):
                    s0, sl = segs_t[pos], lens_t[pos]
                    ci = c_shard[s0:s0 + sl]
                    rules_c = [(m[s0:s0 + sl], r[s0:s0 + sl])
                               for m, r in rules]
                    part = part + rd._accumulate_plan(
                        ci, c_shard, rules_c, plan, segs_t, lens_t,
                        ft, s, use_star)
            # per-shard totalW term is already correct: padded features
            # inside the shard cancel exactly as in the single-chip case
            return jax.lax.all_gather(part, axis, tiled=True)

        return shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(None, axis), P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )(cpk_a, yv_a, valid_a, n_real, cp)

    # shard-wise bit-packed staging: every device receives only its own
    # packed feature slice; the unpacked matrix never exists on one chip
    from ..ops.relief_discrete import stage_codes_sharded
    cpk_dev, bits = stage_codes_sharded(cpad, int(n_states), mesh,
                                        shard_axis=1)
    scores = _run(cpk_dev, jnp.asarray(yv), jnp.asarray(valid),
                  np.float32(n), jnp.asarray(class_probs, jnp.float32),
                  bits=bits)
    return np.asarray(scores, np.float32)[:p] / np.float32(n)


def sharded_pairwise_stat_matrix(
    X_enc: np.ndarray,
    s: int,
    stat: str,
    *,
    devices=None,
    mesh: Mesh | None = None,
    log_base: float | None = None,
    tile: int = 512,
) -> np.ndarray:
    """(p, p) pairwise 'mi'/'su' matrix with feature-PAIR tiles sharded
    over the mesh (SURVEY.md §3.4: tile feature pairs across chips,
    psum-free — pairs are independent).

    Each device owns a block-row: its feature shard against ALL
    features, built from the SAME tile-table builder as the
    single-device path (``ops.contingency.pair_tables`` — state-0-
    dropped contraction included, so the two can't drift and every
    entry is bitwise-identical by construction).
    Per-chip memory: O(p^2/ndev + n*tile*s); comms: the final gather
    only.
    """
    import math as _math
    from ..ops.contingency import pair_tables, pair_tables_reduce

    if log_base is None:
        log_base = _math.log(2.0)
    n, p = X_enc.shape
    if mesh is None:
        mesh = make_mesh(devices)
    ndev = mesh.devices.size
    axis = mesh.axis_names[0]

    tile = int(min(tile, _round_up(max(p // ndev, 1), 8)))
    pb = _round_up(-(-p // ndev), tile)
    p_pad = pb * ndev
    # int8 staging when codes fit (4x less tunnel traffic), uncommitted
    # device_put below — NEVER eager jnp.asarray (catastrophic transfer
    # path through tunnelled runtimes)
    dt = np.int8 if s <= 127 else np.int32
    Xp = np.zeros((n, p_pad), dt)
    Xp[:, :p] = X_enc

    @partial(jax.jit, static_argnames=("s_", "stat_", "tile_"))
    def _run(xa, n_real, *, s_, stat_, tile_):
        # int8 stays int8 in HBM; slices upcast per (n, tile) block
        # inside pair_tables (a whole-array astype would materialise a
        # replicated int32 copy, 4x the staged memory)

        def local_fn(xi_shard, xall):
            def over_i(i):
                Xi = jax.lax.dynamic_slice(xi_shard, (0, i * tile_),
                                           (n, tile_))

                def over_j(j):
                    Xj = jax.lax.dynamic_slice(xall, (0, j * tile_),
                                               (n, tile_))
                    counts = pair_tables(Xi, Xj, n_real, s=s_)
                    return pair_tables_reduce(counts, n_real,
                                              stat=stat_,
                                              log_base=log_base)

                return jax.lax.map(over_j,
                                   jnp.arange(p_pad // tile_))

            blocks = jax.lax.map(over_i, jnp.arange(pb // tile_))
            # (nti, ntj, tile, tile) -> (pb, p_pad)
            return blocks.transpose(0, 2, 1, 3).reshape(pb, p_pad)

        return shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(None, axis), P(None, None)),
            out_specs=P(axis, None),
            check_vma=False,
        )(xa, xa)

    xa = jax.device_put(Xp)
    out = _run(xa, np.float32(n), s_=int(s), stat_=stat, tile_=tile)
    return np.asarray(out, np.float64)[:p, :p]


def sharded_chi2_stats(x: np.ndarray, y_mapped: np.ndarray,
                       n_classes: int, *, devices=None,
                       mesh: Mesh | None = None) -> np.ndarray:
    """chi2 statistics with the feature axis sharded over the mesh.

    Features are fully independent for chi2 (SURVEY.md §2.3: feature-
    shard parallelism for chi2/MI); no collective is needed — each chip
    builds its observed sub-matrix with one matmul and the output comes
    back feature-sharded.
    """
    from ..ops.chi2_op import _chi2_device

    if mesh is None:
        mesh = make_mesh(devices)
    ndev = mesh.devices.size
    axis = mesh.axis_names[0]

    n, p = x.shape
    pb = _round_up(-(-p // ndev), 128)
    p_pad = pb * ndev
    xp = np.zeros((n, p_pad), np.float32)
    xp[:, :p] = x
    y32 = np.asarray(y_mapped, np.int32)

    @partial(jax.jit, static_argnames=("nc",))
    def _run(xa, ya, *, nc):
        return shard_map(
            lambda xs, ys: _chi2_device(xs, ys, n_classes=nc),
            mesh=mesh,
            in_specs=(P(None, axis), P()),
            out_specs=P(axis),
            check_vma=False,
        )(xa, ya)

    stats = _run(jnp.asarray(xp), jnp.asarray(y32), nc=int(n_classes))
    return np.asarray(stats, np.float64)[:p]
