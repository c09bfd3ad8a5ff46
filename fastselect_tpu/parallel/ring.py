"""Ring-pass Relief scoring: X never replicated, sample blocks rotate
over ICI.

The replicated layout in ``sharded.py`` needs every chip to hold all of
X — fine until n * p bytes approaches per-chip HBM.  Here both the focal
axis AND the j-axis are sharded: each chip holds only its own sample
block, and blocks rotate around the ring with ``lax.ppermute`` so every
chip eventually scores its focal block against all of X (SURVEY.md §5:
the all-pairs n x n interaction is this library's "sequence length";
this is the ring-attention-style blocking of it, per-chip memory
O(n*p/ndev + n^2/ndev) instead of O(n*p)).

Two sweeps mirror the engine's two passes (the per-sample threshold
needs the FULL distance row before any weight can be computed):

  sweep 1: rotate blocks ndev times, accumulating exact match counts
           (nf_local, n) via the discrete engine's one-hot matmuls;
  weights: D = p_pad - match -> shared (mask, coeff) rules;
  sweep 2: rotate blocks again; each step contracts the mask columns
           belonging to the in-flight block against its one-hot states,
           accumulating per-feature score partials; one psum at the end.
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


def _ring_rule_groups(algo, use_star, n_classes):
    """Rule-index groups sharing one j-support kind.

    'same' rules touch only j-columns of the focal row's own class,
    'other' rules only the remaining classes, ('cls', c) exactly class c
    (the rule-list positions mirror ``relief.pair_weight_rules``)."""
    if algo == "multisurf":
        return [("same", (0,)),
                ("other", (1, 2) if use_star else (1,))]
    if algo == "surf":
        return [("same", (1, 2) if use_star else (1,)),
                ("other", (0, 3) if use_star else (0,))]
    return ([("same", (0,))]
            + [(("cls", c), (1 + c,)) for c in range(n_classes)])


def _ring_skip_table(groups, segments, n, nb, ndev):
    """(n_groups, ndev, ndev) int8: does ring step ``owner``'s block hold
    any j-column that group ``g``'s rules can select for device ``me``'s
    focal rows?  Built host-side from the class-sorted segment bounds —
    zero entries let sweep 2 skip the whole contraction."""
    n_cls = len(segments)

    def seg_overlaps(seg_list, o):
        lo, hi = o * nb, (o + 1) * nb
        return any(s0 < hi and s0 + sl > lo for s0, sl in seg_list)

    cls_of_dev = []
    for d in range(ndev):
        lo, hi = d * nb, min((d + 1) * nb, n)
        cls_of_dev.append({c for c, (s0, sl) in enumerate(segments)
                           if s0 < hi and s0 + sl > lo})
    tbl = np.zeros((len(groups), ndev, ndev), np.int8)
    for g, (kind, _idxs) in enumerate(groups):
        for d in range(ndev):
            if kind == "same":
                sup = cls_of_dev[d]
            elif kind == "other":
                sup = set()
                for a in cls_of_dev[d]:
                    sup |= {c for c in range(n_cls) if c != a}
            else:
                sup = {kind[1]} if cls_of_dev[d] else set()
            segs_sup = [segments[c] for c in sup]
            for o in range(ndev):
                tbl[g, d, o] = seg_overlaps(segs_sup, o)
    return tbl


def ring_relief_discrete_scores(
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
    """All-discrete Relief scores with ring-rotated sample blocks.

    When the class-sorted v2 layout applies, rows are sorted by class
    host-side and sweep 2 consults a per-(rule-group, me, owner) skip
    table: a ring step whose in-flight block holds no j-column in the
    group's support segments skips that contraction entirely
    (``lax.cond``) — the ring-layout form of the v2 segment
    restriction (single-class devices run ~1/R of the pass-2 matmuls).
    """
    from ..ops import relief_discrete as rd

    n, p = codes.shape
    if n_states is None:
        n_states = int(np.max(codes)) + 1
    if mesh is None:
        mesh = make_mesh(devices)
    ndev = mesh.devices.size
    axis = mesh.axis_names[0]

    _, ft = _discrete_tile_sizes(max(n // ndev, 1), p, n_states)
    # block size: per-device sample count, tile-aligned
    nb = _round_up(-(-n // ndev), 8)
    n_pad = nb * ndev
    p_pad = _round_up(p, ft)

    layout = (None if isinstance(codes, jax.Array)
              else rd._v2_layout(np.asarray(y), n, 8, algo, class_probs))
    if layout is not None:
        classes, perm, segments, _, _ = layout
        codes = np.asarray(codes, np.int8)[perm]
        y = np.asarray(y, np.int32)[perm]
        groups = _ring_rule_groups(algo, use_star, len(classes))
        skip_tbl = _ring_skip_table(groups, segments, n, nb, ndev)
    else:
        groups, skip_tbl = None, None

    cpad = np.zeros((n_pad, p_pad), np.int8)
    cpad[:n, :p] = codes
    yv = np.full((n_pad,), -1, np.int32)
    yv[:n] = y
    valid = np.zeros((n_pad,), np.float32)
    valid[:n] = 1.0
    if class_probs is None:
        class_probs = np.zeros((1,), np.float32)

    @partial(jax.jit,
             static_argnames=("algo", "use_star", "k", "ft", "s", "bits"))
    def _run(cpk_a, yv_a, valid_a, n_real, cp,
             *, algo, use_star, k, ft, s, bits):
        def local_fn(cpk_blk, y_blk, v_blk, nr, cpl):
            # cpk_blk: this device's sample block, bit-packed (nb, pb)
            # uint8 when bits > 0 (shard-wise staging — the unpacked
            # matrix never exists on one device; blocks also rotate
            # PACKED, 8//bits x less ICI traffic per ring step)
            def unpack(pkb):
                if bits == 0:
                    return pkb
                from ..ops.relief_discrete import _unpack_codes_planes
                return _unpack_codes_planes(pkb, bits=bits, p=p_pad)

            c_blk = unpack(cpk_blk)
            me = jax.lax.axis_index(axis).astype(jnp.int32)
            perm = [(i, (i + 1) % ndev) for i in range(ndev)]

            # sweep 1: accumulate full match rows for MY focal block
            def sweep1(carry, _t):
                pkb, owner, match = carry
                m_blk = _match_rows(c_blk, unpack(pkb), ft, s)  # (nb, nb)
                match = jax.lax.dynamic_update_slice(
                    match, m_blk, (jnp.int32(0), owner * nb))
                nxt = jax.lax.ppermute(pkb, axis, perm)
                nxt_owner = (owner - 1) % ndev
                return (nxt, nxt_owner, match), None

            match0 = jnp.zeros((nb, n_pad), jnp.int32)
            (_, _, match), _ = jax.lax.scan(
                sweep1, (cpk_blk, me, match0), jnp.arange(ndev))

            D = (jnp.int32(p_pad) - match).astype(jnp.float32)
            iid = me * nb + jnp.arange(nb, dtype=jnp.int32)
            # y/validity of ALL samples: small vectors, gathered once
            y_all = jax.lax.all_gather(y_blk, axis, tiled=True)
            v_all = jax.lax.all_gather(v_blk, axis, tiled=True)
            y_me = jax.lax.dynamic_slice(y_all, (me * nb,), (nb,))
            v_me = jax.lax.dynamic_slice(v_all, (me * nb,), (nb,))
            rules = pair_weight_rules(
                D, y_me, v_me, iid, y_all, v_all, nr, cpl,
                algo=algo, use_star=use_star, k=k)

            # sweep 2: rotate blocks again, contracting the mask columns
            # of the in-flight block against its one-hot states; with a
            # skip table, rule groups whose support segments miss the
            # in-flight block skip their contraction entirely
            tbl_j = (None if skip_tbl is None
                     else jnp.asarray(skip_tbl, jnp.int8))

            def sweep2(carry, _t):
                pkb, owner, part = carry
                blk = unpack(pkb)

                def sub(idxs):
                    return [(jax.lax.dynamic_slice(
                        rules[i][0], (0, owner * nb), (nb, nb)),
                        rules[i][1]) for i in idxs]

                if tbl_j is None:
                    part = part + _accumulate_discrete(
                        c_blk, blk, sub(range(len(rules))), ft, s)
                else:
                    for g, (_kind, idxs) in enumerate(groups):
                        sub_g = sub(idxs)

                        def do(blk=blk, sub_g=sub_g):
                            return _accumulate_discrete(
                                c_blk, blk, sub_g, ft, s)

                        part = part + jax.lax.cond(
                            tbl_j[g, me, owner] > 0, do,
                            lambda: jnp.zeros((p_pad,), jnp.float32))
                nxt = jax.lax.ppermute(pkb, axis, perm)
                nxt_owner = (owner - 1) % ndev
                return (nxt, nxt_owner, part), None

            part0 = jnp.zeros((p_pad,), jnp.float32)
            (_, _, part), _ = jax.lax.scan(
                sweep2, (cpk_blk, me, part0), jnp.arange(ndev))
            return jax.lax.psum(part, axis)

        return shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(axis, None), P(axis), P(axis), P(), P()),
            out_specs=P(),
            check_vma=False,
        )(cpk_a, yv_a, valid_a, n_real, cp)

    # shard-wise bit-packed staging: every device receives only its own
    # packed row block; the unpacked matrix never exists on one chip
    from ..ops.relief_discrete import stage_codes_sharded
    cpk_dev, bits = stage_codes_sharded(cpad, int(n_states), mesh,
                                        shard_axis=0)
    scores = _run(cpk_dev, jnp.asarray(yv), jnp.asarray(valid),
                  np.float32(n), jnp.asarray(class_probs, jnp.float32),
                  algo=algo, use_star=use_star, k=int(n_neighbors),
                  ft=ft, s=int(n_states), bits=bits)
    return np.asarray(scores, np.float32)[:p] / np.float32(n)
