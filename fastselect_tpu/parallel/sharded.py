"""Multi-chip Relief scoring: shard_map over a device mesh.

The reference's only parallelism is threads over focal samples
(``MultiSURF.py:174`` prange) on one host.  The TPU-native equivalent
(SURVEY.md §2.3) is sample-shard data parallelism: the focal-sample axis is
sharded across the mesh, each chip scores its focal block against all
samples, and the per-feature score partials are merged with a single
``psum`` over ICI.  The engine itself is unchanged —
``relief_engine_core`` takes (focal shard, global row offset, full array).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.relief import relief_engine_core, pack_chunks, _round_up

try:  # JAX >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_mesh(devices=None, axis_name: str = "dp") -> Mesh:
    """1-D device mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def sharded_relief_scores(
    x: np.ndarray,
    y: np.ndarray,
    recip: np.ndarray,
    is_discrete: np.ndarray,
    *,
    algo: str = "multisurf",
    use_star: bool = False,
    n_neighbors: int = 0,
    class_probs: np.ndarray | None = None,
    devices=None,
    mesh: Mesh | None = None,
) -> np.ndarray:
    """Relief-family scores computed data-parallel over a device mesh.

    Focal samples are sharded over the mesh's single axis; X (chunked
    layout) is replicated so each chip sees all j-blocks; per-feature
    partial score vectors are psum-merged over ICI.
    """
    n, p = x.shape
    if mesh is None:
        mesh = make_mesh(devices)
    ndev = mesh.devices.size
    axis = mesh.axis_names[0]

    # Focal tile must divide each device's shard.
    t = 64 if n >= 64 * ndev else max(8, _round_up(max(n // ndev, 1), 8))
    xf, yv, valid, recipf, discf, (t, cj) = pack_chunks(
        np.asarray(x, np.float32), np.asarray(y, np.int32),
        recip, is_discrete, t=t)
    n_pad = xf.shape[1]
    # Extend padding so the focal axis splits evenly across devices into
    # tile multiples.
    n_shard = _round_up(n_pad, t * ndev)
    if n_shard > n_pad:
        extra = n_shard - n_pad
        xf = np.concatenate(
            [xf, np.zeros((xf.shape[0], extra, xf.shape[2]), xf.dtype)],
            axis=1)
        yv = np.concatenate([yv, np.full((extra,), -1, yv.dtype)])
        valid = np.concatenate([valid, np.zeros((extra,), valid.dtype)])
        n_pad = n_shard
    nf_local = n_pad // ndev
    # j-chunk must divide n_pad; pick the largest tile-multiple divisor
    # at most the target (n_pad is a t-multiple, so cj never collapses
    # below t — repeated halving could silently degrade it to 1 for odd
    # paddings, a dispatch-bound perf cliff).
    m = n_pad // t
    k = max(1, min(cj // t, m))
    while m % k:
        k -= 1
    cj = k * t

    if class_probs is None:
        class_probs = np.zeros((1,), np.float32)

    @partial(jax.jit, static_argnames=("algo", "use_star", "k", "t", "cj"))
    def _run(xf_a, yv_a, valid_a, recipf_a, discf_a, n_real, cp,
             *, algo, use_star, k, t, cj):
        def local_fn(xf_f, yv_f, valid_f, xf_all, yv_all, valid_all,
                     rf, df, nr, cpl):
            row0 = jax.lax.axis_index(axis).astype(jnp.int32) * nf_local
            partial_scores = relief_engine_core(
                xf_f, yv_f, valid_f, row0,
                xf_all, yv_all, valid_all, rf, df, nr, cpl,
                algo=algo, use_star=use_star, k=k, t=t, cj=cj)
            return jax.lax.psum(partial_scores, axis)

        return shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(None, axis, None), P(axis), P(axis),
                      P(), P(), P(), P(), P(), P(), P()),
            out_specs=P(),
            # engine scan carries start from unvarying zeros; skip the
            # varying-manual-axes type check.
            check_vma=False,
        )(xf_a, yv_a, valid_a, xf_a, yv_a, valid_a, recipf_a, discf_a,
          n_real, cp)

    scores = _run(jnp.asarray(xf), jnp.asarray(yv), jnp.asarray(valid),
                  jnp.asarray(recipf), jnp.asarray(discf), np.float32(n),
                  jnp.asarray(class_probs, jnp.float32),
                  algo=algo, use_star=use_star, k=int(n_neighbors),
                  t=t, cj=cj)
    return np.asarray(scores, np.float32)[:p] / np.float32(n)


def sharded_multisurf_scores(x, y, recip, is_discrete, *, devices=None,
                             use_star: bool = False) -> np.ndarray:
    """Convenience wrapper: data-parallel MultiSURF scoring."""
    return sharded_relief_scores(
        x, y, recip, is_discrete, algo="multisurf", use_star=use_star,
        devices=devices)


def _sharded_discrete_v2(codes, y, layout, n, p, n_states, class_probs,
                         mesh, *, algo, use_star, k, ti, ft):
    """Class-sorted, segment-restricted sample-shard engine.

    The focal blocks of the sorted layout carry per-class static matmul
    plans (``relief_discrete._plan_segments``), so the v2 pass-2
    restriction — contract each rule only over its support segment —
    runs on every chip.  Blocks of each plan group are dealt round-robin
    to devices (block order is irrelevant: partials sum), giving every
    device the same per-group slot count; imbalance slots repeat a block
    with weight 0 so the traced program is uniform across the mesh.
    """
    from ..ops import relief_discrete as rd

    ndev = mesh.devices.size
    axis = mesh.axis_names[0]
    classes, perm, segments, block_class, n_pad = layout
    p_pad = _round_up(p, ft)
    y_np = np.asarray(y, np.int32)
    # stage the UNSORTED codes with one uncommitted device_put and
    # class-sort on device (gather): a host-side sorted copy of a
    # GWAS-scale matrix costs seconds of memcpy plus a second full
    # transfer-sized buffer
    gather_idx = np.zeros((n_pad,), np.int32)
    gather_idx[:n] = perm
    row_valid = np.zeros((n_pad,), np.float32)
    row_valid[:n] = 1.0
    yv = np.full((n_pad,), -1, np.int32)
    yv[:n] = y_np[perm]
    codes_dev = rd.stage_codes_device(codes, int(n_states))
    cpad = rd._apply_layout_device(
        codes_dev, jnp.asarray(gather_idx), jnp.asarray(row_valid),
        n_pad=n_pad, p_pad=p_pad)
    valid = row_valid

    cls_t = tuple(int(c) for c in classes)
    plan_of = {pos: tuple((spec, tuple(segs)) for spec, segs in
                          rd._plan_segments(algo, use_star, cls_t, pos))
               for pos in set(block_class)}
    groups: dict = {}
    for b, pos in enumerate(block_class):
        groups.setdefault(plan_of[pos], []).append(b)
    plans = tuple(groups.keys())
    barrs, warrs = [], []
    for blocks in groups.values():
        slots = -(-len(blocks) // ndev)
        ba = np.full((ndev, slots), blocks[0], np.int32)
        wa = np.zeros((ndev, slots), np.float32)
        for i, b in enumerate(blocks):
            ba[i % ndev, i // ndev] = b
            wa[i % ndev, i // ndev] = 1.0
        barrs.append(jnp.asarray(ba))
        warrs.append(jnp.asarray(wa))

    segs_all = list(segments) + [(0, n_pad)]
    segs_t = tuple(int(s) for s, _ in segs_all)
    lens_t = tuple(int(l) for _, l in segs_all)
    if class_probs is None:
        class_probs = np.zeros((1,), np.float32)

    @jax.jit
    def _run(cpad_a, yv_a, valid_a, n_real, cp, bas, was):
        def local_fn(c_a, y_a, v_a, nr, cpl, ba_l, wa_l):
            total = jnp.zeros((p_pad,), jnp.float32)
            for plan, ba, wa in zip(plans, ba_l, wa_l):
                ba1, wa1 = ba[0], wa[0]

                def per_slot(i, plan=plan, ba1=ba1, wa1=wa1):
                    b = ba1[i]
                    ci = jax.lax.dynamic_slice(
                        c_a, (b * ti, 0), (ti, p_pad))
                    yi = jax.lax.dynamic_slice(y_a, (b * ti,), (ti,))
                    vi = jax.lax.dynamic_slice(v_a, (b * ti,), (ti,))
                    iid = b * ti + jnp.arange(ti, dtype=jnp.int32)
                    part = rd._block_scores_v2(
                        ci, yi, vi, iid, c_a, y_a, v_a, nr, cpl,
                        algo=algo, use_star=use_star, k=k, ft=ft,
                        n_states=int(n_states), plan=plan,
                        seg_starts=segs_t, seg_lens=lens_t)
                    return part * wa1[i]

                parts = jax.lax.map(
                    per_slot, jnp.arange(ba1.shape[0]))
                total = total + parts.sum(axis=0)
            return jax.lax.psum(total, axis)

        return shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(),
                      P(axis, None), P(axis, None)),
            out_specs=P(),
            check_vma=False,
        )(cpad_a, yv_a, valid_a, n_real, cp, bas, was)

    scores = _run(cpad, jnp.asarray(yv), jnp.asarray(valid),
                  np.float32(n), np.asarray(class_probs, np.float32),
                  tuple(barrs), tuple(warrs))
    return np.asarray(scores, np.float32)[:p] / np.float32(n)


def sharded_relief_discrete_scores(
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
    """All-discrete Relief scoring, data-parallel over a device mesh.

    Same focal-shard layout as :func:`sharded_relief_scores` but through
    the discrete MXU engine: when the class-sorted v2 layout applies
    (``relief_discrete._v2_layout``) each chip runs the
    segment-restricted pass 2 on its dealt focal blocks
    (:func:`_sharded_discrete_v2`); otherwise each chip one-hot-matmuls
    its focal shard through ``relief_discrete.relief_discrete_core``.
    Per-feature partials merge with one psum over ICI either way.
    """
    from ..ops.relief_discrete import (relief_discrete_core, pack_discrete,
                                       _discrete_tile_sizes, _v2_layout)

    n, p = codes.shape
    if n_states is None:
        n_states = int(np.max(codes)) + 1
    if mesh is None:
        mesh = make_mesh(devices)
    ndev = mesh.devices.size
    axis = mesh.axis_names[0]

    ti0, ft = _discrete_tile_sizes(n, p, n_states)
    # focal tile must divide each device's shard
    ti = min(ti0, max(8, _round_up(n // ndev or 1, 8)))

    layout = _v2_layout(np.asarray(y), n, ti, algo, class_probs)
    if layout is not None and not isinstance(codes, jax.Array):
        return _sharded_discrete_v2(
            codes, y, layout, n, p, n_states, class_probs, mesh,
            algo=algo, use_star=use_star, k=int(n_neighbors),
            ti=ti, ft=ft)
    cpad, yv, valid, (ti, ft) = pack_discrete(
        np.asarray(codes, np.int8), np.asarray(y, np.int32), n_states,
        ti=ti, ft=ft)
    n_pad = cpad.shape[0]
    n_shard = _round_up(n_pad, ti * ndev)
    if n_shard > n_pad:
        extra = n_shard - n_pad
        cpad = np.concatenate(
            [cpad, np.zeros((extra, cpad.shape[1]), cpad.dtype)])
        yv = np.concatenate([yv, np.full((extra,), -1, yv.dtype)])
        valid = np.concatenate([valid, np.zeros((extra,), valid.dtype)])
        n_pad = n_shard
    nf_local = n_pad // ndev
    if class_probs is None:
        class_probs = np.zeros((1,), np.float32)

    @partial(jax.jit,
             static_argnames=("algo", "use_star", "k", "ti", "ft", "s"))
    def _run(cpad_a, yv_a, valid_a, n_real, cp,
             *, algo, use_star, k, ti, ft, s):
        def local_fn(c_f, y_f, v_f, c_a, y_a, v_a, nr, cpl):
            row0 = jax.lax.axis_index(axis).astype(jnp.int32) * nf_local
            part = relief_discrete_core(
                c_f, y_f, v_f, row0, c_a, y_a, v_a, nr, cpl,
                algo=algo, use_star=use_star, k=k, ti=ti, ft=ft,
                n_states=s)
            return jax.lax.psum(part, axis)

        return shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(axis, None), P(axis), P(axis),
                      P(), P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )(cpad_a, yv_a, valid_a, cpad_a, yv_a, valid_a, n_real, cp)

    scores = _run(jnp.asarray(cpad), jnp.asarray(yv), jnp.asarray(valid),
                  np.float32(n), jnp.asarray(class_probs, jnp.float32),
                  algo=algo, use_star=use_star, k=int(n_neighbors),
                  ti=ti, ft=ft, s=int(n_states))
    return np.asarray(scores, np.float32)[:p] / np.float32(n)
