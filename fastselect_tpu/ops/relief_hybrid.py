"""Hybrid Relief engine for mixed discrete/continuous data on TPU.

Real tabular/clinical datasets mix genotype-like discrete columns with
continuous measurements.  The mixed diff semantics (Hamming for
discrete, range-scaled L1 for continuous — reference
``MultiSURF.py:37-40``) decompose the distance as

    D = D_continuous + D_discrete,

so each part can run on the unit that suits it: the continuous columns
through the fused Pallas kernels (VPU), the discrete columns as exact
one-hot int8 matmuls (MXU).  The per-pair weights are computed ONCE from
the combined D with the shared rules, then each part accumulates its own
features' scores — the discrete part via mask matmuls, the continuous
part via the Pallas pass-2 kernel.  Scores reassemble into the original
column order on host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .relief import pair_weight_rules, _sum_rules, _round_up
from .relief_discrete import (_match_rows, _accumulate_discrete,
                              _discrete_tile_sizes)
from .relief_pallas import (pallas_dist_matrix, pallas_accumulate, _tiles,
                            _focal_block_rows, _SB)

# Square path materialises (n_pad^2) f32 D and W; beyond this the blocked
# path streams focal super-blocks so only (nb, n_pad) blocks exist at once
HYBRID_SQUARE_MAX_N = 24576
# Beyond this, callers fall back to the generic streaming engine (one
# lax.map dispatch over >128k focal rows risks multi-minute dispatches —
# same cap as the continuous Pallas path).
HYBRID_MAX_N = 131072


@partial(jax.jit, static_argnames=("algo", "use_star", "k",
                                   "ti", "tj", "ftc", "ftd", "s",
                                   "v2_plans", "segs_t", "lens_t"))
def _hybrid_engine(xc, codes_d, yv, valid, recip2, disc2,
                   n_real, class_probs,
                   *, algo, use_star, k, ti, tj, ftc, ftd, s,
                   v2_plans=None, segs_t=None, lens_t=None):
    n_pad = xc.shape[0]
    p_d_pad = codes_d.shape[1]
    # pass 1: continuous part (Pallas, VPU) + discrete part (MXU)
    D = pallas_dist_matrix(xc, recip2, disc2, ti, tj, ftc,
                           cont=True)
    match = _match_rows(codes_d, codes_d, ftd, s)
    D = D + (jnp.int32(p_d_pad) - match).astype(jnp.float32)

    iid = jnp.arange(n_pad, dtype=jnp.int32)
    rules = pair_weight_rules(
        D, yv, valid, iid, yv, valid, n_real, class_probs,
        algo=algo, use_star=use_star, k=k)

    # pass 2, each part on its own unit
    if v2_plans is None:
        s_d = _accumulate_discrete(codes_d, codes_d, rules, ftd, s)
    else:
        # class-sorted rows: the discrete half contracts each rule only
        # over its support segment, exactly like the v2 single-chip
        # engine (relief_discrete._accumulate_plan)
        from .relief_discrete import _accumulate_plan
        s_d = jnp.zeros((p_d_pad,), jnp.float32)
        for pos, plan in enumerate(v2_plans):
            s0, sl = segs_t[pos], lens_t[pos]
            ci = codes_d[s0:s0 + sl]
            rules_c = [(m[s0:s0 + sl], r[s0:s0 + sl]) for m, r in rules]
            s_d = s_d + _accumulate_plan(
                ci, codes_d, rules_c, plan, segs_t, lens_t, ftd, s,
                use_star)
    W = _sum_rules(rules)
    s_c = pallas_accumulate(xc, W, recip2, disc2, ti, tj, ftc,
                            cont=True)
    return s_c, s_d


@partial(jax.jit, static_argnames=("algo", "use_star", "k",
                                   "ti", "tj", "ftc", "ftd", "s", "nb"))
def _hybrid_engine_blocked(xc, codes_d, yv, valid, recip2, disc2,
                           n_real, class_probs,
                           *, algo, use_star, k, ti, tj, ftc, ftd, s, nb):
    """Large-n mixed-data path: focal super-blocks of ``nb`` rows stream
    against all samples (mirroring ``_pallas_engine_blocked``), so only
    (nb, n_pad) distance/weight blocks materialise — mixed data keeps
    the MXU+VPU split at any n the reference handles
    (``MultiSURF.py:37-43``) instead of hard-capping at 24k samples."""
    n_pad = xc.shape[0]
    p_c_pad = xc.shape[1]
    p_d_pad = codes_d.shape[1]

    def per_block(b):
        xi = jax.lax.dynamic_slice(xc, (b * nb, 0), (nb, p_c_pad))
        ci = jax.lax.dynamic_slice(codes_d, (b * nb, 0), (nb, p_d_pad))
        D = pallas_dist_matrix(xc, recip2, disc2, ti, tj, ftc,
                               xi=xi, cont=True)
        match = _match_rows(ci, codes_d, ftd, s)
        D = D + (jnp.int32(p_d_pad) - match).astype(jnp.float32)
        iid = b * nb + jnp.arange(nb, dtype=jnp.int32)
        yi = jax.lax.dynamic_slice(yv, (b * nb,), (nb,))
        vi = jax.lax.dynamic_slice(valid, (b * nb,), (nb,))
        rules = pair_weight_rules(
            D, yi, vi, iid, yv, valid, n_real, class_probs,
            algo=algo, use_star=use_star, k=k)
        s_d = _accumulate_discrete(ci, codes_d, rules, ftd, s)
        W = _sum_rules(rules)
        s_c = pallas_accumulate(xc, W, recip2, disc2, ti, tj, ftc,
                                xi=xi, cont=True)
        return s_c, s_d

    s_c_parts, s_d_parts = jax.lax.map(per_block,
                                       jnp.arange(n_pad // nb))
    return s_c_parts.sum(axis=0), s_d_parts.sum(axis=0)


def relief_hybrid_scores(
    x: np.ndarray,
    y: np.ndarray,
    recip: np.ndarray,
    is_discrete: np.ndarray,
    *,
    algo: str,
    use_star: bool = False,
    n_neighbors: int = 0,
    class_probs: np.ndarray | None = None,
    device=None,
    codes: np.ndarray | None = None,
    n_states: int | None = None,
) -> np.ndarray:
    """Mixed-data Relief scores, split across MXU and VPU (/ n_samples).

    ``codes`` may carry per-column state codes for the full matrix (from
    ``analyze_features_device``); only its discrete columns are read.
    """
    from ..utils.backend import execution_context
    from . import relief_discrete as rd
    from .relief_discrete import encode_discrete

    n, p = x.shape
    d_idx = np.flatnonzero(is_discrete)
    c_idx = np.flatnonzero(~is_discrete)
    p_d, p_c = d_idx.size, c_idx.size

    if codes is None:
        codes_d, n_states = encode_discrete(
            np.asarray(x[:, d_idx], np.float32))
    else:
        codes_d = np.asarray(codes, np.int8)[:, d_idx]
        if n_states is None:
            n_states = int(codes_d.max()) + 1
    n_states = max(int(n_states), 1)

    # class-sorted rows for the square path: the discrete half then runs
    # the segment-restricted v2 pass 2 (feature scores are
    # row-permutation-invariant; the blocked large-n path keeps v1,
    # whose focal super-blocks would straddle class boundaries)
    v2_plans = segs_t = lens_t = None
    layout = (None if n > HYBRID_SQUARE_MAX_N
              else rd._v2_layout(np.asarray(y), n, 8, algo, class_probs))
    if layout is not None:
        classes, perm, segments, _, _ = layout
        x = np.asarray(x)[perm]
        y = np.asarray(y, np.int32)[perm]
        codes_d = codes_d[perm]
        cls_t = tuple(int(c) for c in classes)
        v2_plans = tuple(
            tuple((spec, tuple(sg)) for spec, sg in
                  rd._plan_segments(algo, use_star, cls_t, pos))
            for pos in range(len(classes)))

    # padded layouts: the sample axis must satisfy the Pallas tiling
    n_pad0 = _round_up(max(n, _SB), _SB)
    ti, tj, ftc = _tiles(_round_up(n_pad0, 256) if n_pad0 >= 256 else n_pad0,
                         _round_up(max(p_c, 1), 128))
    n_pad = _round_up(n_pad0, max(ti, tj))
    if n_pad > HYBRID_SQUARE_MAX_N:
        nb, n_pad = _focal_block_rows(n_pad, max(ti, tj))
    else:
        nb = n_pad
    p_c_pad = _round_up(max(p_c, 1), ftc)
    _, ftd = _discrete_tile_sizes(n_pad, max(p_d, 1), n_states)
    p_d_pad = _round_up(max(p_d, 1), ftd)

    xc = np.zeros((n_pad, p_c_pad), np.float32)
    xc[:n, :p_c] = x[:, c_idx]
    cd = np.zeros((n_pad, p_d_pad), np.int8)
    cd[:n, :p_d] = codes_d
    yv = np.full((n_pad,), -1, np.int32)
    yv[:n] = y
    valid = np.zeros((n_pad,), np.float32)
    valid[:n] = 1.0
    recip2 = np.zeros((1, p_c_pad), np.float32)
    recip2[0, :p_c] = recip[c_idx]
    disc2 = np.zeros((1, p_c_pad), np.float32)  # all continuous here
    if class_probs is None:
        class_probs = np.zeros((1,), np.float32)

    kw = dict(algo=algo, use_star=use_star, k=int(n_neighbors),
              ti=ti, tj=tj, ftc=ftc, ftd=ftd, s=n_states)
    if v2_plans is not None and nb == n_pad:
        segs_all = list(segments) + [(0, n_pad)]
        segs_t = tuple(int(s0) for s0, _ in segs_all)
        lens_t = tuple(int(sl) for _, sl in segs_all)
    else:
        v2_plans = None
    with execution_context(device):
        if device is not None and device.platform != "cpu":
            xc = jax.device_put(xc)
            cd = jax.device_put(cd)
        if nb == n_pad:
            s_c, s_d = _hybrid_engine(
                xc, cd, yv, valid, recip2, disc2,
                np.float32(n), np.asarray(class_probs, np.float32),
                v2_plans=v2_plans, segs_t=segs_t, lens_t=lens_t, **kw)
        else:
            s_c, s_d = _hybrid_engine_blocked(
                xc, cd, yv, valid, recip2, disc2,
                np.float32(n), np.asarray(class_probs, np.float32),
                nb=nb, **kw)
        s_c = np.asarray(s_c, np.float32)
        s_d = np.asarray(s_d, np.float32)

    scores = np.empty((p,), np.float32)
    scores[c_idx] = s_c[:p_c]
    scores[d_idx] = s_d[:p_d]
    return scores / np.float32(n)
