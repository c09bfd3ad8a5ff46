"""Unified TPU engine for the Relief family (ReliefF / SURF / MultiSURF).

The reference implements the same O(n^2 * p) pairwise loop ten times over
(Numba CPU + CUDA twins in ``MultiSURF.py``, ``SURF.py``, ``ReliefF.py``).
Here there is ONE engine with algorithm-specific *weighting rules*:

  pass 1:  distance rows  D[i, j] = sum_f diff(i, j, f)
           where diff is Hamming for discrete features and range-scaled L1
           for continuous ones (reference ``MultiSURF.py:37-40`` semantics).
  weights: an (i, j) weight matrix W derived from D per algorithm:
             * MultiSURF:  near = D < mu_i - sigma_i/2; hits get -1/n_hit,
               misses +1/n_miss; MultiSURF* adds far misses at -1/n_miss
               (reference ``MultiSURF.py:193-251``).
             * SURF: near = D < mean_i; +/-1 weights; SURF* adds far hits at
               +1 and far misses at -1 (reference ``SURF.py:131-195``).
             * ReliefF (CPU semantics, the parity target): k nearest hits at
               -1/h_found, k nearest misses PER CLASS at P(c)/(1-P(y_i))/k
               (reference ``ReliefF.py:137-220``).
  pass 2:  scores[f] = sum_ij W[i, j] * diff(i, j, f)

Blocking: focal tiles of T samples stream against j-chunks of CJ samples and
feature chunks of FC — chunk sizes chosen so the (T, CJ, FC) diff
temporaries stay ~100 MB (XLA materialises broadcast temporaries to HBM;
oversized chunks thrash, undersized ones are dispatch-bound).  Static
shapes, lax control flow, fp32 accumulation.  Inputs are zero-padded to
chunk multiples; padded rows/features are masked via validity vectors
(padded features produce exactly 0 diff: recip = 0, discrete flag False).

The per-sample normalisation (scores / n_samples, reference
``MultiSURF.py:162,270``) is applied by the caller.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.float32(3.0e38)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _diff_block(xi_c, xj_c, recip_c, disc_c):
    """diff tensor for one (i-tile, j-chunk, f-chunk): (T, CJ, FC)."""
    a = xi_c[:, None, :]
    b = xj_c[None, :, :]
    cont = jnp.abs(a - b) * recip_c[None, None, :]
    disc = (a != b).astype(jnp.float32)
    return jnp.where(disc_c[None, None, :], disc, cont)


def _dist_rows(xi, Xf, recipf, discf, cj):
    """Pass 1 for one focal tile: full distance rows (T, n_pad).

    xi: (NFC, T, FC) focal tile; Xf: (NFC, n_pad, FC) all samples.
    """
    nfc, t, fc = xi.shape
    n_pad = Xf.shape[1]
    nj = n_pad // cj

    def over_j(j):
        xj = jax.lax.dynamic_slice(Xf, (0, j * cj, 0), (nfc, cj, fc))

        def over_f(acc, c):
            xi_c, xj_c, r_c, d_c = c
            acc = acc + _diff_block(xi_c, xj_c, r_c, d_c).sum(axis=-1)
            return acc, None

        blk, _ = jax.lax.scan(
            over_f, jnp.zeros((t, cj), jnp.float32),
            (xi, xj, recipf, discf))
        return blk  # (T, CJ)

    d_blocks = jax.lax.map(over_j, jnp.arange(nj))  # (NJ, T, CJ)
    return d_blocks.transpose(1, 0, 2).reshape(t, n_pad)


def _accumulate_scores(xi, Xf, recipf, discf, W, cj):
    """Pass 2 for one focal tile: partial scores (NFC, FC).

    W: (T, n_pad) pairwise weights for this focal tile.
    """
    nfc, t, fc = xi.shape
    n_pad = Xf.shape[1]
    nj = n_pad // cj
    Wb = W.reshape(t, nj, cj).transpose(1, 0, 2)  # (NJ, T, CJ)

    def over_f(fi):
        xi_c = xi[fi]        # (T, FC)
        r_c = recipf[fi]
        d_c = discf[fi]

        def over_j(acc, j):
            xj_c = jax.lax.dynamic_slice(Xf, (fi, j * cj, 0),
                                         (1, cj, fc))[0]
            diff = _diff_block(xi_c, xj_c, r_c, d_c)  # (T, CJ, FC)
            acc = acc + jnp.einsum(
                "ij,ijf->f", Wb[j], diff,
                preferred_element_type=jnp.float32)
            return acc, None

        part, _ = jax.lax.scan(over_j, jnp.zeros((fc,), jnp.float32),
                               jnp.arange(nj))
        return part

    return jax.lax.map(over_f, jnp.arange(nfc))  # (NFC, FC)


# ---------------------------------------------------------------------------
# Per-algorithm weight rules
# ---------------------------------------------------------------------------

def _pair_masks(D, yi, vi, iid, y_flat, valid_flat):
    jid = jax.lax.broadcasted_iota(jnp.int32, D.shape, 1)
    not_self = jid != iid[:, None]
    vmask = (valid_flat[None, :] > 0) & (vi[:, None] > 0) & not_self
    hit = y_flat[None, :] == yi[:, None]
    return vmask, hit


def _row_mean_stats(D, vmask, n_real):
    Dm = jnp.where(vmask, D, 0.0)
    denom = jnp.float32(1.0) / (n_real - 1.0)
    sum_d = Dm.sum(axis=1)
    mu = sum_d * denom
    return Dm, mu, denom


def _rules_multisurf(D, yi, vi, iid, y_flat, valid_flat, n_real, use_star):
    """mu - sigma/2 adaptive threshold (reference MultiSURF.py:193-251).

    Returns the pairwise weight matrix decomposed as a list of
    ``(boolean mask (T, n), per-row coefficient (T,))`` terms with
    ``W = sum_k r_k[:, None] * M_k``.  The generic engine sums them into a
    dense W; the discrete MXU engine multiplies each 0/1 mask against
    one-hot state matrices so every matmul input is exactly representable.
    """
    vmask, hit = _pair_masks(D, yi, vi, iid, y_flat, valid_flat)
    Dm, mu, denom = _row_mean_stats(D, vmask, n_real)
    sum_d2 = (Dm * Dm).sum(axis=1)
    var = jnp.maximum(0.0, sum_d2 * denom - mu * mu)
    thresh = mu - 0.5 * jnp.sqrt(var)

    near = (D < thresh[:, None]) & vmask
    near_hit = near & hit
    near_miss = near & ~hit
    n_hit = near_hit.sum(axis=1).astype(jnp.float32)
    n_miss = near_miss.sum(axis=1).astype(jnp.float32)
    w_hit = -1.0 / jnp.maximum(n_hit, 1.0)
    w_miss = 1.0 / jnp.maximum(n_miss, 1.0)

    rules = [(near_hit, w_hit), (near_miss, w_miss)]
    if use_star:
        far_miss = vmask & ~near & ~hit
        rules.append((far_miss, -w_miss))
    return rules


def _rules_surf(D, yi, vi, iid, y_flat, valid_flat, n_real, use_star):
    """Mean-distance threshold, unit weights (reference SURF.py:131-195)."""
    vmask, hit = _pair_masks(D, yi, vi, iid, y_flat, valid_flat)
    _, mu, _ = _row_mean_stats(D, vmask, n_real)
    near = (D < mu[:, None]) & vmask
    ones = jnp.ones(D.shape[:1], jnp.float32)
    rules = [(near & ~hit, ones), (near & hit, -ones)]
    if use_star:
        far = vmask & ~near
        rules.append((far & hit, ones))
        rules.append((far & ~hit, -ones))
    return rules


def _sum_rules(rules):
    """Dense pairwise weight matrix from (mask, row-coefficient) terms."""
    W = jnp.zeros(rules[0][0].shape, jnp.float32)
    for mask, r in rules:
        W = W + jnp.where(mask, r[:, None], 0.0)
    return W


def _topk_weight_rows(D_masked, k, n_pad):
    """One-hot weight rows for the k smallest entries of each masked row.

    Measured dead end (do not "fix" again): replacing the row scatter
    with k broadcast compares against the top-k index columns DOUBLES
    the large-n ReliefF fit on v5e (30000x100: 2.2 s scatter vs 4.6 s
    compares, fresh-process best-of-3) — the k full passes over
    (T, n_pad) cost more than the scatter's serialised updates, which
    touch only k entries per row.
    """
    vals, idx = jax.lax.top_k(-D_masked, k)          # (T, k)
    sel = (vals > -_INF / 2).astype(jnp.float32)     # finite -> selected
    rows = jnp.arange(D_masked.shape[0])[:, None]
    W = jnp.zeros((D_masked.shape[0], n_pad), jnp.float32)
    W = W.at[rows, idx].add(sel)
    return W, sel.sum(axis=1)


def _rules_relieff(D, yi, vi, iid, y_flat, valid_flat, k, class_probs):
    """Class-prior-weighted k-NN rule — the reference CPU semantics
    (ReliefF.py:137-220), NOT the simpler GPU variant.

    Structure: C+1 independent ``lax.top_k`` selections (k hits, k
    misses per class) + k-entry row scatters.  TWO alternatives are
    measured dead ends on v5e (do not "fix" again; fresh-process
    best-of-3 at 30000x100 each time):

    * broadcast compares instead of the scatter: 4.6 s vs 2.2 s
      (round 4) — k full passes over (T, n_pad) cost more than the
      scatter's k touched entries per row.
    * ONE stable argsort per row shared across all rules (rank-within-
      class via one-hot cumsum, masks un-permuted by a second argsort
      + gather; kept as :func:`_rules_relieff_argsort`,
      ``FS_RELIEFF_ARGSORT=1``): 51.6 s vs 2.0 s (round 5) — a full
      (T, n_pad) sort with index payloads is ~25x the cost of C+1
      partial top_k lowerings; XLA's top_k does NOT lower to a full
      sort on TPU.
    """
    import os
    if os.environ.get("FS_RELIEFF_ARGSORT") == "1":
        return _rules_relieff_argsort(D, yi, vi, iid, y_flat,
                                      valid_flat, k, class_probs)
    n_pad = D.shape[1]
    n_classes = class_probs.shape[0]
    vmask, hit = _pair_masks(D, yi, vi, iid, y_flat, valid_flat)

    # k nearest hits at weight -1/h_found
    Dh = jnp.where(hit & vmask, D, _INF)
    W_hit, h_found = _topk_weight_rows(Dh, k, n_pad)
    hit_norm = jnp.where(h_found > 0, 1.0 / jnp.maximum(h_found, 1.0), 0.0)
    rules = [(W_hit > 0, -hit_norm)]

    # k nearest misses per class at weight P(c) / (1 - P(y_i)) / k
    denom = 1.0 - class_probs[yi]
    denom = jnp.where(denom == 0, 1.0, denom)
    for c in range(n_classes):
        cand = (y_flat[None, :] == c) & vmask & (yi != c)[:, None]
        Dc = jnp.where(cand, D, _INF)
        W_c, _ = _topk_weight_rows(Dc, k, n_pad)
        w_c = (class_probs[c] / denom) / jnp.float32(k)
        rules.append((W_c > 0, jnp.broadcast_to(w_c, hit_norm.shape)))
    return rules


def _rules_relieff_argsort(D, yi, vi, iid, y_flat, valid_flat, k,
                           class_probs):
    """MEASURED DEAD END on TPU (51.6 s vs 2.0 s at 30000x100 — see
    :func:`_rules_relieff`): one stable argsort per focal row shared by
    the hit rule and every class rule, mirroring the reference's single
    ``np.argsort(dists)`` walk (``ReliefF.py:157-174``).  Rank-within-
    class comes from a C-lane one-hot cumsum in sorted order; the
    disjoint selections fold into one label tensor un-permuted by a
    second argsort + gather.  Tie order matches top_k (stable sort =
    lowest-index rule), so scores are bit-identical to the default.
    Kept selectable (``FS_RELIEFF_ARGSORT=1``) as the benchmark record.
    """
    n_classes = class_probs.shape[0]
    vmask, _ = _pair_masks(D, yi, vi, iid, y_flat, valid_flat)

    Dm = jnp.where(vmask, D, _INF)
    sidx = jnp.argsort(Dm, axis=1)                       # stable
    y_s = jnp.take(y_flat, sidx)                         # (T, n)
    v_s = jnp.take_along_axis(vmask, sidx, axis=1)
    oh = jax.nn.one_hot(jnp.where(v_s, y_s, n_classes), n_classes,
                        dtype=jnp.float32)               # (T, n, C)
    ranks = jnp.cumsum(oh, axis=1)                       # (T, n, C)
    rank_own = jnp.take_along_axis(
        ranks, y_s[..., None].astype(jnp.int32), axis=2)[..., 0]
    sel_s = v_s & (rank_own <= k)                        # first k per class
    lab_s = jnp.where(sel_s, y_s + 1, 0).astype(jnp.int32)
    inv = jnp.argsort(sidx, axis=1)                      # inverse perm
    lab = jnp.take_along_axis(lab_s, inv, axis=1)        # original order
    counts = ranks[:, -1, :]                             # (T, C)

    # k nearest hits at weight -1/h_found
    h_found = jnp.minimum(
        jnp.take_along_axis(counts, yi[:, None].astype(jnp.int32),
                            axis=1)[:, 0], jnp.float32(k))
    hit_norm = jnp.where(h_found > 0, 1.0 / jnp.maximum(h_found, 1.0), 0.0)
    # vi guard: padded focal rows have yi == -1, where (lab == yi+1)
    # would match every UNselected position (coeff is 0 there, but the
    # mask must stay clean for rule consumers).
    rules = [((lab == (yi + 1)[:, None]) & (vi[:, None] > 0), -hit_norm)]

    # k nearest misses per class at weight P(c) / (1 - P(y_i)) / k
    denom = 1.0 - class_probs[yi]
    denom = jnp.where(denom == 0, 1.0, denom)
    for c in range(n_classes):
        mask_c = (lab == c + 1) & (yi != c)[:, None]
        w_c = (class_probs[c] / denom) / jnp.float32(k)
        rules.append((mask_c, jnp.broadcast_to(w_c, hit_norm.shape)))
    return rules


def pair_weight_rules(D, yi, vi, iid, y_flat, valid_flat, n_real,
                      class_probs, *, algo, use_star, k):
    """Algorithm dispatch: (mask, row-coeff) decomposition of W for one
    focal tile's distance rows D (T, n)."""
    if algo == "multisurf":
        return _rules_multisurf(D, yi, vi, iid, y_flat, valid_flat,
                                n_real, use_star)
    if algo == "surf":
        return _rules_surf(D, yi, vi, iid, y_flat, valid_flat,
                           n_real, use_star)
    if algo == "relieff":
        return _rules_relieff(D, yi, vi, iid, y_flat, valid_flat,
                              k, class_probs)
    raise ValueError(algo)  # pragma: no cover - guarded by caller


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

def relief_engine_core(Xf_f, yv_f, valid_f, row0,
                       Xf_a, yv_a, valid_a,
                       recipf, discf, n_real, class_probs,
                       *, algo, use_star, k, t, cj):
    """Scores contributed by the focal samples ``Xf_f`` against all samples
    ``Xf_a``.  ``row0`` is the global row id of Xf_f's first sample — the
    sharded layer passes each device's focal shard with the matching
    offset; single-chip callers pass the same arrays twice with 0.

    Xf_*: (NFC, n, FC) feature-chunked layout; yv/valid: (n,).
    Returns (NFC * FC,) unnormalised score partials.
    """
    nfc, nf, fc = Xf_f.shape

    def per_focal_tile(bi):
        i0 = bi * t
        xi = jax.lax.dynamic_slice(Xf_f, (0, i0, 0), (nfc, t, fc))
        yi = jax.lax.dynamic_slice(yv_f, (i0,), (t,))
        vi = jax.lax.dynamic_slice(valid_f, (i0,), (t,))
        iid = row0 + i0 + jnp.arange(t, dtype=jnp.int32)

        D = _dist_rows(xi, Xf_a, recipf, discf, cj)
        W = _sum_rules(pair_weight_rules(
            D, yi, vi, iid, yv_a, valid_a, n_real, class_probs,
            algo=algo, use_star=use_star, k=k))
        return _accumulate_scores(xi, Xf_a, recipf, discf, W, cj)

    partials = jax.lax.map(per_focal_tile, jnp.arange(nf // t))
    return partials.sum(axis=0).reshape(nfc * fc)


@partial(jax.jit, static_argnames=("algo", "use_star", "k", "t", "cj"))
def _relief_engine(Xf, yv, valid, recipf, discf, n_real, class_probs,
                   *, algo, use_star, k, t, cj):
    """Single-device engine: every sample is focal."""
    return relief_engine_core(
        Xf, yv, valid, jnp.int32(0), Xf, yv, valid,
        recipf, discf, n_real, class_probs,
        algo=algo, use_star=use_star, k=k, t=t, cj=cj)


def _tile_sizes(n: int, p: int) -> tuple[int, int, int]:
    """(T focal tile, CJ j-chunk, FC feature chunk).

    Sized so the (T, CJ, FC) broadcast temporary is ~64-128 MB: big enough
    to amortise dispatch, small enough not to blow HBM.
    """
    fc = 512 if p >= 512 else _round_up(p, 128)
    t = 128 if n >= 128 else _round_up(max(n, 1), 8)
    budget = 96 * 1024 * 1024 // 4  # fp32 elements
    cj = max(t, min(4096, budget // (t * fc)))
    # Never let the j-chunk exceed the (tile-rounded) sample count: cj
    # feeds the lcm-based pad in pack_chunks, and an oversized cj would
    # zero-pad a 30-sample fit out to 4096 rows (a ~16000x slowdown that
    # made every tiny sklearn-check fit take seconds).
    cj = min(cj, _round_up(max(n, 1), t))
    cj = _round_up(cj, t)
    return t, cj, fc


def pack_chunks(x: np.ndarray, y: np.ndarray, recip: np.ndarray,
                is_discrete: np.ndarray, t: int | None = None,
                cj: int | None = None, fc: int | None = None):
    """Zero-pad and reshape host arrays into the engine layout.

    Returns (Xf (NFC, n_pad, FC), yv (n_pad,), valid (n_pad,),
    recipf (NFC, FC), discf (NFC, FC), (t, cj)).
    """
    n, p = x.shape
    t0, cj0, fc0 = _tile_sizes(n, p)
    t = t or t0
    fc = fc or fc0
    cj = cj or cj0
    n_pad = _round_up(n, int(np.lcm(t, cj)))
    cj = min(cj, n_pad)
    p_pad = _round_up(p, fc)
    nfc = p_pad // fc

    x_pad = np.zeros((n_pad, p_pad), dtype=np.float32)
    x_pad[:n, :p] = x
    xf = np.ascontiguousarray(
        x_pad.reshape(n_pad, nfc, fc).transpose(1, 0, 2))
    yv = np.full((n_pad,), -1, dtype=np.int32)
    yv[:n] = y
    valid = np.zeros((n_pad,), dtype=np.float32)
    valid[:n] = 1.0
    recipf = np.zeros((p_pad,), dtype=np.float32)
    recipf[:p] = recip
    discf = np.zeros((p_pad,), dtype=bool)
    discf[:p] = is_discrete
    return (xf, yv, valid, recipf.reshape(nfc, fc), discf.reshape(nfc, fc),
            (t, cj))


# Auto multi-chip routing: below this element count a fit stays
# single-device (collective + per-shape compile overhead dominates).
_AUTO_SHARD_MIN_ELEMS = 1 << 21
# Replicating the code matrix beyond this many bytes per chip switches
# to the ring layout (X sharded, sample blocks rotate over ICI).
_RING_BYTES = 4 << 30


def _mesh_devices(device):
    """All visible devices on `device`'s platform — the mesh candidates
    for automatic multi-chip dispatch."""
    if device is None:
        return []
    import os
    if os.environ.get("FS_NO_AUTO_SHARD") == "1":
        return []
    return [d for d in jax.devices() if d.platform == device.platform]


def _sharded_dispatch(x, y, recip, is_discrete, devs, *, algo, use_star,
                      n_neighbors, class_probs, codes, n_states):
    """Pick a sharded layout by (n, p, memory) — SURVEY §2.3 row 1:
    the reference's prange-over-focal-samples is automatic; so is this.

    All-discrete: sample-shard (replicated codes) by default,
    feature-shard when p >> n (GWAS layout), ring when the code matrix
    is too big to replicate.  Mixed/continuous: sample-shard through the
    generic engine.
    """
    n, p = x.shape if x is not None else codes.shape
    if bool(np.all(is_discrete)):
        from .relief_discrete import encode_discrete
        if codes is None:
            codes, n_states = encode_discrete(np.asarray(x))
        elif not n_states:
            n_states = int(np.max(codes)) + 1
        kw = dict(algo=algo, use_star=use_star, n_neighbors=n_neighbors,
                  n_states=int(n_states), class_probs=class_probs,
                  devices=devs)
        if n * p > _RING_BYTES:
            from ..parallel.ring import ring_relief_discrete_scores
            return ring_relief_discrete_scores(codes, y, **kw)
        if p >= 4 * n and p >= 4096:
            from ..parallel.feature_shard import (
                feature_sharded_relief_discrete_scores)
            return feature_sharded_relief_discrete_scores(codes, y, **kw)
        from ..parallel.sharded import sharded_relief_discrete_scores
        return sharded_relief_discrete_scores(codes, y, **kw)
    from ..parallel.sharded import sharded_relief_scores
    return sharded_relief_scores(
        x, y, recip, is_discrete, algo=algo, use_star=use_star,
        n_neighbors=n_neighbors, class_probs=class_probs, devices=devs)


def relief_scores(
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
    n_states: int = 0,
) -> np.ndarray:
    """Relief-family importance scores (already divided by n_samples)."""
    n, p = x.shape
    if (n * p >= _AUTO_SHARD_MIN_ELEMS
            and not isinstance(codes, jax.Array)
            and not isinstance(x, jax.Array)):
        devs = _mesh_devices(device)
        if len(devs) > 1 and n >= 16 * len(devs):
            # >1 accelerator visible: route through the sharded layer so
            # MultiSURF().fit(X, y) uses every chip automatically.
            return _sharded_dispatch(
                x, y, recip, is_discrete, devs, algo=algo,
                use_star=use_star, n_neighbors=n_neighbors,
                class_probs=class_probs, codes=codes, n_states=n_states)
    if bool(np.all(is_discrete)):
        # All-discrete data: every diff is a Hamming mismatch, which
        # reformulates both O(n^2 p) passes as exact one-hot matmuls on
        # the MXU (relief_discrete.py) — the fast path for the
        # reference's flagship SNP benchmark shape (paper.md:44).
        from .relief_discrete import relief_discrete_scores
        return relief_discrete_scores(
            x, y, algo=algo, use_star=use_star, n_neighbors=n_neighbors,
            class_probs=class_probs, device=device,
            codes=codes, n_states=n_states or None)
    if device is not None and device.platform == "tpu":
        from .relief_hybrid import relief_hybrid_scores, HYBRID_MAX_N
        if bool(np.any(is_discrete)) and n <= HYBRID_MAX_N:
            # Mixed data: discrete columns as MXU one-hot matmuls,
            # continuous columns through the Pallas kernels, weights
            # computed once from the combined distances.  Above ~24k
            # samples focal super-blocks stream (relief_hybrid.py) so
            # HBM stays bounded up to the same 131072-row cap as the
            # continuous path.
            return relief_hybrid_scores(
                x, y, recip, is_discrete, algo=algo, use_star=use_star,
                n_neighbors=n_neighbors, class_probs=class_probs,
                device=device, codes=codes, n_states=n_states or None)
        from .relief_pallas import PALLAS_MAX_N
        if n <= PALLAS_MAX_N:
            # Pure-continuous on a real chip: fused Pallas kernels
            # (VMEM-resident diff tiles, VPU-bound); above ~16k samples
            # focal super-blocks stream so only (nb, n) distance/weight
            # blocks materialise.  Beyond the cap the generic engine
            # below streams with smaller footprint.
            from .relief_pallas import relief_pallas_scores
            return relief_pallas_scores(
                x, y, recip, is_discrete, algo=algo, use_star=use_star,
                n_neighbors=n_neighbors, class_probs=class_probs,
                device=device)
    xf, yv, valid, recipf, discf, (t, cj) = pack_chunks(
        np.asarray(x, np.float32), np.asarray(y, np.int32),
        recip, is_discrete)
    if class_probs is None:
        class_probs = np.zeros((1,), np.float32)
    from ..utils.backend import execution_context
    with execution_context(device):
        if device is not None and device.platform != "cpu":
            xf = jax.device_put(xf)  # uncommitted H2D, the one fast path
        scores = _relief_engine(
            xf, yv, valid, recipf, discf,
            np.float32(n), np.asarray(class_probs, np.float32),
            algo=algo, use_star=use_star, k=int(n_neighbors), t=t, cj=cj)
        scores = np.asarray(scores, dtype=np.float32)
    return scores[:p] / np.float32(n)
