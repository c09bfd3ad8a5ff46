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

Everything is blocked into (T x T x FC) tiles scanned with lax control flow:
static shapes, no data-dependent Python branching, fp32 accumulation.  Inputs
are zero-padded to tile multiples; padded rows/features are masked via a
validity vector (padded features produce exactly 0 diff: recip = 0 and
discrete flag False).

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
    """diff tensor for one (i-tile, j-tile, f-chunk): (T, TJ, FC)."""
    a = xi_c[:, None, :]
    b = xj_c[None, :, :]
    cont = jnp.abs(a - b) * recip_c[None, None, :]
    disc = (a != b).astype(jnp.float32)
    return jnp.where(disc_c[None, None, :], disc, cont)


def _dist_rows(xi, Xt, recipf, discf):
    """Pass 1 for one focal tile: full distance rows (T, n_pad).

    xi: (NFC, T, FC) focal tile; Xt: (NB, NFC, T, FC) all samples.
    """
    nb = Xt.shape[0]

    def over_j(bj):
        xj = Xt[bj]  # (NFC, T, FC)

        def over_f(acc, c):
            xi_c, xj_c, r_c, d_c = c
            acc = acc + _diff_block(xi_c, xj_c, r_c, d_c).sum(axis=-1)
            return acc, None

        blk, _ = jax.lax.scan(
            over_f,
            jnp.zeros((xi.shape[1], xj.shape[1]), jnp.float32),
            (xi, xj, recipf, discf),
        )
        return blk  # (T, T)

    d_blocks = jax.lax.map(over_j, jnp.arange(nb))  # (NB, T, T)
    t = xi.shape[1]
    return d_blocks.transpose(1, 0, 2).reshape(t, nb * t)


def _accumulate_scores(xi, Xt, recipf, discf, W):
    """Pass 2 for one focal tile: partial scores (NFC, FC).

    W: (T, n_pad) pairwise weights for this focal tile.
    """
    nb, nfc, t, fc = Xt.shape
    Wb = W.reshape(t, nb, t).transpose(1, 0, 2)  # (NB, T, T)

    def over_f(fi):
        xi_c = xi[fi]        # (T, FC)
        r_c = recipf[fi]
        d_c = discf[fi]

        def over_j(acc, bj):
            xj_c = Xt[bj, fi]  # (T, FC)
            diff = _diff_block(xi_c, xj_c, r_c, d_c)  # (T, T, FC)
            acc = acc + jnp.einsum(
                "ij,ijf->f", Wb[bj], diff,
                preferred_element_type=jnp.float32,
            )
            return acc, None

        part, _ = jax.lax.scan(over_j, jnp.zeros((fc,), jnp.float32),
                               jnp.arange(nb))
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


def _weights_multisurf(D, yi, vi, iid, y_flat, valid_flat, n_real, use_star):
    """mu - sigma/2 adaptive threshold (reference MultiSURF.py:193-251)."""
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

    W = (jnp.where(near_hit, w_hit[:, None], 0.0)
         + jnp.where(near_miss, w_miss[:, None], 0.0))
    if use_star:
        far_miss = vmask & ~near & ~hit
        W = W + jnp.where(far_miss, -w_miss[:, None], 0.0)
    return W


def _weights_surf(D, yi, vi, iid, y_flat, valid_flat, n_real, use_star):
    """Mean-distance threshold, unit weights (reference SURF.py:131-195)."""
    vmask, hit = _pair_masks(D, yi, vi, iid, y_flat, valid_flat)
    _, mu, _ = _row_mean_stats(D, vmask, n_real)
    near = (D < mu[:, None]) & vmask
    W = jnp.where(near & ~hit, 1.0, 0.0) - jnp.where(near & hit, 1.0, 0.0)
    if use_star:
        far = vmask & ~near
        W = W + jnp.where(far & hit, 1.0, 0.0) - jnp.where(far & ~hit, 1.0, 0.0)
    return W


def _topk_weight_rows(D_masked, k, n_pad):
    """One-hot weight rows for the k smallest entries of each masked row."""
    vals, idx = jax.lax.top_k(-D_masked, k)          # (T, k)
    sel = (vals > -_INF / 2).astype(jnp.float32)     # finite -> selected
    rows = jnp.arange(D_masked.shape[0])[:, None]
    W = jnp.zeros((D_masked.shape[0], n_pad), jnp.float32)
    W = W.at[rows, idx].add(sel)
    return W, sel.sum(axis=1)


def _weights_relieff(D, yi, vi, iid, y_flat, valid_flat, k, class_probs):
    """Class-prior-weighted k-NN rule — the reference CPU semantics
    (ReliefF.py:137-220), NOT the simpler GPU variant."""
    n_pad = D.shape[1]
    n_classes = class_probs.shape[0]
    vmask, hit = _pair_masks(D, yi, vi, iid, y_flat, valid_flat)

    # k nearest hits at weight -1/h_found
    Dh = jnp.where(hit & vmask, D, _INF)
    W_hit, h_found = _topk_weight_rows(Dh, k, n_pad)
    hit_norm = jnp.where(h_found > 0, 1.0 / jnp.maximum(h_found, 1.0), 0.0)
    W = -W_hit * hit_norm[:, None]

    # k nearest misses per class at weight P(c) / (1 - P(y_i)) / k
    denom = 1.0 - class_probs[yi]
    denom = jnp.where(denom == 0, 1.0, denom)
    for c in range(n_classes):
        cand = (y_flat[None, :] == c) & vmask & (yi != c)[:, None]
        Dc = jnp.where(cand, D, _INF)
        W_c, _ = _topk_weight_rows(Dc, k, n_pad)
        w_c = (class_probs[c] / denom) / jnp.float32(k)
        W = W + W_c * w_c[:, None]
    return W


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

def relief_engine_core(Xt_f, yv_f, valid_f, row0,
                       Xt_a, yv_a, valid_a,
                       recipf, discf, n_real, class_probs,
                       *, algo, use_star, k):
    """Scores contributed by the focal tiles ``Xt_f`` against all samples
    ``Xt_a``.  ``row0`` is the global row id of Xt_f's first sample — the
    sharded layer passes each device's focal shard here with the matching
    offset, while single-chip callers pass the same arrays twice with 0.

    Xt_*: (NB, NFC, T, FC) tiled features; yv/valid: (NB, T).
    Returns (NFC * FC,) unnormalised score partials.
    """
    nbf = Xt_f.shape[0]
    _, nfc, t, fc = Xt_a.shape
    y_flat = yv_a.reshape(-1)
    valid_flat = valid_a.reshape(-1)

    def per_focal_tile(bi):
        xi = Xt_f[bi]
        yi = yv_f[bi]
        vi = valid_f[bi]
        iid = row0 + bi * t + jnp.arange(t, dtype=jnp.int32)

        D = _dist_rows(xi, Xt_a, recipf, discf)
        if algo == "multisurf":
            W = _weights_multisurf(D, yi, vi, iid, y_flat, valid_flat,
                                   n_real, use_star)
        elif algo == "surf":
            W = _weights_surf(D, yi, vi, iid, y_flat, valid_flat,
                              n_real, use_star)
        elif algo == "relieff":
            W = _weights_relieff(D, yi, vi, iid, y_flat, valid_flat,
                                 k, class_probs)
        else:  # pragma: no cover - guarded by caller
            raise ValueError(algo)
        return _accumulate_scores(xi, Xt_a, recipf, discf, W)

    partials = jax.lax.map(per_focal_tile, jnp.arange(nbf))  # (NBf, NFC, FC)
    return partials.sum(axis=0).reshape(nfc * fc)


@partial(jax.jit, static_argnames=("algo", "use_star", "k"))
def _relief_engine(Xt, yv, valid, recipf, discf, n_real, class_probs,
                   *, algo, use_star, k):
    """Single-device engine: every tile is focal."""
    return relief_engine_core(
        Xt, yv, valid, jnp.int32(0), Xt, yv, valid,
        recipf, discf, n_real, class_probs,
        algo=algo, use_star=use_star, k=k)


def _tile_sizes(n: int, p: int) -> tuple[int, int]:
    t = 64 if n >= 64 else _round_up(max(n, 1), 8)
    fc = 512 if p >= 2048 else 128
    return t, fc


def pack_tiles(x: np.ndarray, y: np.ndarray, recip: np.ndarray,
               is_discrete: np.ndarray, t: int | None = None,
               fc: int | None = None):
    """Zero-pad and tile host arrays into the engine layout."""
    n, p = x.shape
    t0, fc0 = _tile_sizes(n, p)
    t = t or t0
    fc = fc or fc0
    n_pad = _round_up(n, t)
    p_pad = _round_up(p, fc)
    nb, nfc = n_pad // t, p_pad // fc

    x_pad = np.zeros((n_pad, p_pad), dtype=np.float32)
    x_pad[:n, :p] = x
    xt = np.ascontiguousarray(
        x_pad.reshape(nb, t, nfc, fc).transpose(0, 2, 1, 3)
    )
    yv = np.full((n_pad,), -1, dtype=np.int32)
    yv[:n] = y
    valid = np.zeros((n_pad,), dtype=np.float32)
    valid[:n] = 1.0
    recipf = np.zeros((p_pad,), dtype=np.float32)
    recipf[:p] = recip
    discf = np.zeros((p_pad,), dtype=bool)
    discf[:p] = is_discrete
    return (xt, yv.reshape(nb, t), valid.reshape(nb, t),
            recipf.reshape(nfc, fc), discf.reshape(nfc, fc))


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
) -> np.ndarray:
    """Relief-family importance scores (already divided by n_samples)."""
    n, p = x.shape
    xt, yv, valid, recipf, discf = pack_tiles(
        np.asarray(x, np.float32), np.asarray(y, np.int32),
        recip, is_discrete)
    if class_probs is None:
        class_probs = np.zeros((1,), np.float32)
    from ..utils.backend import execution_context
    with execution_context(device):
        scores = _relief_engine(
            xt, yv, valid, recipf, discf,
            np.float32(n), np.asarray(class_probs, np.float32),
            algo=algo, use_star=use_star, k=int(n_neighbors))
        scores = np.asarray(scores, dtype=np.float32)
    return scores[:p] / np.float32(n)
