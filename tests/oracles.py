"""Independent NumPy oracles implementing the reference CPU-backend
semantics (the BASELINE parity target) in straightforward, unoptimised
form.  Written from the algorithm definitions in SURVEY.md §2/§3 — these
are the ground truth the TPU engine must match."""

from __future__ import annotations

import math

import numpy as np


def _diffs(x, i, is_disc, recip):
    """Per-feature diffs of sample i against every sample: Hamming for
    discrete features, range-scaled L1 for continuous."""
    return np.where(is_disc, (x[i] != x) * 1.0,
                    np.abs(x[i] - x) * recip).astype(np.float32)


def _prep(x, discrete_limit, unit_range_for_discrete):
    x = x.astype(np.float32)
    p = x.shape[1]
    is_disc = np.array([np.unique(x[:, f]).size <= discrete_limit
                        for f in range(p)])
    rng = (x.max(0) - x.min(0)).astype(np.float32)
    if unit_range_for_discrete:
        rng[is_disc] = 1.0
    rng[rng == 0] = 1
    return x, is_disc, (1.0 / rng).astype(np.float32)


def multisurf_scores(x, y, discrete_limit=10, use_star=False):
    x, is_disc, recip = _prep(x, discrete_limit, False)
    n, p = x.shape
    scores = np.zeros(p, np.float32)
    for i in range(n):
        diffs = _diffs(x, i, is_disc, recip)
        d = diffs.sum(1)
        d[i] = 0
        mu = d.sum() / (n - 1)
        var = max(0.0, float((d ** 2).sum()) / (n - 1) - mu * mu)
        th = mu - 0.5 * math.sqrt(var)
        hit = y == y[i]
        near = d < th
        near[i] = False
        nh = (near & hit).sum()
        nm = (near & ~hit).sum()
        hd = diffs[near & hit].sum(0)
        md = diffs[near & ~hit].sum(0)
        if use_star:
            far = ~near
            far[i] = False
            md = md - diffs[far & ~hit].sum(0)
        if nh > 0:
            hd = hd / nh
        if nm > 0:
            md = md / nm
        scores += md - hd
    return scores / n


def surf_scores(x, y, discrete_limit=10, use_star=False):
    x, is_disc, recip = _prep(x, discrete_limit, True)
    n, p = x.shape
    scores = np.zeros(p, np.float32)
    for i in range(n):
        diffs = _diffs(x, i, is_disc, recip)
        d = diffs.sum(1)
        d[i] = 0
        avg = d.sum() / (n - 1)
        hit = y == y[i]
        near = d < avg
        near[i] = False
        upd = diffs[near & ~hit].sum(0) - diffs[near & hit].sum(0)
        if use_star:
            far = ~near
            far[i] = False
            upd += diffs[far & hit].sum(0) - diffs[far & ~hit].sum(0)
        scores += upd
    return scores / n


def relieff_scores(x, y, k=3, discrete_limit=10):
    x, is_disc, recip = _prep(x, discrete_limit, True)
    n, p = x.shape
    labels, y_enc = np.unique(y, return_inverse=True)
    nc = len(labels)
    probs = np.bincount(y_enc) / n
    scores = np.zeros(p, np.float32)
    for i in range(n):
        diffs = _diffs(x, i, is_disc, recip)
        d = diffs.sum(1).astype(np.float32)
        d[i] = np.inf
        order = np.argsort(d, kind="stable")
        li = y_enc[i]
        hits = [j for j in order if y_enc[j] == li][:k]
        denom = 1.0 - probs[li]
        if denom == 0:
            denom = 1.0
        upd = np.zeros(p, np.float32)
        if hits:
            upd -= diffs[hits].sum(0) / len(hits)
        for c in range(nc):
            if c == li:
                continue
            misses = [j for j in order if y_enc[j] == c][:k]
            upd += (probs[c] / denom) * diffs[misses].sum(0) / k
        scores += upd
    return scores / n


def mi_pair_bits(x1, x2):
    """Reference-semantics MI in bits (mutual_information.py:25-46)."""
    n = len(x1)
    t = np.zeros((int(x1.max()) + 1, int(x2.max()) + 1))
    for a, b in zip(x1, x2):
        t[a, b] += 1
    t /= n
    p1, p2 = t.sum(1), t.sum(0)
    mi = 0.0
    for i in range(t.shape[0]):
        for j in range(t.shape[1]):
            if t[i, j] > 1e-12:
                mi += t[i, j] * math.log(t[i, j] / (p1[i] * p2[j] + 1e-12))
    return mi / math.log(2.0)


def su_pair(x1, x2):
    """Symmetrical uncertainty, CFS variant (CFS.py:44-77)."""
    n = len(x1)
    t = np.zeros((int(x1.max()) + 1, int(x2.max()) + 1))
    for a, b in zip(x1, x2):
        t[a, b] += 1
    p_xy = t / n
    p_x, p_y = p_xy.sum(1), p_xy.sum(0)

    def ent(pv):
        return -sum(q * math.log2(q) for q in pv if q > 1e-12)

    h_x, h_y = ent(p_x), ent(p_y)
    if h_x + h_y < 1e-12:
        return 0.0
    mi = 0.0
    for i in range(t.shape[0]):
        for j in range(t.shape[1]):
            if p_xy[i, j] > 1e-12 and p_x[i] > 1e-12 and p_y[j] > 1e-12:
                mi += p_xy[i, j] * math.log2(
                    p_xy[i, j] / (p_x[i] * p_y[j]))
    return 2.0 * mi / (h_x + h_y)


def mdr_balanced_accuracy(X, y, combo):
    """Single-combo balanced accuracy (MDR.py:82-129)."""
    k = len(combo)
    cells = np.zeros(X.shape[0], dtype=int)
    for j in range(k):
        cells = cells * 3 + X[:, combo[j]]
    n_cells = 3 ** k
    case = np.bincount(cells[y == 1], minlength=n_cells)
    ctrl = np.bincount(cells[y != 1], minlength=n_cells)
    tc, tn_ = case.sum(), ctrl.sum()
    if tc == 0 or tn_ == 0:
        return 0.0
    thr = tc / tn_
    tp = sum(case[i] for i in range(n_cells)
             if ctrl[i] == 0 or case[i] / ctrl[i] > thr)
    tn = sum(ctrl[i] for i in range(n_cells)
             if not (ctrl[i] == 0 or case[i] / ctrl[i] > thr))
    return (tp / tc + tn / tn_) / 2.0
