#!/usr/bin/env python
"""End-to-end GWAS-style feature-selection workflow.

Mirrors the reference's flagship use case (paper.md:44 — MultiSURF over
a large synthetic SNP matrix) and shows the idioms that keep the TPU
fed:

* pass genotypes as small non-negative integers (``int8`` 0/1/2): the
  estimator skips the float cast and the encode sweep entirely and
  uploads 4x fewer bytes;
* chain TuRF on top for iterative elimination with per-iteration
  checkpointing — a killed run resumes where it stopped;
* finish with mRMR on the surviving features (streaming greedy: no
  (p, p) matrix even at GWAS widths).

Run: ``python examples/gwas_workflow.py [--n 20000] [--p 50000]``
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")  # run from a checkout without installing

import argparse
import time

import numpy as np


def main(n: int, p: int, seed: int = 0) -> None:
    from fastselect_tpu import MultiSURF, TuRF, mRMR

    rs = np.random.RandomState(seed)
    # synthetic genotypes with a planted additive pair
    X = rs.randint(0, 3, (n, p)).astype(np.int8)
    y = ((X[:, 7].astype(int) + X[:, 42].astype(int)
          + rs.randint(0, 2, n)) > 2).astype(np.int8)

    # checkpoint in a user-owned directory (a world-writable fixed path
    # like /tmp/... would let another local user pre-place a pickle
    # that resume would unpickle)
    import tempfile
    ckpt_dir = tempfile.mkdtemp(prefix="fastselect_turf_")
    ckpt = f"{ckpt_dir}/gwas_turf.ckpt"

    t0 = time.perf_counter()
    scorer = MultiSURF(n_features_to_select=100)
    turf = TuRF(scorer, n_features_to_select=256, pct_remove=0.4,
                checkpoint_path=ckpt, verbose=True)
    turf.fit(X, y)
    print(f"TuRF elimination: {time.perf_counter() - t0:.1f}s, "
          f"kept {len(turf.top_features_)} features")

    X_small = X[:, turf.top_features_]
    t0 = time.perf_counter()
    sel = mRMR(n_features_to_select=16).fit(X_small.astype(np.int32), y)
    picked = turf.top_features_[sel.top_features_]
    print(f"mRMR refinement: {time.perf_counter() - t0:.1f}s")
    print("selected columns:", np.sort(picked)[:16])
    print("planted signals recovered:",
          {7, 42} <= set(picked.tolist()))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--p", type=int, default=8192)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    main(a.n, a.p, a.seed)
