#!/usr/bin/env python
"""Per-algorithm benchmarks mirroring the reference's standalone scripts
(``benchmarking_cfs.py``, ``benchmarking_mdr.py``, ``benchmarking_mrmr.py``,
``testing.py`` = chi2): time each selector over its upstream scenario
grid and append CSV rows."""

from __future__ import annotations

import argparse
import csv
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from fastselect_tpu import CFS, MDR, chi2, mRMR  # noqa: E402


def timeit(fn, warm=True):
    if warm:
        fn()
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main(out):
    rs = np.random.RandomState(42)
    rows = []

    # CFS grid (benchmarking_cfs.py upstream: continuous rand, binary y)
    for n, p in [(200, 500), (500, 1000), (1000, 2000)]:
        X = rs.rand(n, p)
        y = rs.randint(0, 2, n)
        s = timeit(lambda: CFS().fit(X, y))
        rows.append(("cfs", "CFS", n, p, round(s, 4)))
        print(f"CFS {n}x{p}: {s:.3f}s", flush=True)

    # mRMR grid (benchmarking_mrmr.py upstream: randint(0, 5))
    for n, p in [(1000, 1000), (2000, 2000), (2000, 5000)]:
        X = rs.randint(0, 5, (n, p)).astype(np.int32)
        y = rs.randint(0, 2, n)
        s = timeit(lambda: mRMR(n_features_to_select=10).fit(X, y))
        rows.append(("mrmr", "mRMR", n, p, round(s, 4)))
        print(f"mRMR {n}x{p}: {s:.3f}s", flush=True)

    # MDR grid (benchmarking_mdr.py upstream: genotypes, k=2)
    for n, p in [(500, 50), (1000, 100), (2000, 200)]:
        X = rs.randint(0, 3, (n, p)).astype(np.uint8)
        y = rs.randint(0, 2, n)
        s = timeit(lambda: MDR(k=2, cv=5).fit(X, y))
        rows.append(("mdr", "MDR(k=2,cv=5)", n, p, round(s, 4)))
        print(f"MDR {n}x{p}: {s:.3f}s", flush=True)

    # mRMR at GWAS p (streaming greedy, no (p, p) matrix — beyond the
    # reference's reach: its redundancy matrix is CPU-only and O(p^2))
    n, p = 2000, 50_000
    X = rs.randint(0, 5, (n, p)).astype(np.int32)
    y = rs.randint(0, 2, n)
    s = timeit(lambda: mRMR(n_features_to_select=10).fit(X, y))
    rows.append(("mrmr_stream", "mRMR", n, p, round(s, 4)))
    print(f"mRMR(stream) {n}x{p}: {s:.3f}s", flush=True)

    # chi2 micro-benchmark (testing.py upstream: 2000 x 200000, 5 classes)
    X = rs.randint(0, 5, (2000, 200_000)).astype(np.float64)
    y = rs.randint(0, 5, 2000)
    s = timeit(lambda: chi2(X, y))
    rows.append(("chi2", "chi2", 2000, 200_000, round(s, 4)))
    print(f"chi2 2000x200000: {s:.3f}s", flush=True)

    with open(out, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["scenario", "estimator", "n_samples", "n_features",
                    "seconds"])
        w.writerows(rows)
    print(f"wrote {len(rows)} rows -> {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/results_other.csv")
    main(ap.parse_args().out)
