#!/usr/bin/env python
"""Benchmark entry point (driver contract): prints ONE JSON line.

Metric: MultiSURF scoring throughput in samples^2 * features / second on
one chip, on a workload shaped like the reference's published benchmarks
(BASELINE.md).  ``vs_baseline`` compares end-to-end fit wall-clock against
the reference's CUDA backend on its n >> p plot point (n=2500, p=100,
~0.13 s, ``benchmark_n_dominant_runtime.png``) scaled to this run's
workload by the O(n^2 p) cost model.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    from fastselect_tpu import MultiSURF

    # Workload: n >> p layout, big enough to saturate the chip.
    n, p = 4096, 512
    rs = np.random.RandomState(0)
    X = rs.rand(n, p).astype(np.float32)
    y = rs.randint(0, 2, n)

    model = MultiSURF(n_features_to_select=10)
    model.fit(X, y)  # warm-up/compile at the benchmark shape

    model = MultiSURF(n_features_to_select=10)
    t0 = time.perf_counter()
    model.fit(X, y)
    elapsed = time.perf_counter() - t0

    work = float(n) * n * p
    throughput = work / elapsed

    # Reference CUDA MultiSURF at 2500x100 ~ 0.13 s  =>  derived baseline
    # throughput on its own plot point (samples^2*features/s).
    ref_throughput = (2500.0 * 2500 * 100) / 0.13
    print(json.dumps({
        "metric": "multisurf_samples2_features_per_s",
        "value": round(throughput, 1),
        "unit": "samples^2*features/s",
        "vs_baseline": round(throughput / ref_throughput, 3),
        "detail": {
            "n_samples": n,
            "n_features": p,
            "fit_seconds": round(elapsed, 4),
            "backend": model.effective_backend_,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
