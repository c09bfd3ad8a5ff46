#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE.md: "scaling efficiency at
1 chip / 1 host / N>=2 hosts").

Times the SAME all-discrete Relief workload two ways and reports
per-device throughput and parallel efficiency:

  * ``mono``     — the monolithic single-device engine
                   (``ops.relief_discrete.relief_discrete_scores``).
  * ``sharded``  — the mesh layout (``parallel.sharded``), over every
                   visible device (a 1-device mesh is valid: it measures
                   the sharded code path's overhead/benefit vs mono —
                   on the v5e rig the sharded block-dealt structure is
                   FASTER than mono at 30000x65536).

Efficiency = (sharded throughput / n_devices) / mono throughput, where
throughput = n_samples^2 * n_features / seconds.  A pod owner extends
the table by running this script on a larger mesh; rows append to the
CSV with the device kind and mesh size recorded.

Run each layout in a FRESH process (``--layout mono`` then
``--layout sharded --append``): the tunnel client leaks host RSS per
transfer and in-process A/B is invalid (CLAUDE.md benchmark
discipline).  ``--virtual`` runs on an 8-device virtual CPU mesh —
correctness / overhead-shape only, never a performance claim (rows are
labelled ``virtual-cpu``).
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def snp_data(n, p, seed=0):
    rs = np.random.RandomState(seed)
    X = np.empty((n, p), np.int8)
    step = max(1, (1 << 28) // max(p, 1))
    for r0 in range(0, n, step):
        r1 = min(n, r0 + step)
        X[r0:r1] = rs.randint(0, 3, (r1 - r0, p), dtype=np.int8)
    return X, rs.randint(0, 2, n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30_000)
    ap.add_argument("--p", type=int, default=65_536)
    ap.add_argument("--layout", choices=["mono", "sharded"],
                    required=True)
    ap.add_argument("--algo", default="multisurf")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--virtual", action="store_true",
                    help="8-device virtual CPU mesh (correctness / "
                    "overhead shape only; defaults to a small shape)")
    ap.add_argument("--out", default="benchmarks/results_scaling.csv")
    ap.add_argument("--append", action="store_true")
    a = ap.parse_args()

    if a.virtual:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
        if a.n == 30_000 and a.p == 65_536:  # virtual default shape
            a.n, a.p = 2_048, 4_096
    import jax

    from fastselect_tpu.ops.relief_discrete import relief_discrete_scores
    from fastselect_tpu.parallel.sharded import (
        sharded_relief_discrete_scores)

    devs = jax.devices()
    kind = devs[0].device_kind if not a.virtual else "virtual-cpu"
    X, y = snp_data(a.n, a.p)

    def run_once():
        if a.layout == "mono":
            return relief_discrete_scores(
                None, y, algo=a.algo, device=devs[0], codes=X,
                n_states=3)
        return sharded_relief_discrete_scores(
            X, y, algo=a.algo, n_states=3, devices=devs)

    best = float("inf")
    for _ in range(max(1, a.repeats)):
        t0 = time.perf_counter()
        run_once()
        best = min(best, time.perf_counter() - t0)

    thr = a.n * a.n * a.p / best
    ndev = len(devs) if a.layout == "sharded" else 1
    per_dev = thr / ndev

    header = ["layout", "device_kind", "n_devices", "n_samples",
              "n_features", "seconds", "samples2_features_per_s",
              "per_device_throughput", "efficiency_vs_mono"]
    rows = []
    if a.append and os.path.exists(a.out):
        with open(a.out, newline="") as fh:
            rows = [tuple(r) for r in csv.reader(fh)][1:]

    # efficiency vs a matching mono row already in the CSV (same shape
    # and device kind), if present
    eff = ""
    if a.layout == "sharded":
        for r in rows:
            if (r[0] == "mono" and r[1] == kind
                    and int(r[3]) == a.n and int(r[4]) == a.p):
                eff = round(per_dev / float(r[7]), 4)
                break

    rows.append(("mono" if a.layout == "mono" else f"sharded",
                 kind, ndev, a.n, a.p, round(best, 3),
                 round(thr, 1), round(per_dev, 1), eff))
    with open(a.out, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(header)
        w.writerows(rows)
    print(f"{a.layout} {kind} x{ndev} {a.n}x{a.p}: {best:.2f}s "
          f"({thr:.3e} s^2 f/s, {per_dev:.3e}/dev"
          + (f", eff={eff}" if eff != "" else "") + ")")


if __name__ == "__main__":
    main()
