#!/usr/bin/env python
"""Log-scale runtime plots from the grid CSVs (mirrors the reference's
``benchmarking/plots.py`` seaborn scripts, with matplotlib only)."""

from __future__ import annotations

import argparse
import csv
from collections import defaultdict


def main(csv_path, out_prefix):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = list(csv.DictReader(open(csv_path)))
    scenarios = sorted({r["scenario"] for r in rows})
    for sc in scenarios:
        sub = [r for r in rows if r["scenario"] == sc]
        xkey = ("n_features" if sc.startswith("p_") or sc == "large_p"
                else "n_samples")
        series = defaultdict(list)
        for r in sub:
            series[r["estimator"]].append(
                (int(r[xkey]), float(r["seconds"])))
        fig, ax = plt.subplots(figsize=(7, 4.5))
        for name, pts in sorted(series.items()):
            pts.sort()
            ax.plot([x for x, _ in pts], [s for _, s in pts],
                    marker="o", label=name)
        ax.set_yscale("log")
        ax.set_xlabel(xkey)
        ax.set_ylabel("fit runtime (s)")
        ax.set_title(f"{sc} — fastselect-tpu")
        ax.legend(fontsize=8)
        ax.grid(True, which="both", alpha=0.3)
        path = f"{out_prefix}_{sc}_runtime.png"
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        print("wrote", path)
        plt.close(fig)

        # peak-memory twin (reference: benchmark_plots/*_memory.png)
        if not any("peak_rss_mb" in r and r["peak_rss_mb"] for r in sub):
            continue
        fig, ax = plt.subplots(figsize=(7, 4.5))
        for name, _ in sorted(series.items()):
            pts = sorted((int(r[xkey]), float(r["peak_rss_mb"]))
                         for r in sub if r["estimator"] == name)
            ax.plot([x for x, _ in pts], [m for _, m in pts],
                    marker="o", label=name)
        dev = sorted((int(r[xkey]), float(r.get("peak_device_mb", 0)))
                     for r in sub)
        if any(m for _, m in dev):
            by_x = defaultdict(float)
            for x, m in dev:
                by_x[x] = max(by_x[x], m)
            ax.plot(*zip(*sorted(by_x.items())), marker="s", ls="--",
                    color="k", label="device peak (HBM)")
        ax.set_xlabel(xkey)
        ax.set_ylabel("peak memory (MB)")
        ax.set_title(f"{sc} — peak host RSS / device memory")
        ax.legend(fontsize=8)
        ax.grid(True, which="both", alpha=0.3)
        path = f"{out_prefix}_{sc}_memory.png"
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        print("wrote", path)
        plt.close(fig)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default="benchmarks/results.csv")
    ap.add_argument("--out-prefix", default="benchmarks/benchmark")
    a = ap.parse_args()
    main(a.csv, a.out_prefix)
