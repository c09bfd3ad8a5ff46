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


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default="benchmarks/results.csv")
    ap.add_argument("--out-prefix", default="benchmarks/benchmark")
    a = ap.parse_args()
    main(a.csv, a.out_prefix)
