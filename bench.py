#!/usr/bin/env python
"""Benchmark entry point (driver contract): prints ONE JSON line.

Headline metric: MultiSURF scoring throughput in samples^2 * features /
second on one chip, on the reference's flagship workload class — an
all-discrete SNP genotype matrix (paper.md:44 benchmarks MultiSURF on a
30,000 x 200,000 synthetic SNP set).  On TPU this runs through the
discrete MXU engine (one-hot matmuls, ``relief_discrete.py``).

``vs_baseline`` compares against the reference CUDA backend's own
throughput derived from its published plot points (BASELINE.md:
n-dominant 2500x100 at ~0.13 s => 4.8e9 s^2*f/s; its large-n sweep
n=50k at ~36 s => 6.9e9 s^2*f/s — we use the faster of the two).

The detail block also reports the continuous-data path (fused Pallas
kernels) on the same-cost workload for the secondary comparison.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync(x):
    return np.asarray(x)


def _frac_peak(n, p, seconds):
    from fastselect_tpu.utils.profiling import continuous_fraction_of_peak
    f = continuous_fraction_of_peak(n, p, seconds)
    return round(f, 4) if f is not None else None


def main():
    import os
    import jax
    try:
        # persistent compile cache: repeated harness runs skip the
        # (minutes-long on tunnelled runtimes) warm-up compiles
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/fastselect_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    from fastselect_tpu.ops.relief_discrete import relief_discrete_scores
    from fastselect_tpu.ops.relief_pallas import relief_pallas_scores
    from fastselect_tpu.utils.backend import resolve_backend, default_device

    backend = resolve_backend("auto")
    device = default_device(backend)
    rs = np.random.RandomState(0)

    # ---- headline: flagship-class SNP workload, discrete MXU engine ----
    # Synthetic genotypes are generated ON DEVICE: production pipelines
    # keep X HBM-resident across fits (TuRF, sweeps), and this harness
    # may run behind a low-bandwidth tunnel where a 1 GB H2D copy would
    # measure the tunnel, not the framework.
    n, p = 16384, 65536
    y = rs.randint(0, 2, n).astype(np.int32)

    import jax.numpy as jnp
    from fastselect_tpu.utils.backend import execution_context

    @jax.jit
    def make_codes(key):
        return jax.random.randint(key, (n, p), 0, 3, dtype=jnp.int8)

    with execution_context(device):
        codes = make_codes(jax.random.PRNGKey(0))
        np.asarray(codes[0, 0])  # materialise before timing

    kw = dict(algo="multisurf", codes=codes, n_states=3, device=device)
    relief_discrete_scores(None, y, **kw)  # compile warm-up
    t0 = time.perf_counter()
    relief_discrete_scores(None, y, **kw)
    disc_s = time.perf_counter() - t0
    disc_thr = float(n) * n * p / disc_s

    # ---- secondary: continuous data, fused Pallas kernels ----
    nc, pc = 4096, 512
    with execution_context(device):
        Xc = jax.jit(
            lambda k: jax.random.uniform(k, (nc, pc), jnp.float32))(
                jax.random.PRNGKey(1))
        recip = np.asarray(jax.jit(
            lambda a: 1.0 / jnp.maximum(a.max(0) - a.min(0), 1e-9))(Xc))
    yc = rs.randint(0, 2, nc).astype(np.int32)
    disc = np.zeros(pc, bool)
    ckw = dict(algo="multisurf", device=device)
    if backend == "tpu":
        cont_fit = lambda: relief_pallas_scores(  # noqa: E731
            Xc, yc, recip, disc, **ckw)
    else:
        from fastselect_tpu.ops.relief import relief_scores
        cont_fit = lambda: relief_scores(  # noqa: E731
            Xc, yc, recip, disc, **ckw)
    cont_fit()
    t0 = time.perf_counter()
    cont_fit()
    cont_s = time.perf_counter() - t0
    cont_thr = float(nc) * nc * pc / cont_s

    # Reference CUDA MultiSURF best published throughput (BASELINE.md).
    ref_thr = max((2500.0 * 2500 * 100) / 0.13,     # n-dominant plot
                  (50_000.0 ** 2 * 100) / 36.0)     # large-n sweep
    print(json.dumps({
        "metric": "multisurf_samples2_features_per_s",
        "value": round(disc_thr, 1),
        "unit": "samples^2*features/s",
        "vs_baseline": round(disc_thr / ref_thr, 3),
        "detail": {
            "workload": f"SNP genotypes {n}x{p} (discrete MXU engine)",
            "fit_seconds": round(disc_s, 4),
            "continuous_workload": f"{nc}x{pc} (Pallas kernels)",
            "continuous_fit_seconds": round(cont_s, 4),
            "continuous_throughput": round(cont_thr, 1),
            "continuous_vs_baseline": round(cont_thr / ref_thr, 3),
            "continuous_fraction_of_vpu_peak": _frac_peak(nc, pc, cont_s),
            "backend": backend,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
