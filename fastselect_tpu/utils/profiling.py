"""Timing / profiling harness.

The reference benchmarks time ``fit`` with ``time.perf_counter`` after an
explicit JIT warm-up pass (``benchmarking/benchmarking.py:66-86``); it has
no in-library tracing.  This module is the TPU-build equivalent plus
`jax.profiler` hooks (SURVEY.md §5 "Tracing / profiling"):

* ``timed_fit``    — warm-up-aware wall-clock of an estimator fit, with
  pairwise-throughput (samples^2 * features / s) derived the way
  BASELINE.md's north-star metric is defined.
* ``trace``        — context manager writing a TensorBoard-viewable
  `jax.profiler` trace for any code region.
* ``device_kind`` / ``roofline`` — per-chip peak estimates so throughput
  can be reported as a fraction of speed-of-light.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import numpy as np

# Rough per-chip peaks (dense matmul TFLOP/s bf16, HBM GB/s) for roofline
# context; unknown chips report None.
_PEAKS = {
    "TPU v4": (275.0, 1200.0),
    "TPU v5 lite": (394.0, 819.0),
    "TPU v5e": (394.0, 819.0),
    "TPU v5p": (459.0, 2765.0),
    "TPU v6 lite": (918.0, 1640.0),
    "TPU v6e": (918.0, 1640.0),
}


def device_kind() -> str:
    d = jax.devices()[0]
    return getattr(d, "device_kind", d.platform)


def roofline() -> tuple[float | None, float | None]:
    """(peak matmul TFLOP/s, peak HBM GB/s) for the first device."""
    kind = device_kind()
    for prefix, peaks in _PEAKS.items():
        if kind.startswith(prefix):
            return peaks
    return None, None


@dataclass
class FitTiming:
    seconds: float
    warmup_seconds: float
    n_samples: int
    n_features: int
    throughput: float = field(init=False)  # samples^2 * features / s

    def __post_init__(self):
        work = float(self.n_samples) ** 2 * self.n_features
        self.throughput = work / self.seconds if self.seconds > 0 else 0.0


def timed_fit(make_estimator, X, y, *, warmup=True) -> FitTiming:
    """Time ``estimator.fit(X, y)`` with compile excluded.

    ``make_estimator`` is a zero-arg factory (mirrors the reference's
    ``clone`` discipline, ``benchmarking.py:80``): the warm-up fit runs on
    a fresh instance at the SAME shape so the timed fit hits the
    persistent XLA compile cache.
    """
    t0 = time.perf_counter()
    if warmup:
        make_estimator().fit(X, y)
    t_warm = time.perf_counter() - t0

    est = make_estimator()
    t0 = time.perf_counter()
    est.fit(X, y)
    seconds = time.perf_counter() - t0
    return FitTiming(seconds, t_warm, int(np.shape(X)[0]),
                     int(np.shape(X)[1]))


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace of the enclosed region (view in TensorBoard /
    xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
