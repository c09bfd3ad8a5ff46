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

# Rough per-chip peaks (dense matmul TFLOP/s bf16, HBM GB/s, VPU T op/s
# f32) for roofline context; unknown chips report None.  VPU peak =
# 8 sublanes x 128 lanes x 4 ALUs x clock (the elementwise ceiling that
# bounds the continuous Relief kernels; the discrete engine is bounded
# by the matmul peak instead).
_PEAKS = {
    "TPU v4": (275.0, 1200.0, 3.8),
    "TPU v5 lite": (394.0, 819.0, 3.8),
    "TPU v5e": (394.0, 819.0, 3.8),
    "TPU v5p": (459.0, 2765.0, 7.5),
    "TPU v6 lite": (918.0, 1640.0, 3.8),
    "TPU v6e": (918.0, 1640.0, 3.8),
}


def device_kind() -> str:
    d = jax.devices()[0]
    return getattr(d, "device_kind", d.platform)


def roofline() -> tuple[float | None, float | None]:
    """(peak matmul TFLOP/s, peak HBM GB/s) for the first device."""
    kind = device_kind()
    for prefix, peaks in _PEAKS.items():
        if kind.startswith(prefix):
            return peaks[:2]
    return None, None


def vpu_peak_tops() -> float | None:
    """Peak VPU f32 throughput (T op/s) for the first device."""
    kind = device_kind()
    for prefix, peaks in _PEAKS.items():
        if kind.startswith(prefix):
            return peaks[2]
    return None


def continuous_fraction_of_peak(n: int, p: int, seconds: float,
                                ops_per_element: float = 9.0
                                ) -> float | None:
    """Fraction of the VPU roofline achieved by a continuous Relief fit:
    both passes touch n^2 * p elements with ~`ops_per_element` VPU ops
    (sub, abs, mul, reduce-add in pass 1; + weight multiply and two-axis
    reduce in pass 2)."""
    peak = vpu_peak_tops()
    if peak is None or seconds <= 0:
        return None
    return (float(n) * n * p * ops_per_element / seconds) / (peak * 1e12)


@dataclass
class FitTiming:
    seconds: float
    warmup_seconds: float
    n_samples: int
    n_features: int
    peak_rss_mb: float = 0.0       # max host RSS sampled during the fit
    peak_device_mb: float = 0.0    # accelerator peak_bytes_in_use (0 if
    #                                the runtime doesn't report it)
    throughput: float = field(init=False)  # samples^2 * features / s

    def __post_init__(self):
        work = float(self.n_samples) ** 2 * self.n_features
        self.throughput = work / self.seconds if self.seconds > 0 else 0.0


class _RssSampler:
    """Background thread sampling /proc/self/statm resident pages.

    The reference publishes peak-host-memory curves
    (``benchmark_plots/*_memory.png``); this is the measurement side of
    the repo's equivalent — sampling (vs VmHWM) so each fit gets its own
    peak instead of a process-lifetime high-water mark."""

    def __init__(self, interval: float = 0.005):
        import threading
        self._interval = interval
        self._stop = threading.Event()
        self.peak_bytes = 0
        self._page = 4096
        try:
            import resource
            self._page = resource.getpagesize()
        except Exception:  # pragma: no cover
            pass
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def _read(self) -> int:
        try:
            with open("/proc/self/statm") as fh:
                return int(fh.read().split()[1]) * self._page
        except Exception:  # pragma: no cover - non-Linux
            return 0

    def _loop(self):
        while not self._stop.is_set():
            self.peak_bytes = max(self.peak_bytes, self._read())
            self._stop.wait(self._interval)

    def __enter__(self):
        self.peak_bytes = self._read()
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=1.0)
        self.peak_bytes = max(self.peak_bytes, self._read())


def _device_peak_bytes() -> int:
    """Accelerator peak_bytes_in_use across visible non-CPU devices
    (0 when the runtime doesn't expose memory_stats)."""
    peak = 0
    try:
        for d in jax.devices():
            if d.platform == "cpu":
                continue
            stats = d.memory_stats() or {}
            peak = max(peak, int(stats.get("peak_bytes_in_use", 0)))
    except Exception:
        pass
    return peak


def timed_fit(make_estimator, X, y, *, warmup=True,
              track_memory=True, repeats=1) -> FitTiming:
    """Time ``estimator.fit(X, y)`` with compile excluded.

    ``make_estimator`` is a zero-arg factory (mirrors the reference's
    ``clone`` discipline, ``benchmarking.py:80``): the warm-up fit runs on
    a fresh instance at the SAME shape so the timed fit hits the
    persistent XLA compile cache.  ``track_memory`` samples peak host
    RSS during the timed fit and reads the device allocator's
    peak_bytes_in_use after it.  ``repeats`` runs the timed fit k times
    and reports the FASTEST (standard microbenchmark discipline — on a
    tunnelled runtime individual H2D transfers can stall by multiples,
    and the minimum is the reproducible number); peak memory is the max
    across repeats.
    """
    t0 = time.perf_counter()
    if warmup:
        make_estimator().fit(X, y)
    t_warm = time.perf_counter() - t0

    seconds = float("inf")
    rss_mb = dev_mb = 0.0
    for _ in range(max(1, int(repeats))):
        est = make_estimator()
        sampler = (_RssSampler() if track_memory
                   else contextlib.nullcontext())
        t0 = time.perf_counter()
        with sampler:
            est.fit(X, y)
        seconds = min(seconds, time.perf_counter() - t0)
        if isinstance(sampler, _RssSampler):
            rss_mb = max(rss_mb, sampler.peak_bytes / 2**20)
    dev_mb = _device_peak_bytes() / 2**20 if track_memory else 0.0
    return FitTiming(seconds, t_warm, int(np.shape(X)[0]),
                     int(np.shape(X)[1]), peak_rss_mb=rss_mb,
                     peak_device_mb=dev_mb)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace of the enclosed region (view in TensorBoard /
    xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
