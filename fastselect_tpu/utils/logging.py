"""Structured per-phase timing/throughput logging.

The reference's only observability is ``verbose`` print strings
(SURVEY.md §5); those are kept verbatim on the estimators.  This adds
the promised structured layer: every engine phase (encode, H2D, pass 1,
weights, pass 2) can emit a timed record through the standard
``logging`` module under the ``fastselect_tpu`` logger.

    import logging
    logging.getLogger("fastselect_tpu").setLevel(logging.INFO)

    with phase("multisurf.pass1", work=n * n * p):
        ...

Records include wall seconds and work/second when a work estimate is
given.  Zero overhead when the logger is disabled (level check before
any timing).
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("fastselect_tpu")


@contextlib.contextmanager
def phase(name: str, work: float | None = None):
    """Time a named phase and log it at INFO (no-op if disabled)."""
    if not logger.isEnabledFor(logging.INFO):
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if work is not None and dt > 0:
            logger.info("%s: %.4fs (%.3e work/s)", name, dt, work / dt)
        else:
            logger.info("%s: %.4fs", name, dt)
