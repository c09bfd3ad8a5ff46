#!/usr/bin/env python
"""BASELINE north-star reproduction: MultiSURF on a ~100k x 100k SNP
matrix, single chip, X generated and kept HBM-resident.

At this scale the engine takes the virtual-sort GATHER path (a sorted or
padded copy of the 9.1 GiB code matrix cannot coexist with the original
in HBM): focal blocks and class segments are gathered from the original
array, so no copy is ever made and auto tile sizes apply.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def main(n=98304, p=99840, rows=6144):
    import jax
    import jax.numpy as jnp
    from fastselect_tpu.ops.relief_discrete import relief_discrete_scores
    from fastselect_tpu.utils.backend import (default_device,
                                              execution_context)

    device = default_device("auto")
    y = np.random.RandomState(0).randint(0, 2, n).astype(np.int32)

    @partial(jax.jit, donate_argnums=(0,))
    def fill(X, key, i):
        c = jax.random.randint(key, (rows, p), 0, 3, dtype=jnp.int8)
        return jax.lax.dynamic_update_slice(X, c, (i * rows, 0))

    with execution_context(device):
        X = jnp.zeros((n, p), jnp.int8)
        for i in range(n // rows):
            X = fill(X, jax.random.PRNGKey(i), jnp.int32(i))
        np.asarray(X[0, 0])
    print(f"{n} x {p} genotypes resident "
          f"({n * p / 2**30:.1f} GiB int8)", flush=True)

    kw = dict(algo="multisurf", codes=X, n_states=3, device=device)
    relief_discrete_scores(None, y, **kw)  # compile warm-up
    t0 = time.perf_counter()
    scores = relief_discrete_scores(None, y, **kw)
    el = time.perf_counter() - t0
    print(json.dumps({
        "metric": "northstar_multisurf_fit_seconds",
        "n_samples": n, "n_features": p,
        "seconds": round(el, 2),
        "samples2_features_per_s": round(float(n) * n * p / el, 1),
        "finite": bool(np.isfinite(scores).all()),
    }))


if __name__ == "__main__":
    main()
