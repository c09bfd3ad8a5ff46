"""Pytest plugin loaded (-p) by the reference-suite subprocess runner.

Two jobs:

* Force JAX onto the XLA-CPU backend before any backend initialises —
  the JAX_PLATFORMS env var alone is unreliable when a TPU plugin is
  installed (the plugin wins), so the config API is used, mirroring
  tests/conftest.py.
* Deselect the documented-divergence tests by EXACT node ID (pytest's
  --deselect prefix-matches, so ``test_backend`` would also swallow
  ``test_backend_error_handling``).  The list arrives via the
  FS_REF_DESELECT env var, comma-separated.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")

_DESELECT = frozenset(
    filter(None, os.environ.get("FS_REF_DESELECT", "").split(",")))


def pytest_collection_modifyitems(config, items):
    if not _DESELECT:
        return
    drop = [it for it in items if it.nodeid in _DESELECT]
    if drop:
        config.hook.pytest_deselected(items=drop)
        items[:] = [it for it in items if it.nodeid not in _DESELECT]
