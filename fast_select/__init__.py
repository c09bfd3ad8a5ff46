"""Drop-in compatibility package for the reference import surface.

Users of GavinLynch04/FastSelect import ``fast_select`` (reference
``src/fast_select/__init__.py:1-10``); this package maps that exact
surface — the eight public names plus the per-algorithm submodule paths
(``fast_select.MDR``, ``fast_select.Chi2``, ...) — onto the TPU-native
implementations in :mod:`fastselect_tpu`, so switching frameworks
requires no import changes.  It is also the shim the reference's own
pytest suites run against (``tests/test_reference_suite.py``).
"""

from fastselect_tpu import (CFS, MDR, MultiSURF, ReliefF, SURF, TuRF,
                            chi2, mRMR)

__all__ = ["ReliefF", "SURF", "MultiSURF", "TuRF", "mRMR", "chi2", "MDR",
           "CFS"]
