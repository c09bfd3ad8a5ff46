"""Test-only stand-in for numba, used ONLY when running the reference's
own pytest suites against this package (tests/test_reference_suite.py).

The reference tests import ``from numba import cuda`` at module scope
purely to skip-gate their GPU paths (e.g. reference
``tests/test_cfs.py:5,57``, ``tests/test_mdr.py:13-17``).  This package
is TPU-native and ships no numba; the stand-in makes those imports
succeed and reports CUDA as unavailable so every CUDA-gated test skips,
exactly as it does on the reference's own CPU-only CI
(``.github/workflows/python-tests.yml``).
"""


class _CudaStub:
    @staticmethod
    def is_available():
        return False

    def __getattr__(self, name):
        raise RuntimeError(
            "numba.cuda is a test-only stub (fastselect_tpu is "
            f"TPU-native); attribute {name!r} is unavailable.")


cuda = _CudaStub()


def njit(*args, **kwargs):
    """Identity decorator (supports bare and parametrised forms)."""
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def deco(fn):
        return fn

    return deco


def prange(*args):
    return range(*args)
