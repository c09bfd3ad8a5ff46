"""Run the reference's OWN pytest suites against this package.

This is the real parity gate (BASELINE.md: bit-identical rankings vs
the reference CPU backend on its pytest suites): the eight suites under
``/root/reference/tests`` (~1,630 LoC) execute unmodified in a
subprocess, importing ``fast_select`` — resolved to this repo's
compatibility package (``fast_select/``) — with a test-only ``numba``
stand-in so the reference's CUDA skip-gates work without numba
installed (``tests/reference_suite/fake_numba``).

Deliberate divergences are deselected below; each has a row in
PARITY.md §"Reference-suite divergences".
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REFERENCE_TESTS = Path(
    os.environ.get("FS_REFERENCE_TESTS", "/root/reference/tests"))

# Deliberate divergences (see PARITY.md): this framework makes
# backend='tpu' a VALID value (the reference rejects it), and its
# forced-GPU error is raised honestly by our dispatch, not by Numba.
# Node IDs are relative to the reference repo root (its pyproject.toml
# sets pytest's rootdir), hence the tests/ prefix.
DESELECT = [
    "tests/test_multisurf.py::test_backend",
    "tests/test_relieff.py::test_backend",
    "tests/test_surf.py::test_backend",
    "tests/test_mrmr.py::test_init_parameter_validation",
    "tests/test_mrmr.py::test_init_gpu_backend_fails_without_cuda",
]


@pytest.mark.skipif(not REFERENCE_TESTS.is_dir(),
                    reason="reference checkout not available")
def test_reference_suite_passes():
    shim_dir = REPO / "tests" / "reference_suite"
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO), str(shim_dir / "fake_numba"), str(shim_dir)])
    # Drop any TPU pinning; the plugin forces the XLA-CPU backend.
    env.pop("JAX_PLATFORMS", None)
    # Exact-match deselection happens inside the plugin (pytest's own
    # --deselect prefix-matches and would also drop
    # test_backend_error_handling).
    env["FS_REF_DESELECT"] = ",".join(DESELECT)
    cmd = [
        sys.executable, "-m", "pytest", str(REFERENCE_TESTS), "-q",
        "-p", "force_cpu_plugin", "-p", "no:cacheprovider",
        "-o", "addopts=",
    ]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=1200, cwd=str(shim_dir))
    assert proc.returncode == 0, (
        "reference suite failed:\n" + proc.stdout[-8000:] + proc.stderr[-4000:])
    assert f"{len(DESELECT)} deselected" in proc.stdout, (
        "deselect list did not match collected node IDs:\n"
        + proc.stdout[-2000:])


@pytest.mark.skipif(not REFERENCE_TESTS.is_dir(),
                    reason="reference checkout not available")
def test_documented_divergences_are_real():
    """The deselected tests must actually FAIL — if one starts passing,
    the PARITY.md divergence row is stale and should be removed."""
    shim_dir = REPO / "tests" / "reference_suite"
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO), str(shim_dir / "fake_numba"), str(shim_dir)])
    env.pop("JAX_PLATFORMS", None)
    env.pop("FS_REF_DESELECT", None)
    cmd = [sys.executable, "-m", "pytest", "-q",
           "-p", "force_cpu_plugin", "-p", "no:cacheprovider",
           "-o", "addopts="]
    cmd += [str(REFERENCE_TESTS.parent / d) for d in DESELECT]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=600, cwd=str(shim_dir))
    assert proc.returncode != 0
    assert f"{len(DESELECT)} failed" in proc.stdout, proc.stdout[-2000:]
