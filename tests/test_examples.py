"""The shipped examples must keep working (they are the first thing a
migrating user runs)."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(args):
    env = os.environ.copy()
    env.pop("JAX_PLATFORMS", None)
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            f"import sys; sys.argv = {args!r};"
            f"exec(open({args[0]!r}).read())")
    return subprocess.run([sys.executable, "-c", code], cwd=str(REPO),
                          env=env, capture_output=True, text=True,
                          timeout=600)


def test_gwas_workflow_example():
    r = _run(["examples/gwas_workflow.py", "--n", "260", "--p", "180"])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "planted signals recovered: True" in r.stdout


def test_sklearn_pipeline_example():
    r = _run(["examples/sklearn_pipeline.py"])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "cv accuracy" in r.stdout
