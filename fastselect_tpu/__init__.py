"""fastselect_tpu — a TPU-native feature-selection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``fast-select`` library (reference: GavinLynch04/FastSelect).  The public
surface mirrors the reference package (`src/fast_select/__init__.py:1-10`):
eight selectors with a scikit-learn estimator API, but every compute path is
built TPU-first:

* Relief-family scorers (ReliefF, SURF/SURF*, MultiSURF/MultiSURF*) run on a
  single tiled pairwise-interaction engine (`fastselect_tpu.ops.relief`) with
  an MXU one-hot-matmul fast path for discrete data and Pallas kernels for
  the continuous hot loops.
* chi2 / mutual-information / symmetrical-uncertainty statistics are one-hot
  contingency matmuls on the MXU (`fastselect_tpu.ops`).
* Multi-chip scaling is expressed with `jax.sharding.Mesh` + `shard_map`
  (`fastselect_tpu.parallel`), not translated from any CUDA code.

Backends: ``backend='auto'|'tpu'|'cpu'`` (``'gpu'`` raises, mirroring the
reference's behaviour when CUDA is absent).
"""

import os as _os

# Persistent XLA compilation cache: engine programs are shape-bucketed and
# reused across processes (first TPU compile of the pairwise engine is
# expensive; subsequent runs load from cache in ms).
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       "/tmp/fastselect_tpu_jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from .models.relieff import ReliefF
from .models.surf import SURF
from .models.multisurf import MultiSURF
from .models.turf import TuRF
from .models.mrmr import mRMR
from .models.chi2 import chi2
from .models.mdr import MDR
from .models.cfs import CFS

__all__ = ["ReliefF", "SURF", "MultiSURF", "TuRF", "mRMR", "chi2", "MDR", "CFS"]

__version__ = "0.1.0"
