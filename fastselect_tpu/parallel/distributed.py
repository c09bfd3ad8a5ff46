"""Multi-host initialisation and failure surfacing.

The reference is strictly single-process (SURVEY.md §2.3/§5: no
NCCL/MPI/Gloo anywhere); scale-out is a TPU-build addition.  Multi-host
JAX needs one collective runtime handshake before any mesh spanning
hosts can be built — this wraps it with the failure behaviour promised
in SURVEY.md §5: a clean, actionable error when a host drops, and
nothing at all when running single-host (every sharded API in
``fastselect_tpu.parallel`` works unchanged on one host's devices).

Typical pod usage::

    from fastselect_tpu.parallel import distributed, make_mesh
    distributed.initialize()          # no-op on single host
    mesh = make_mesh()                # now spans all hosts' chips
    scores = ring_relief_discrete_scores(codes, y, mesh=mesh)

Fits are short-lived and stateless between calls, so elastic recovery is
restart-based: rerun the fit.  Long TuRF elimination runs resume
mid-loop from their per-iteration snapshots (``checkpoint_path``, or a
mid-run state dict via ``load_state``) — see ``models/turf.py``.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               timeout_s: int = 120) -> None:
    """Initialise the multi-host collective runtime (no-op single-host).

    Arguments default to cluster auto-detection (TPU pod metadata /
    environment) exactly like ``jax.distributed.initialize``; pass them
    explicitly on unmanaged clusters.
    """
    if jax.process_count() > 1:
        return  # already initialised
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=timeout_s,
        )
    except ValueError:
        # single-process environment without cluster metadata: fine —
        # all parallel APIs work over the local devices
        pass
    except Exception as e:  # pragma: no cover - needs a real pod
        raise RuntimeError(
            "Multi-host initialisation failed — a host is unreachable or "
            "the coordinator address is wrong. Check that every worker "
            "can reach the coordinator and restart the fit (fits are "
            "stateless; TuRF runs resume from save_state())."
        ) from e


def is_multihost() -> bool:
    return jax.process_count() > 1
