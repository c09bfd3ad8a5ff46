"""Reference submodule path ``fast_select.TuRF`` (compat alias)."""

from fastselect_tpu.models.turf import TuRF

__all__ = ["TuRF"]
