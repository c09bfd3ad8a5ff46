"""Reference submodule path ``fast_select.ReliefF`` (compat alias)."""

from fastselect_tpu.models.relieff import ReliefF

__all__ = ["ReliefF"]
