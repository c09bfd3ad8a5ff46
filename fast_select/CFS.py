"""Reference submodule path ``fast_select.CFS`` (compat alias)."""

from fastselect_tpu.models.cfs import CFS

__all__ = ["CFS"]
