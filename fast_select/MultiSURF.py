"""Reference submodule path ``fast_select.MultiSURF`` (compat alias)."""

from fastselect_tpu.models.multisurf import MultiSURF

__all__ = ["MultiSURF"]
