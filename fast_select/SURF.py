"""Reference submodule path ``fast_select.SURF`` (compat alias)."""

from fastselect_tpu.models.surf import SURF

__all__ = ["SURF"]
