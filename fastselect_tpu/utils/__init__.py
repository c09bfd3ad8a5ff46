from .backend import resolve_backend, tpu_available, default_device
from .validation import resolve_n_features_to_select
from .preprocessing import compute_recip_ranges, detect_discrete_features

__all__ = [
    "resolve_backend",
    "tpu_available",
    "default_device",
    "resolve_n_features_to_select",
    "compute_recip_ranges",
    "detect_discrete_features",
]
