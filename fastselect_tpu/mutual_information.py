"""Module-level alias matching the reference package layout
(``fast_select.mutual_information``)."""

from .ops.mi import (calculate_mi_single_pair, calculate_mi_matrices,
                     _validate_discrete)

__all__ = ["calculate_mi_single_pair", "calculate_mi_matrices"]
