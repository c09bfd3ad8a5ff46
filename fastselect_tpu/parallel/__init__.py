from .sharded import (sharded_relief_scores, sharded_multisurf_scores,
                      sharded_relief_discrete_scores,
                      make_mesh)
from .ring import ring_relief_discrete_scores

__all__ = ["sharded_relief_scores", "sharded_multisurf_scores",
           "sharded_relief_discrete_scores",
           "ring_relief_discrete_scores", "make_mesh"]
