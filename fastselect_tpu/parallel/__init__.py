from .sharded import (sharded_relief_scores, sharded_multisurf_scores,
                      sharded_relief_discrete_scores,
                      make_mesh)

__all__ = ["sharded_relief_scores", "sharded_multisurf_scores",
           "sharded_relief_discrete_scores", "make_mesh"]
