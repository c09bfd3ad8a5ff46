from .sharded import (sharded_relief_scores, sharded_multisurf_scores,
                      sharded_relief_discrete_scores,
                      make_mesh)
from .ring import ring_relief_discrete_scores
from .feature_shard import (feature_sharded_relief_discrete_scores,
                            sharded_chi2_stats)
from .mdr_shard import (ShardedMDRFoldScorer,
                        sharded_batch_balanced_accuracy)

__all__ = ["sharded_relief_scores", "sharded_multisurf_scores",
           "sharded_relief_discrete_scores",
           "ring_relief_discrete_scores",
           "feature_sharded_relief_discrete_scores",
           "sharded_chi2_stats",
           "sharded_batch_balanced_accuracy", "ShardedMDRFoldScorer",
           "make_mesh"]
