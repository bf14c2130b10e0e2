from imageclust_tpu.cluster.ward import (
    ClusterResult,
    ConstraintError,
    calculate_optimal_clusters,
    constrained_ward,
)
from imageclust_tpu.cluster.sharded import constrained_ward_bucketed

__all__ = [
    "ClusterResult",
    "ConstraintError",
    "calculate_optimal_clusters",
    "constrained_ward",
    "constrained_ward_bucketed",
]
