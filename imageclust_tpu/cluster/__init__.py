from imageclust_tpu.cluster.ward import (
    ClusterResult,
    ConstraintError,
    calculate_optimal_clusters,
    constrained_ward,
)
from imageclust_tpu.cluster.sharded import constrained_ward_bucketed
from imageclust_tpu.cluster.chain import constrained_ward_chain

__all__ = [
    "ClusterResult",
    "ConstraintError",
    "calculate_optimal_clusters",
    "constrained_ward",
    "constrained_ward_bucketed",
    "constrained_ward_chain",
]
