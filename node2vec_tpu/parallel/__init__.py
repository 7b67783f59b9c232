from node2vec_tpu.parallel.mesh import make_mesh, MeshConfig
from node2vec_tpu.parallel.sharded_walk import (
    sharded_walk_chunk,
    sharded_dense_walk_chunk,
)
from node2vec_tpu.parallel.sharded_sgns import (
    col_sgns_epoch,
    sharded_sgns_step,
    ShardedSGNSState,
)
from node2vec_tpu.parallel.edge_partitioned import (
    edge_partitioned_walk,
    partition_packed_adjacency,
)

__all__ = [
    "make_mesh",
    "MeshConfig",
    "sharded_walk_chunk",
    "sharded_dense_walk_chunk",
    "sharded_sgns_step",
    "col_sgns_epoch",
    "ShardedSGNSState",
    "edge_partitioned_walk",
    "partition_packed_adjacency",
]
