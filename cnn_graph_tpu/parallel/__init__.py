"""Multi-chip parallelism: meshes, shardings, node-partitioned operators."""

from cnn_graph_tpu.parallel.halo import (
    HaloShardedLaplacian,
    halo_sharded_laplacian,
)
from cnn_graph_tpu.parallel.mesh import P, data_sharding, make_mesh, replicated
from cnn_graph_tpu.parallel.node_sharded import (
    NodeShardedLaplacian,
    node_sharded_laplacian,
)

__all__ = [
    "P",
    "data_sharding",
    "make_mesh",
    "replicated",
    "HaloShardedLaplacian",
    "halo_sharded_laplacian",
    "NodeShardedLaplacian",
    "node_sharded_laplacian",
]
