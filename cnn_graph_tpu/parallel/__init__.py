"""Multi-chip parallelism: meshes, shardings, node-partitioned operators."""

from cnn_graph_tpu.parallel.banded_halo import (
    BandedHaloLaplacian,
    QuantBandedHaloLaplacian,
    banded_halo_laplacian,
    quantize_banded_halo,
)
from cnn_graph_tpu.parallel.halo import (
    HaloShardedLaplacian,
    build_halo_plan,
    halo_sharded_laplacian,
)
from cnn_graph_tpu.parallel.sparse_halo import (
    BandedSparseHaloLaplacian,
    QuantBandedSparseHaloLaplacian,
    QuantSparseHaloLaplacian,
    SparseHaloLaplacian,
    quantize_sparse_halo,
    sparse_halo_laplacian,
)
from cnn_graph_tpu.parallel.mesh import P, data_sharding, make_mesh, replicated
from cnn_graph_tpu.parallel.node_sharded import (
    NodeShardedLaplacian,
    node_sharded_laplacian,
)

__all__ = [
    "P",
    "BandedHaloLaplacian",
    "QuantBandedHaloLaplacian",
    "banded_halo_laplacian",
    "quantize_banded_halo",
    "data_sharding",
    "make_mesh",
    "replicated",
    "HaloShardedLaplacian",
    "build_halo_plan",
    "halo_sharded_laplacian",
    "SparseHaloLaplacian",
    "sparse_halo_laplacian",
    "quantize_sparse_halo",
    "BandedSparseHaloLaplacian",
    "QuantSparseHaloLaplacian",
    "QuantBandedSparseHaloLaplacian",
    "NodeShardedLaplacian",
    "node_sharded_laplacian",
]
