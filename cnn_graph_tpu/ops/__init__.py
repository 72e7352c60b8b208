"""Device compute ops: spectral filters, Laplacian operators, pooling."""

from cnn_graph_tpu.ops.filters import (
    cheby_basis,
    cheby_conv,
    cheby_weights_from_flat,
    fourier_conv,
    lanczos_basis_device,
    lanczos_conv,
)
from cnn_graph_tpu.ops.laplacian import (
    BandedLaplacian,
    BCOOLaplacian,
    BlockSparseLaplacian,
    cheby_finals,
    DenseLaplacian,
    device_laplacian,
    pack_banded,
    pack_banded_ragged,
    pack_block_sparse,
    QuantBandedLaplacian,
    QuantBlockSparseLaplacian,
    QuantDenseLaplacian,
    quantize_banded,
    quantize_block_sparse,
    quantize_dense,
)
from cnn_graph_tpu.ops.pooling import avg_pool, max_pool

__all__ = [
    "cheby_basis",
    "cheby_conv",
    "cheby_weights_from_flat",
    "fourier_conv",
    "lanczos_basis_device",
    "lanczos_conv",
    "BandedLaplacian",
    "BCOOLaplacian",
    "BlockSparseLaplacian",
    "cheby_finals",
    "DenseLaplacian",
    "device_laplacian",
    "pack_banded",
    "pack_banded_ragged",
    "pack_block_sparse",
    "QuantBandedLaplacian",
    "QuantBlockSparseLaplacian",
    "QuantDenseLaplacian",
    "quantize_banded",
    "quantize_block_sparse",
    "quantize_dense",
    "avg_pool",
    "max_pool",
]
