"""Host-side graph precompute: construction, spectra, coarsening."""

from cnn_graph_tpu.graphs.construction import (
    adjacency,
    bandwidth_reducing_permutation,
    chebyshev_basis,
    fourier,
    grid,
    knn,
    knn_graph,
    lanczos_basis,
    laplacian,
    lmax,
    replace_random_edges,
    rescale_laplacian,
)
from cnn_graph_tpu.graphs.coarsening import (
    coarsen,
    compute_perm,
    graclus,
    perm_adjacency,
    perm_data,
)

__all__ = [
    "adjacency",
    "bandwidth_reducing_permutation",
    "chebyshev_basis",
    "fourier",
    "grid",
    "knn",
    "knn_graph",
    "lanczos_basis",
    "laplacian",
    "lmax",
    "replace_random_edges",
    "rescale_laplacian",
    "coarsen",
    "compute_perm",
    "graclus",
    "perm_adjacency",
    "perm_data",
]
