"""Plotting utilities (spectrum inspection, convergence curves).

Counterparts of the reference's matplotlib helpers: ``plot_spectrum``
(lib/graph.py:169-181) and the ModelPerf convergence plots live in
utils/harness.py.  All functions return the figure so callers control
display/saving (no implicit pyplot state).
"""

from __future__ import annotations

import numpy as np

__all__ = ["plot_spectrum"]


def plot_spectrum(laplacians, algo: str = "eig"):
    """Plot the eigenvalue spectra of a multi-scale Laplacian pyramid
    (lib/graph.py:169-181): level i is drawn at stride 2^i so the x-axis
    aligns nodes across coarsening levels."""
    import matplotlib.pyplot as plt

    from cnn_graph_tpu.graphs.construction import fourier

    fig, ax = plt.subplots(figsize=(17, 5))
    for i, lap in enumerate(laplacians):
        lamb, _ = fourier(lap, algo)
        step = 2**i
        x = range(step // 2, laplacians[0].shape[0], step)
        label = f"L_{i} spectrum in [{lamb[0]:1.2e}, {lamb[-1]:1.2e}]"
        ax.plot(x, lamb, ".", label=label)
    ax.legend(loc="best")
    ax.set_xlim(0, laplacians[0].shape[0])
    ax.set_ylim(bottom=0)
    return fig
