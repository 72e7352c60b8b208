"""MNIST grid-graph classification data.

The reference's MNIST experiments (nips2016/mnist.ipynb) read
``tensorflow.examples.tutorials.mnist`` files; this environment has no
network egress and no torchvision, so ``load_mnist`` reads the standard
IDX files from a local directory when present and otherwise raises with
instructions.  ``synthetic_mnist`` fabricates class-structured 28x28
images with the same shapes/splits for benchmarks and tests.

Pipeline helper ``mnist_graph_data`` applies the reference preprocessing:
8-NN grid graph, 4-level coarsening, ``perm_data`` on every split
(nips2016/mnist.ipynb cells 3-5).
"""

from __future__ import annotations

import gzip
import os
import struct

import numpy as np

from cnn_graph_tpu.graphs import coarsening, construction as gc

__all__ = ["load_mnist", "synthetic_mnist", "mnist_graph_data"]


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">HBB", f.read(4))
        dtype = {8: np.uint8, 11: np.int16, 12: np.int32,
                 13: np.float32, 14: np.float64}[magic[1]]
        shape = struct.unpack(f">{magic[2]}I", f.read(4 * magic[2]))
        return np.frombuffer(f.read(), dtype).reshape(shape)


def load_mnist(data_dir: str):
    """Read IDX MNIST files (optionally .gz) from ``data_dir``.

    Returns ``(train_images [60000, 784] float32 in [0,1], train_labels,
    test_images, test_labels)``."""
    names = {
        "train_images": "train-images-idx3-ubyte",
        "train_labels": "train-labels-idx1-ubyte",
        "test_images": "t10k-images-idx3-ubyte",
        "test_labels": "t10k-labels-idx1-ubyte",
    }
    out = {}
    for key, base in names.items():
        path = os.path.join(data_dir, base)
        if not os.path.exists(path) and os.path.exists(path + ".gz"):
            path += ".gz"
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} not found — this environment cannot download MNIST; "
                "place the IDX files locally or use synthetic_mnist()"
            )
        out[key] = _read_idx(path)
    return (
        out["train_images"].reshape(-1, 784).astype(np.float32) / 255.0,
        out["train_labels"].astype(np.int64),
        out["test_images"].reshape(-1, 784).astype(np.float32) / 255.0,
        out["test_labels"].astype(np.int64),
    )


def synthetic_mnist(n_train: int = 55000, n_val: int = 5000,
                    n_test: int = 10000, seed: int = 0):
    """Class-structured fake digits: each class is a distinct smooth blob
    pattern + noise on the 28x28 grid, so a grid-graph ConvNet can
    separate them.  Same shapes/splits as the real data."""
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.linspace(-1, 1, 28), np.linspace(-1, 1, 28))

    templates = []
    for c in range(10):
        cx, cy = np.cos(2 * np.pi * c / 10), np.sin(2 * np.pi * c / 10)
        blob = np.exp(-(((xs - 0.5 * cx) ** 2 + (ys - 0.5 * cy) ** 2) / 0.15))
        ring = np.exp(-((np.hypot(xs, ys) - 0.3 - 0.05 * c) ** 2) / 0.02)
        templates.append((blob + 0.5 * ring).ravel())
    templates = np.asarray(templates, np.float32)

    def make(n):
        y = rng.integers(0, 10, n)
        x = templates[y] * rng.uniform(0.7, 1.3, (n, 1)).astype(np.float32)
        x += rng.normal(0, 0.3, (n, 784)).astype(np.float32)
        return np.clip(x, 0, None).astype(np.float32), y.astype(np.int64)

    train = make(n_train)
    val = make(n_val)
    test = make(n_test)
    return {
        "train_data": train[0], "train_labels": train[1],
        "val_data": val[0], "val_labels": val[1],
        "test_data": test[0], "test_labels": test[1],
    }


def mnist_graph_data(splits: dict, k: int = 8, levels: int = 4,
                     seed: int = 2017, edge_noise: float = 0.0):
    """Reference preprocessing: 8-NN grid graph -> coarsen -> perm_data on
    every split (nips2016/mnist.ipynb cells 3-5).  ``edge_noise`` replaces
    that fraction of grid edges with random ones before coarsening — the
    graph-perturbation robustness knob the reference pipeline exposes
    (mnist.ipynb cell 3 calls ``replace_random_edges(A, 0)``).  Returns
    ``(permuted_splits, laplacians, perm)``."""
    z = gc.grid(28)
    W = gc.knn_graph(z, k=k)
    if edge_noise:
        W = gc.replace_random_edges(W, edge_noise, seed=seed)
    graphs, perm = coarsening.coarsen(W, levels=levels, seed=seed,
                                      verbose=False)
    Ls = [gc.laplacian(g, normalized=True) for g in graphs]
    out = dict(splits)
    for key in ("train_data", "val_data", "test_data"):
        out[key] = coarsening.perm_data(splits[key], perm).astype(np.float32)
    return out, Ls, perm
