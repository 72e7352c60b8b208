"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Must run before the first ``import jax`` anywhere in the test session so the
multi-chip sharding tests (tests/test_parallel.py) get a real 8-device mesh
without TPU hardware.
"""

import os

# Force-override: the host environment pins JAX_PLATFORMS=axon (TPU tunnel)
# and pre-imports jax via sitecustomize, so both the env var and the live
# config must be set.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest
import scipy.sparse

from cnn_graph_tpu.graphs import construction


@pytest.fixture
def rng():
    return np.random.default_rng(2017)


@pytest.fixture
def small_graph(rng):
    """A 60-node kNN graph with its normalized, rescaled Laplacian."""
    z = rng.uniform(size=(60, 2)).astype(np.float32)
    W = construction.knn_graph(z, k=6)
    L = construction.laplacian(W, normalized=True)
    L_rescaled = construction.rescale_laplacian(L, lmax=2.0)
    return W, L, L_rescaled


@pytest.fixture
def grid_graph():
    """The MNIST-style 28x28 8-NN grid graph."""
    z = construction.grid(28)
    W = construction.knn_graph(z, k=8)
    return W, construction.laplacian(W, normalized=True)
