"""Halo-exchange node-parallel SpMM tests (virtual 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_graph_tpu.graphs import construction as gc
from cnn_graph_tpu.ops import cheby_conv, device_laplacian
from cnn_graph_tpu.parallel import make_mesh
from cnn_graph_tpu.parallel.halo import halo_sharded_laplacian


@pytest.fixture(scope="module")
def banded_graph():
    """RCM-ordered kNN graph on a 1-D manifold: small edge cut under a
    contiguous partition — the favourable case for halo exchange."""
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(size=96))
    z = np.stack([t, 0.05 * rng.normal(size=96)], axis=1).astype(np.float32)
    W = gc.knn_graph(z, k=4)
    perm = gc.bandwidth_reducing_permutation(W)
    W = W[perm][:, perm].tocsr()
    return gc.laplacian(W, normalized=True)


class TestHaloShardedLaplacian:
    @pytest.mark.parametrize("nodes", [2, 4])
    def test_matmul_matches_dense(self, banded_graph, nodes):
        mesh = make_mesh(data=8 // nodes, nodes=nodes)
        halo_op = halo_sharded_laplacian(banded_graph, mesh)
        dense_op = device_laplacian(banded_graph, fmt="dense")

        rng = np.random.default_rng(1)
        X = rng.normal(size=(halo_op.m_padded, 16)).astype(np.float32)
        with mesh:
            got = np.asarray(jax.jit(halo_op.matmul)(jnp.asarray(X)))
        Xd = np.zeros((dense_op.m_padded, 16), np.float32)
        Xd[: dense_op.m] = X[: dense_op.m]
        want = np.asarray(dense_op.matmul(jnp.asarray(Xd)))
        np.testing.assert_allclose(
            got[: halo_op.m], want[: halo_op.m], atol=1e-4
        )

    def test_halo_is_small_for_banded_graph(self, banded_graph):
        mesh = make_mesh(data=2, nodes=4)
        halo_op = halo_sharded_laplacian(banded_graph, mesh)
        # Bandwidth-ordered 1-D graph: halo per peer << rows per shard.
        assert halo_op.halo <= halo_op.rows_per_shard // 2

    def test_cheby_conv_through_halo_operator(self, banded_graph):
        mesh = make_mesh(data=4, nodes=2)
        halo_op = halo_sharded_laplacian(banded_graph, mesh)
        dense_op = device_laplacian(banded_graph, fmt="dense")

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(4, 96, 3)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(5, 3, 2)).astype(np.float32) * 0.1)
        with mesh:
            got = np.asarray(jax.jit(cheby_conv)(x, halo_op, w))
        want = np.asarray(cheby_conv(x, dense_op, w))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_gradients_flow_through_exchange(self, banded_graph):
        mesh = make_mesh(data=4, nodes=2)
        halo_op = halo_sharded_laplacian(banded_graph, mesh)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 96, 3)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(4, 3, 2)).astype(np.float32) * 0.1)

        def loss(w):
            return jnp.sum(cheby_conv(x, halo_op, w) ** 2)

        with mesh:
            g = jax.jit(jax.grad(loss))(w)
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).max()) > 0
