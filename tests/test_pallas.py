"""Pallas BSR SpMM kernel tests (interpreter mode on CPU; the compiled
path is exercised on real TPU by bench.py and the verify drives)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse

from cnn_graph_tpu.graphs import construction as gc
from cnn_graph_tpu.ops import device_laplacian
from cnn_graph_tpu.ops.pallas_spmm import bsr_spmm


@pytest.fixture(scope="module")
def big_graph():
    # ~600 nodes so multiple 128-blocks exist, with RCM ordering for
    # block locality.
    rng = np.random.default_rng(0)
    z = rng.uniform(size=(600, 2)).astype(np.float32)
    W = gc.knn_graph(z, k=6)
    perm = gc.bandwidth_reducing_permutation(W)
    W = W[perm][:, perm]
    return gc.laplacian(W.tocsr(), normalized=True)


class TestBsrSpmmInterpret:
    def test_matches_scipy(self, big_graph):
        L = big_graph
        op = device_laplacian(L, fmt="bsr", block_size=128)
        Lr = gc.rescale_laplacian(L, 2.0)
        rng = np.random.default_rng(1)
        X = rng.normal(size=(op.m_padded, 256)).astype(np.float32)
        X[op.m :] = 0

        got = np.asarray(bsr_spmm(op, jnp.asarray(X), interpret=True))
        want = Lr @ X[: op.m]
        np.testing.assert_allclose(got[: op.m], want, atol=1e-4)
        np.testing.assert_allclose(got[op.m :], 0.0, atol=1e-5)

    def test_column_padding(self, big_graph):
        # C not a multiple of the tile: output still matches, shape kept.
        op = device_laplacian(big_graph, fmt="bsr", block_size=128)
        rng = np.random.default_rng(2)
        X = rng.normal(size=(op.m_padded, 200)).astype(np.float32)
        got = np.asarray(bsr_spmm(op, jnp.asarray(X), interpret=True))
        assert got.shape == (op.m_padded, 200)
        Lr = gc.rescale_laplacian(big_graph, 2.0)
        np.testing.assert_allclose(got[: op.m], Lr @ X[: op.m], atol=1e-4)

    def test_agrees_with_xla_bsr_path(self, big_graph):
        op = device_laplacian(big_graph, fmt="bsr", block_size=128)
        rng = np.random.default_rng(3)
        X = jnp.asarray(rng.normal(size=(op.m_padded, 128)).astype(np.float32))
        xla = np.asarray(op.matmul(X))  # use_pallas=False path
        pallas = np.asarray(bsr_spmm(op, X, interpret=True))
        np.testing.assert_allclose(pallas, xla, atol=1e-4)

    def test_rectangular_blocks_8x128(self, big_graph):
        # Short-wide tiles: same math, ~8x less fill-in on sparse rows.
        op = device_laplacian(big_graph, fmt="bsr", block_size=(8, 128),
                              use_pallas=False)
        assert op.blocks.shape[1:] == (8, 128)
        rng = np.random.default_rng(4)
        X = rng.normal(size=(op.m_padded, 256)).astype(np.float32)
        X[op.m:] = 0
        Lr = gc.rescale_laplacian(big_graph, 2.0)
        got_xla = np.asarray(op.matmul(jnp.asarray(X)))
        np.testing.assert_allclose(got_xla[: op.m], Lr @ X[: op.m], atol=1e-4)
        got_pl = np.asarray(bsr_spmm(op, jnp.asarray(X), interpret=True))
        np.testing.assert_allclose(got_pl, got_xla, atol=1e-4)

    def test_rowptr_consistency(self, big_graph):
        op = device_laplacian(big_graph, fmt="bsr", block_size=128)
        rowptr = np.asarray(op.block_rowptr)
        brows = np.asarray(op.block_rows)
        assert rowptr[0] == 0 and rowptr[-1] == len(brows)
        for i in range(len(rowptr) - 1):
            assert np.all(brows[rowptr[i] : rowptr[i + 1]] == i)

    def test_gradients_through_kernel(self, big_graph):
        # The custom VJP (symmetric adjoint) makes the kernel trainable.
        import jax

        op = device_laplacian(big_graph, fmt="bsr", block_size=128)
        rng = np.random.default_rng(5)
        X = jnp.asarray(rng.normal(size=(op.m_padded, 128)).astype(np.float32))

        def loss(x):
            return jnp.sum(bsr_spmm(op, x, interpret=True) ** 2)

        g = jax.grad(loss)(X)
        # Analytic: d/dx sum((Lx)^2) = 2 L^T L x = 2 L L x (symmetric).
        want = 2 * np.asarray(
            bsr_spmm(op, bsr_spmm(op, X, interpret=True), interpret=True)
        )
        np.testing.assert_allclose(np.asarray(g), want, atol=1e-3)


class TestChunkedRowSlabDMA:
    """Chunked mode (one slab DMA per block-row extent) vs the per-block
    pipeline: identical results; auto-selection skips hub-heavy rows."""

    def test_chunked_matches_per_block(self, big_graph):
        import dataclasses

        op = device_laplacian(big_graph, fmt="bsr", block_size=128,
                              chunked_rows=True)
        assert op.row_max > 0, "even kNN graph should allow chunked DMA"
        per_block = dataclasses.replace(op, row_max=0)
        rng = np.random.default_rng(21)
        X = jnp.asarray(
            rng.normal(size=(op.m_padded, 192)).astype(np.float32))
        got = np.asarray(bsr_spmm(op, X, interpret=True))
        want = np.asarray(bsr_spmm(per_block, X, interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_hub_rows_disable_chunking(self):
        import scipy.sparse

        # A star-ish graph: one row block holds ~all blocks; the slab
        # buffer would be sized by that hub, so auto keeps per-block.
        n = 2048
        rows = np.concatenate([np.zeros(n, np.int64), np.arange(n)])
        cols = np.concatenate([np.arange(n), np.zeros(n, np.int64)])
        data = np.ones(len(rows))
        W = scipy.sparse.coo_matrix((data, (rows, cols)), shape=(n, n))
        from cnn_graph_tpu.graphs import construction as gc

        op = device_laplacian(gc.laplacian(W.tocsr(), normalized=True),
                              fmt="bsr", block_size=128, chunked_rows=True)
        assert op.row_max == 0
