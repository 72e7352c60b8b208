"""Unit tests for host-side graph construction (graphs/construction.py).

The reference ships no test suite (SURVEY.md §4); these encode its inline
invariants (graph.py:80-82, 135) plus mathematical properties as oracles.
"""

import numpy as np
import pytest
import scipy.sparse

from cnn_graph_tpu.graphs import construction as gc


class TestGrid:
    def test_shape_and_range(self):
        z = gc.grid(28)
        assert z.shape == (784, 2)
        assert z.min() == 0.0 and z.max() == 1.0

    def test_row_major_layout(self):
        # Row i*m + j is (x=j/(m-1), y=i/(m-1)).
        z = gc.grid(3)
        np.testing.assert_allclose(z[5], [1.0, 0.5])  # i=1, j=2
        np.testing.assert_allclose(z[7], [0.5, 1.0])  # i=2, j=1


class TestKnnAdjacency:
    def test_knn_excludes_self(self, rng):
        z = rng.uniform(size=(50, 2))
        dist, idx = gc.knn(z, k=4)
        assert dist.shape == idx.shape == (50, 4)
        assert dist.min() > 0
        assert not np.any(idx == np.arange(50)[:, None])

    def test_adjacency_invariants(self, rng):
        z = rng.uniform(size=(80, 2))
        W = gc.knn_graph(z, k=5)
        assert type(W) is scipy.sparse.csr_matrix
        assert W.nnz % 2 == 0
        assert abs(W - W.T).sum() < 1e-10
        assert W.diagonal().sum() == 0
        assert W.data.min() > 0 and W.data.max() <= 1.0

    def test_adjacency_gaussian_weights(self):
        # Two far clusters: within-cluster weights ~1, none across.
        z = np.array([[0, 0], [0.01, 0], [5, 5], [5.01, 5]], dtype=np.float64)
        W = gc.knn_graph(z, k=1)
        # All kNN distances equal sigma here, so weights are exp(-1).
        np.testing.assert_allclose(W[0, 1], np.exp(-1))
        assert W[0, 2] == 0


class TestLaplacian:
    def test_combinatorial(self, rng):
        z = rng.uniform(size=(40, 2))
        W = gc.knn_graph(z, k=4)
        L = gc.laplacian(W, normalized=False)
        # Rows sum to zero; PSD.
        np.testing.assert_allclose(np.asarray(L.sum(axis=1)).ravel(), 0, atol=1e-10)
        lam = np.linalg.eigvalsh(L.toarray())
        assert lam.min() > -1e-9

    def test_normalized_spectrum_bounded(self, small_graph):
        _, L, _ = small_graph
        lam = np.linalg.eigvalsh(L.toarray())
        assert lam.min() > -1e-6
        assert lam.max() <= 2.0 + 1e-6
        assert gc.lmax(L, normalized=True) == 2.0

    def test_lmax_unnormalized(self, rng):
        z = rng.uniform(size=(40, 2))
        W = gc.knn_graph(z, k=4)
        L = gc.laplacian(W, normalized=False)
        bound = gc.lmax(L, normalized=False)
        lam = np.linalg.eigvalsh(L.toarray())
        np.testing.assert_allclose(bound, lam.max(), rtol=1e-5)

    def test_rescale_does_not_mutate(self, small_graph):
        _, L, _ = small_graph
        before = L.copy()
        Lr = gc.rescale_laplacian(L, lmax=2.0)
        assert abs(L - before).sum() == 0  # reference mutates; we must not
        lam = np.linalg.eigvalsh(Lr.toarray())
        assert lam.min() >= -1.0 - 1e-6 and lam.max() <= 1.0 + 1e-6


class TestFourier:
    def test_eigendecomposition(self, small_graph):
        _, L, _ = small_graph
        lam, U = gc.fourier(L)
        assert np.all(np.diff(lam) >= -1e-9)  # ascending
        np.testing.assert_allclose(U @ np.diag(lam) @ U.T, L.toarray(), atol=1e-5)
        np.testing.assert_allclose(U.T @ U, np.eye(L.shape[0]), atol=1e-5)


class TestChebyshevOracle:
    def test_recurrence_matches_cosine_definition(self, small_graph):
        # T_k(L) x == U diag(cos(k arccos(lam))) U^T x for rescaled L.
        _, _, Lr = small_graph
        lam, U = gc.fourier(Lr)
        lam = np.clip(lam, -1, 1)
        rng = np.random.default_rng(0)
        X = rng.normal(size=(60, 3))
        Xt = gc.chebyshev_basis(Lr, X, K=5)
        for k in range(5):
            expected = U @ np.diag(np.cos(k * np.arccos(lam))) @ U.T @ X
            np.testing.assert_allclose(Xt[k], expected, atol=1e-6)


class TestLanczos:
    def test_lanczos_filters_span_krylov(self, small_graph):
        # The Lanczos basis reproduces x when filter coefficients pick it out:
        # sum_k Xt[k] weighted appropriately spans the Krylov space; at K large
        # enough, projecting x onto the basis reconstructs L-polynomials of x.
        _, _, Lr = small_graph
        rng = np.random.default_rng(1)
        X = rng.normal(size=(60, 2))
        K = 8
        Xt = gc.lanczos_basis(Lr, X, K)
        assert Xt.shape == (K, 60, 2)
        assert np.all(np.isfinite(Xt))
        # First basis element scaled by Q[0]^2 sums... weak check: the basis
        # reconstructs X exactly with the right coefficients — the columns of
        # Xt span X (least-squares residual ~ 0).
        for n in range(2):
            A = Xt[:, :, n].T  # (M, K)
            resid = np.linalg.lstsq(A, X[:, n], rcond=None)[1]
            if resid.size:
                assert resid[0] < 1e-8


class TestReplaceRandomEdges:
    def test_noise_zero_is_identity(self, small_graph):
        W, _, _ = small_graph
        W2 = gc.replace_random_edges(W, 0.0, seed=0)
        assert abs(W - W2).sum() < 1e-12

    def test_noise_preserves_symmetry(self, small_graph):
        W, _, _ = small_graph
        W2 = gc.replace_random_edges(W, 0.3, seed=0)
        assert abs(W2 - W2.T).sum() < 1e-12
        assert W2.diagonal().sum() == 0

    def test_seed_determinism(self, small_graph):
        W, _, _ = small_graph
        a = gc.replace_random_edges(W, 0.2, seed=7)
        b = gc.replace_random_edges(W, 0.2, seed=7)
        assert abs(a - b).sum() == 0


class TestBandwidthPermutation:
    def test_rcm_reduces_bandwidth(self, rng):
        # Random permutation of a path graph has large bandwidth; RCM restores
        # a near-banded ordering.
        n = 200
        W = scipy.sparse.diags([np.ones(n - 1), np.ones(n - 1)], [1, -1]).tocsr()
        shuffle = rng.permutation(n)
        Ws = W[shuffle][:, shuffle]
        perm = gc.bandwidth_reducing_permutation(Ws)
        Wp = Ws[perm][:, perm].tocoo()
        bandwidth = np.abs(Wp.row - Wp.col).max()
        assert bandwidth <= 2
