"""Unit tests for Graclus coarsening and binary-tree permutations."""

import numpy as np
import pytest
import scipy.sparse

from cnn_graph_tpu.graphs import coarsening, construction


class TestComputePerm:
    def test_reference_vector(self):
        # The one automated test the reference ships: the import-time assert
        # at lib/coarsening.py:216-217.
        parents = [np.array([4, 1, 1, 2, 2, 3, 0, 0, 3]), np.array([2, 1, 0, 1, 0])]
        assert coarsening.compute_perm(parents) == [
            [3, 4, 0, 9, 1, 2, 5, 8, 6, 7, 10, 11],
            [2, 4, 1, 3, 0, 5],
            [0, 1, 2],
        ]

    def test_empty(self):
        assert coarsening.compute_perm([]) == []

    def test_layers_double(self):
        rng = np.random.default_rng(3)
        # Random single-level parent over 10 nodes into 6 clusters of size <=2.
        parent = np.array([0, 0, 1, 1, 2, 3, 3, 4, 5, 2])
        perms = coarsening.compute_perm([parent])
        assert len(perms) == 2
        assert len(perms[0]) == 12  # 6 clusters * 2
        assert sorted(perms[1]) == list(range(6))


class TestGraclus:
    def test_pairing_is_a_matching(self, small_graph):
        W, _, _ = small_graph
        graphs, parents = coarsening.graclus(W, levels=3, seed=42)
        assert len(graphs) == 4 and len(parents) == 3
        for lvl, parent in enumerate(parents):
            counts = np.bincount(parent)
            assert counts.max() <= 2  # clusters are singletons or pairs
            assert parent.shape[0] == graphs[lvl].shape[0]
            assert parent.max() + 1 == graphs[lvl + 1].shape[0]

    def test_coarse_weights_are_cluster_sums(self, small_graph):
        W, _, _ = small_graph
        graphs, parents = coarsening.graclus(W, levels=1, seed=0)
        parent = parents[0]
        n_coarse = parent.max() + 1
        expected = np.zeros((n_coarse, n_coarse))
        coo = W.tocoo()
        for r, c, v in zip(coo.row, coo.col, coo.data):
            expected[parent[r], parent[c]] += v
        np.testing.assert_allclose(graphs[1].toarray(), expected, atol=1e-10)

    def test_seed_determinism(self, small_graph):
        W, _, _ = small_graph
        g1, p1 = coarsening.graclus(W, levels=2, seed=11)
        g2, p2 = coarsening.graclus(W, levels=2, seed=11)
        for a, b in zip(p1, p2):
            np.testing.assert_array_equal(a, b)


class TestPermData:
    def test_roundtrip_positions(self):
        x = np.arange(6, dtype=np.float64).reshape(1, 6)
        indices = [3, 4, 0, 7, 1, 2, 5, 6]  # 2 fake nodes (6, 7)
        out = coarsening.perm_data(x, indices)
        assert out.shape == (1, 8)
        np.testing.assert_allclose(out[0], [3, 4, 0, 0, 1, 2, 5, 0])

    def test_3d_signals(self):
        x = np.ones((2, 4, 3))
        out = coarsening.perm_data(x, [1, 0, 3, 2, 4, 5])
        assert out.shape == (2, 6, 3)
        np.testing.assert_allclose(out[:, :4], 1.0)
        np.testing.assert_allclose(out[:, 4:], 0.0)

    def test_none_is_identity(self):
        x = np.arange(4.0).reshape(1, 4)
        assert coarsening.perm_data(x, None) is x


class TestPermAdjacency:
    def test_permutation_preserves_weights(self, small_graph):
        W, _, _ = small_graph
        M = W.shape[0]
        indices = list(np.random.default_rng(5).permutation(M + 4))
        A = coarsening.perm_adjacency(W, indices).tocsr()
        assert A.shape == (M + 4, M + 4)
        assert A.nnz == W.nnz
        # Entry (i, j) of the original appears at the permuted positions.
        pos = np.argsort(indices)
        coo = W.tocoo()
        for r, c, v in list(zip(coo.row, coo.col, coo.data))[:20]:
            assert A[pos[r], pos[c]] == pytest.approx(v)


class TestCoarsenEndToEnd:
    def test_coarsen_pipeline(self, small_graph):
        W, _, _ = small_graph
        graphs, perm = coarsening.coarsen(W, levels=3, seed=42, verbose=False)
        assert len(graphs) == 4
        M0 = graphs[0].shape[0]
        # Fake-node padded level-0 size divisible by 2^levels, and each level
        # exactly halves.
        assert M0 % 8 == 0
        assert len(perm) == M0
        for i in range(1, 4):
            assert graphs[i].shape[0] * 2 == graphs[i - 1].shape[0] or i == 3
        # Every level stays symmetric with zero diagonal.
        for g in graphs:
            assert abs(g - g.T).sum() < 1e-8
            assert g.diagonal().sum() == 0

    def test_pooling_tree_consistency(self, small_graph):
        # Signals permuted by `perm` then max-pooled twice land on nodes whose
        # Laplacian is graphs[2]'s: shapes must agree.
        W, _, _ = small_graph
        graphs, perm = coarsening.coarsen(W, levels=2, seed=1, verbose=False)
        x = np.random.default_rng(0).normal(size=(5, W.shape[0]))
        xp = coarsening.perm_data(x, perm)
        assert xp.shape[1] == graphs[0].shape[0]
        assert xp.shape[1] // 4 == graphs[2].shape[0]
