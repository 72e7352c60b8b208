"""Banded halo operator: ring-ppermute exchange + per-shard banded SpMM
against the dense single-device oracle (virtual 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_graph_tpu.data.synthetic import city_graph
from cnn_graph_tpu.graphs import construction as gc
from cnn_graph_tpu.ops import device_laplacian
from cnn_graph_tpu.parallel import banded_halo_laplacian, make_mesh


@pytest.fixture(scope="module")
def setup():
    L, _ = city_graph(40, k=8, seed=0)  # 1600 nodes, bandable
    mesh = make_mesh(data=2, nodes=4)
    op = banded_halo_laplacian(L, mesh)
    ref = device_laplacian(L, fmt="dense")
    return L, mesh, op, ref


class TestBandedHalo:
    def test_matmul_matches_dense(self, setup):
        L, mesh, op, ref = setup
        rng = np.random.default_rng(0)
        x = np.zeros((op.m_padded, 64), np.float32)
        x[: op.m] = rng.normal(size=(op.m, 64))
        xr = np.zeros((ref.m_padded, 64), np.float32)
        xr[: op.m] = x[: op.m]
        with mesh:
            got = np.asarray(
                jax.jit(lambda o, v: o.matmul(v))(op, jnp.asarray(x))
            )
        want = np.asarray(ref.matmul(jnp.asarray(xr)))
        np.testing.assert_allclose(got[: op.m], want[: op.m], atol=1e-4)
        np.testing.assert_allclose(got[op.m:], 0.0, atol=1e-5)

    def test_cheby_hop_matches_dense(self, setup):
        L, mesh, op, ref = setup
        rng = np.random.default_rng(1)
        x1 = np.zeros((op.m_padded, 32), np.float32)
        x1[: op.m] = rng.normal(size=(op.m, 32))
        x0 = np.zeros((op.m_padded, 32), np.float32)
        x0[: op.m] = rng.normal(size=(op.m, 32))
        x1r = np.zeros((ref.m_padded, 32), np.float32)
        x1r[: op.m] = x1[: op.m]
        x0r = np.zeros((ref.m_padded, 32), np.float32)
        x0r[: op.m] = x0[: op.m]
        with mesh:
            got = np.asarray(jax.jit(
                lambda o, a, b: o.cheby_hop(a, b)
            )(op, jnp.asarray(x1), jnp.asarray(x0)))
        want = np.asarray(ref.cheby_hop(jnp.asarray(x1r), jnp.asarray(x0r)))
        np.testing.assert_allclose(got[: op.m], want[: op.m], atol=1e-4)

    def test_gradients_match_dense(self, setup):
        L, mesh, op, ref = setup
        rng = np.random.default_rng(2)
        x = np.zeros((op.m_padded, 16), np.float32)
        x[: op.m] = rng.normal(size=(op.m, 16))
        xr = np.zeros((ref.m_padded, 16), np.float32)
        xr[: op.m] = x[: op.m]

        def f(o, v):
            return jnp.sum(o.cheby_hop(v, 0.5 * v) ** 2)

        with mesh:
            g = np.asarray(jax.jit(jax.grad(f, argnums=1))(op,
                                                           jnp.asarray(x)))
        gr = np.asarray(jax.grad(lambda v: f(ref, v))(jnp.asarray(xr)))
        np.testing.assert_allclose(g[: op.m], gr[: op.m],
                                   rtol=1e-3, atol=1e-4)

    def test_halo_extents_are_tight(self, setup):
        L, mesh, op, ref = setup
        nbr_s = op.rows_per_shard // 128
        assert 0 < op.halo_left <= nbr_s
        assert 0 <= op.halo_right <= nbr_s
        # The exchange moves only the halo rows, not whole shards.
        assert op.halo_left + op.halo_right < 2 * nbr_s

    def test_overlap_split_matches_unsplit(self, setup):
        """The interior/boundary split (exchange-compute overlap) must be
        bit-identical to the single-pass path: same per-row einsum slices,
        same float32 accumulation — only the dependency structure differs.
        """
        import dataclasses

        L, mesh, _op, ref = setup
        # rows_per_step=1 keeps the G-rounded boundary smaller than the
        # shard so the split actually engages at this test scale.
        op = banded_halo_laplacian(L, mesh, rows_per_step=1)
        assert op.overlap and (op.boundary_pre or op.boundary_suf), (
            op.boundary_pre, op.boundary_suf, op.overlap)
        flat = dataclasses.replace(op, overlap=False)

        rng = np.random.default_rng(7)
        x1 = jnp.asarray(rng.normal(size=(op.m_padded, 32)), jnp.float32)
        x0 = jnp.asarray(rng.normal(size=(op.m_padded, 32)), jnp.float32)

        def hop(o, a, b):
            return o.cheby_hop(a, b)

        def gfun(o, a, b):
            return jnp.sum(o.cheby_hop(a, b) ** 2)

        with mesh:
            split_y = np.asarray(jax.jit(hop)(op, x1, x0))
            unsplit_y = np.asarray(jax.jit(hop)(flat, x1, x0))
            split_g = np.asarray(jax.jit(jax.grad(gfun, 1))(op, x1, x0))
            unsplit_g = np.asarray(jax.jit(jax.grad(gfun, 1))(flat, x1, x0))
        np.testing.assert_array_equal(split_y, unsplit_y)
        np.testing.assert_array_equal(split_g, unsplit_g)
        # Dense oracle agreement too (not just self-consistency).
        want = np.asarray(ref.cheby_hop(x1[: ref.m_padded],
                                        x0[: ref.m_padded]))
        np.testing.assert_allclose(split_y[: op.m], want[: op.m], atol=1e-4)

    def test_too_many_shards_raises(self):
        # 8 shards over a graph whose band is wider than a shard.
        L, _ = city_graph(16, k=8, seed=0)  # 256 nodes -> 2 block rows
        mesh = make_mesh(data=1, nodes=8)
        with pytest.raises(ValueError):
            banded_halo_laplacian(L, mesh)

    def test_node_classifier_trains_through(self, setup):
        import optax

        from cnn_graph_tpu.models import NodeClassifier

        L, mesh, op, ref = setup
        rng = np.random.default_rng(3)
        m, mp = op.m, op.m_padded
        labels = (rng.random(mp) < 0.5).astype(np.int64)
        feats = np.zeros((mp, 8), np.float32)
        feats[:m] = labels[:m, None] + 0.3 * rng.normal(size=(m, 8))
        mask = np.zeros(mp, bool)
        mask[:m] = True

        model = NodeClassifier(op, input_features=8, num_classes=2,
                               hidden=[8], K=3, dropout=1.0)
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-2)
        state = opt.init(params)

        @jax.jit
        def step(op, params, state, x, y, msk):
            import functools

            from cnn_graph_tpu.models import common as mcommon

            mdl = mcommon.with_graph_arrays(model, {"op": op})
            loss, grads = jax.value_and_grad(mdl.loss)(params, x, y, msk)
            updates, state = opt.update(grads, state, params)
            return optax.apply_updates(params, updates), state, loss

        x = jnp.asarray(feats)
        y = jnp.asarray(labels)
        msk = jnp.asarray(mask)
        losses = []
        with mesh:
            for _ in range(20):
                params, state, loss = step(op, params, state, x, y, msk)
                losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5, losses
