"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_graph_tpu.graphs import construction as gc
from cnn_graph_tpu.ops import cheby_conv, device_laplacian
from cnn_graph_tpu.parallel import make_mesh, node_sharded_laplacian


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(0)
    z = rng.uniform(size=(48, 2)).astype(np.float32)
    W = gc.knn_graph(z, k=4)
    return gc.laplacian(W, normalized=True)


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh()
        assert mesh.shape["data"] == 8 and mesh.shape["nodes"] == 1
        mesh = make_mesh(data=4, nodes=2)
        assert mesh.shape["data"] == 4 and mesh.shape["nodes"] == 2

    def test_bad_factorization(self):
        with pytest.raises(AssertionError):
            make_mesh(data=3, nodes=2)


class TestNodeShardedLaplacian:
    @pytest.mark.parametrize("nodes", [2, 4, 8])
    def test_matmul_matches_single_chip(self, graph, nodes):
        mesh = make_mesh(data=8 // nodes, nodes=nodes)
        sharded = node_sharded_laplacian(graph, mesh)
        single = device_laplacian(graph, fmt="dense")

        rng = np.random.default_rng(1)
        X = rng.normal(size=(sharded.m_padded, 16)).astype(np.float32)
        with mesh:
            got = np.asarray(jax.jit(sharded.matmul)(jnp.asarray(X)))
        Xs = np.zeros((single.m_padded, 16), np.float32)
        Xs[: single.m] = X[: single.m]
        want = np.asarray(single.matmul(jnp.asarray(Xs)))
        np.testing.assert_allclose(got[: single.m], want[: single.m], atol=1e-4)

    def test_cheby_conv_over_sharded_operator(self, graph):
        mesh = make_mesh(data=4, nodes=2)
        sharded = node_sharded_laplacian(graph, mesh)
        single = device_laplacian(graph, fmt="dense")

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(4, 48, 3)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(5, 3, 2)).astype(np.float32) * 0.1)
        with mesh:
            got = np.asarray(jax.jit(cheby_conv)(x, sharded, w))
        want = np.asarray(cheby_conv(x, single, w))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestDataParallelTraining:
    def test_dp_tp_train_step_matches_single_device(self, graph):
        """Gradient step on a (4 data x 2 nodes) mesh == single-device step."""
        import optax
        from cnn_graph_tpu.models import ResGNN
        from jax.sharding import NamedSharding, PartitionSpec as P

        rng = np.random.default_rng(3)
        x_np = rng.normal(size=(8, 48, 4)).astype(np.float32)
        y_np = rng.normal(size=(8, 48, 2)).astype(np.float32)

        def one_step(op, mesh=None):
            model = ResGNN(op, input_features=4, K=3, nfilter=8,
                           nres_layer_count=1)
            params = model.init(jax.random.PRNGKey(0))
            opt = optax.sgd(0.1)
            opt_state = opt.init(params)

            @jax.jit
            def step(params, opt_state, x, y):
                loss, grads = jax.value_and_grad(model.loss)(params, x, y)
                updates, opt_state = opt.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), loss

            x, y = jnp.asarray(x_np), jnp.asarray(y_np)
            if mesh is not None:
                x = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
                y = jax.device_put(y, NamedSharding(mesh, P("data", None, None)))
                params = jax.device_put(params, NamedSharding(mesh, P()))
                with mesh:
                    new_params, loss = step(params, opt_state, x, y)
            else:
                new_params, loss = step(params, opt_state, x, y)
            return jax.device_get((new_params, loss))

        mesh = make_mesh(data=4, nodes=2)
        sharded_params, sharded_loss = one_step(
            node_sharded_laplacian(graph, mesh), mesh
        )
        single_params, single_loss = one_step(device_laplacian(graph, fmt="dense"))

        np.testing.assert_allclose(sharded_loss, single_loss, atol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-4),
            sharded_params, single_params,
        )


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (8, 10)

    def test_dryrun_multichip(self, capsys):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
        assert "dryrun_multichip OK" in capsys.readouterr().out
