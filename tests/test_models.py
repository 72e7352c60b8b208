"""Model tests: shapes, gradients, loss semantics, end-to-end training on
the usage.ipynb synthetic scenario (Milestone A)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_graph_tpu.data.synthetic import community_classification
from cnn_graph_tpu.graphs import construction as gc
from cnn_graph_tpu.models import (
    ChebNet,
    GConvForecaster,
    GConvLSTMCell,
    ResGNN,
    bspline_basis,
    FORECAST_VARIANTS,
)
from cnn_graph_tpu.ops import device_laplacian
from cnn_graph_tpu.train import TrainConfig, Trainer


@pytest.fixture(scope="module")
def usage_data():
    return community_classification(n=3000, d=100, seed=0)


@pytest.fixture(scope="module")
def usage_ops(usage_data):
    _, graphs, _ = usage_data
    Ls = [gc.laplacian(g, normalized=True) for g in graphs]
    return [device_laplacian(L, fmt="dense") for L in Ls], Ls


class TestChebNet:
    def test_forward_shapes(self, usage_data, usage_ops):
        splits, _, _ = usage_data
        ops, _ = usage_ops
        model = ChebNet(ops, F=[8, 16], K=[5, 5], p=[4, 2], M=[64, 3])
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(splits["train_data"][:10])
        logits = model.apply(params, x)
        assert logits.shape == (10, 3)

    def test_laplacian_level_selection(self, usage_ops):
        ops, _ = usage_ops
        model = ChebNet(ops, F=[8, 16], K=[5, 5], p=[4, 2], M=[3])
        # Layer 0 uses level 0; layer 1 uses level log2(4) = 2.
        assert model.operators[0].m == ops[0].m
        assert model.operators[1].m == ops[2].m

    def test_loss_decreases_one_epoch(self, usage_data, usage_ops):
        splits, _, _ = usage_data
        ops, _ = usage_ops
        model = ChebNet(ops, F=[8], K=[5], p=[2], M=[3])
        params = model.init(jax.random.PRNGKey(1))
        x = jnp.asarray(splits["train_data"][:100])
        y = jnp.asarray(splits["train_labels"][:100])
        l0 = model.loss(params, x, y)
        grads = jax.grad(model.loss)(params, x, y)
        params2 = jax.tree.map(lambda p, g: p - 0.05 * g, params, grads)
        l1 = model.loss(params2, x, y)
        assert float(l1) < float(l0)

    def test_regularization_increases_loss(self, usage_data, usage_ops):
        splits, _, _ = usage_data
        ops, _ = usage_ops
        x = jnp.asarray(splits["train_data"][:8])
        y = jnp.asarray(splits["train_labels"][:8])
        m0 = ChebNet(ops, F=[4], K=[3], p=[1], M=[3], regularization=0.0)
        m1 = ChebNet(ops, F=[4], K=[3], p=[1], M=[3], regularization=1.0)
        p = m0.init(jax.random.PRNGKey(2))
        assert float(m1.loss(p, x, y)) > float(m0.loss(p, x, y))

    def test_fourier_filter_forward(self, usage_data, usage_ops):
        splits, _, _ = usage_data
        ops, Ls = usage_ops
        model = ChebNet(
            ops, F=[4], K=[5], p=[2], M=[3], laplacians=Ls, filter="fourier"
        )
        params = model.init(jax.random.PRNGKey(3))
        logits = model.apply(params, jnp.asarray(splits["train_data"][:4]))
        assert logits.shape == (4, 3)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_spline_filter_forward(self, usage_data, usage_ops):
        splits, _, _ = usage_data
        ops, Ls = usage_ops
        model = ChebNet(
            ops, F=[4], K=[6], p=[2], M=[3], laplacians=Ls, filter="spline"
        )
        params = model.init(jax.random.PRNGKey(4))
        # Spline weights are K control points, not M per-node weights.
        assert params["gconv"][0]["w"].shape == (6, 4, 1)
        logits = model.apply(params, jnp.asarray(splits["train_data"][:4]))
        assert logits.shape == (4, 3)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_lanczos_filter_forward_and_grad(self, usage_data, usage_ops):
        """filter='lanczos' resolves the reference's last named filter
        string (lib/models.py:40); weights tap a per-signal Krylov basis
        like Chebyshev taps."""
        splits, _, _ = usage_data
        ops, _ = usage_ops
        model = ChebNet(ops, F=[4], K=[5], p=[2], M=[3], filter="lanczos")
        params = model.init(jax.random.PRNGKey(6))
        assert params["gconv"][0]["w"].shape == (5, 1, 4)
        x = jnp.asarray(splits["train_data"][:4])
        logits = jax.jit(model.apply)(params, x)
        assert logits.shape == (4, 3)
        assert bool(jnp.all(jnp.isfinite(logits)))
        y = jnp.asarray(splits["train_labels"][:4])
        g = jax.grad(model.loss)(params, x, y)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


class TestBsplineBasis:
    def test_partition_of_unity(self):
        x = np.linspace(0, 2, 50)
        B = bspline_basis(8, x, degree=3)
        assert B.shape == (50, 8)
        np.testing.assert_allclose(B.sum(axis=1), 1.0, atol=1e-6)
        assert B.min() >= 0


class TestResGNN:
    @pytest.fixture(scope="class")
    def flow_setup(self):
        rng = np.random.default_rng(0)
        z = rng.uniform(size=(50, 2)).astype(np.float32)
        W = gc.knn_graph(z, k=5)
        L = gc.laplacian(W, normalized=True)
        return device_laplacian(L, fmt="dense")

    def test_forward_and_loss(self, flow_setup):
        op = flow_setup
        model = ResGNN(op, input_features=12, K=2, nfilter=8, nres_layer_count=2)
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.ones((4, 50, 12))
        out = model.apply(params, x)
        assert out.shape == (4, 50, 2)
        loss = model.loss(params, x, jnp.zeros((4, 50, 2)))
        assert float(loss) > 0

    def test_residual_skip_matters(self, flow_setup):
        op = flow_setup
        x = jnp.ones((2, 50, 4))
        m_res = ResGNN(op, 4, nfilter=8, nres_layer_count=2, residual=True)
        m_plain = ResGNN(op, 4, nfilter=8, nres_layer_count=2, residual=False)
        p = m_res.init(jax.random.PRNGKey(1))
        a = m_res.apply(p, x)
        b = m_plain.apply(p, x)
        assert float(jnp.abs(a - b).max()) > 1e-6

    def test_stacked_towers(self, flow_setup):
        op = flow_setup
        model = ResGNN(
            op, input_features=16, nfilter=8, nres_layer_count=1,
            stack_splits=[(0, 12), (12, 16)],
        )
        params = model.init(jax.random.PRNGKey(2))
        assert len(params["towers"]) == 2
        out = model.apply(params, jnp.ones((2, 50, 16)))
        assert out.shape == (2, 50, 2)


class TestGConvLSTM:
    @pytest.fixture(scope="class")
    def cell_setup(self):
        rng = np.random.default_rng(1)
        z = rng.uniform(size=(30, 2)).astype(np.float32)
        W = gc.knn_graph(z, k=4)
        L = gc.laplacian(W, normalized=True)
        return device_laplacian(L, fmt="dense"), L

    def test_cell_step(self, cell_setup):
        op, _ = cell_setup
        cell = GConvLSTMCell(op, num_units=8, feat_in=2, K=3)
        params = cell.init(jax.random.PRNGKey(0))
        carry = cell.zero_state(4)
        x = jnp.ones((4, 30, 2))
        (c, h), out = cell.step(params, carry, x)
        assert c.shape == h.shape == out.shape == (4, 30, 8)
        # Gates bounded: |h| <= 1 since o, tanh(c) in (-1, 1).
        assert float(jnp.abs(h).max()) <= 1.0

    def test_fourier_cell(self, cell_setup):
        op, L = cell_setup
        _, U = gc.fourier(L)
        cell = GConvLSTMCell(
            op, num_units=4, feat_in=2, filter_type="fourier_conv",
            fourier_u=jnp.asarray(U, jnp.float32),
        )
        params = cell.init(jax.random.PRNGKey(1))
        assert params["Wzx"].shape == (30, 4, 2)
        (c, h), out = cell.step(params, cell.zero_state(2), jnp.ones((2, 30, 2)))
        assert out.shape == (2, 30, 4)


class TestForecaster:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(2)
        z = rng.uniform(size=(30, 2)).astype(np.float32)
        W = gc.knn_graph(z, k=4)
        L = gc.laplacian(W, normalized=True)
        return device_laplacian(L, fmt="dense")

    @pytest.mark.parametrize("variant", FORECAST_VARIANTS)
    def test_all_variants_forward(self, setup, variant):
        op = setup
        Tc, Tp, Tt = 3, 2, 1
        if variant == "glstm_gconv_split":
            C = 4 * Tc  # two closeness windows
            model = GConvForecaster(op, Tc, Tc, 0, variant=variant,
                                    num_hidden=4, num_hidden_conv=4,
                                    conv_layer_num=1)
        elif variant in ("glstm", "glstm_period_no_expand", "gconv",
                         "gconv_period_no_expand", "glstm_gconv",
                         "glstm_gconv_no_expand"):
            C = 2 * Tc
            model = GConvForecaster(op, Tc, 0, 0, variant=variant,
                                    num_hidden=4, num_hidden_conv=4,
                                    conv_layer_num=1)
        else:
            C = 2 * (Tc + Tp + Tt)
            model = GConvForecaster(op, Tc, Tp, Tt, variant=variant,
                                    num_hidden=4, num_hidden_conv=4,
                                    conv_layer_num=1)
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 30, C)).astype(np.float32)
        )
        out = model.apply(params, x, train=True, rng=jax.random.PRNGKey(1))
        assert out.shape == (2, 30, 2), variant
        assert bool(jnp.all(jnp.isfinite(out))), variant

    def test_loss_grad(self, setup):
        op = setup
        model = GConvForecaster(op, 3, 0, 0, variant="glstm", num_hidden=4)
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.ones((2, 30, 6))
        y = jnp.ones((2, 30, 2)) * 0.5
        g = jax.grad(model.loss)(params, x, y)
        flat = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in flat)
        assert any(float(jnp.abs(l).max()) > 0 for l in flat)

    def test_to_string(self, setup):
        model = GConvForecaster(setup, 3, 2, 1, variant="glstm")
        s = model.to_string()
        assert "glstm" in s and "|" in s


class TestTrainerEndToEnd:
    """Milestone A: the usage.ipynb scenario end-to-end on CPU."""

    def test_usage_scenario(self, usage_data, usage_ops):
        # Accuracy bar uses a pool-free config: the usage.ipynb synthetic
        # target (X @ w, random-sign w) is anti-smooth on the feature graph,
        # so ANY pooling caps even logistic regression at ~57% — measured,
        # not a framework property.  Graph convs + fc must beat 75% here.
        splits, _, _ = usage_data
        ops, _ = usage_ops
        model = ChebNet(
            ops, F=[16, 16], K=[10, 10], p=[1, 1], M=[64, 3],
            dropout=0.5, regularization=5e-4,
        )
        cfg = TrainConfig(
            num_epochs=30, learning_rate=2e-3, decay_rate=0.95,
            decay_steps=120, batch_size=100, eval_frequency=90, seed=2017,
        )
        trainer = Trainer(model, cfg, task="classification")
        hist, losses, t_step = trainer.fit(
            splits["train_data"], splits["train_labels"],
            splits["val_data"], splits["val_labels"], verbose=False,
        )
        string, metrics = trainer.evaluate(
            splits["test_data"], splits["test_labels"]
        )
        assert metrics["accuracy"] > 75.0, (string, hist)
        assert t_step > 0
        assert len(hist) >= 2

    def test_usage_scenario_pooled_architecture(self, usage_data, usage_ops):
        # The full conv->pool->fc pipeline (usage.ipynb cell 13 shape) runs
        # end-to-end and beats chance; see the note above on why the
        # synthetic target caps pooled accuracy.
        splits, _, _ = usage_data
        ops, _ = usage_ops
        model = ChebNet(
            ops, F=[16, 16], K=[10, 10], p=[4, 2], M=[64, 3],
            pool="average", dropout=0.5,
        )
        cfg = TrainConfig(
            num_epochs=10, learning_rate=2e-3, decay_rate=0.95,
            decay_steps=120, batch_size=100, eval_frequency=60, seed=2017,
        )
        trainer = Trainer(model, cfg, task="classification")
        trainer.fit(
            splits["train_data"], splits["train_labels"],
            splits["val_data"], splits["val_labels"], verbose=False,
        )
        _, metrics = trainer.evaluate(splits["test_data"], splits["test_labels"])
        assert metrics["accuracy"] > 42.0  # chance is ~34/33/33 + margin

    def test_regression_task_relu_head(self, usage_ops):
        ops, _ = usage_ops
        m = ops[0].m
        model = ResGNN(ops[0], input_features=2, nfilter=4, nres_layer_count=1)
        cfg = TrainConfig(num_epochs=1, learning_rate=0.01, batch_size=8,
                          eval_frequency=5, decay_steps=10)
        trainer = Trainer(model, cfg, task="regression")
        rng = np.random.default_rng(0)
        data = rng.normal(size=(16, m, 2)).astype(np.float32)
        labels = np.abs(rng.normal(size=(16, m, 2))).astype(np.float32)
        trainer.fit(data, labels, data, labels, verbose=False)
        preds = trainer.predict(data)
        assert preds.shape == labels.shape
        assert preds.min() >= 0.0  # ReLU prediction head (graph_model.py:241)


class TestResGNNFourier:
    def test_fourier_filter_resgnn(self):
        from cnn_graph_tpu.graphs import construction as gcc

        rng = np.random.default_rng(9)
        z = rng.uniform(size=(40, 2)).astype(np.float32)
        W = gcc.knn_graph(z, k=4)
        L = gcc.laplacian(W, normalized=True)
        _, U = gcc.fourier(L)
        op = device_laplacian(L, fmt="dense")
        model = ResGNN(op, input_features=6, nfilter=8, nres_layer_count=1,
                       filter="fourier", fourier_u=jnp.asarray(U, jnp.float32))
        params = model.init(jax.random.PRNGKey(0))
        assert params["tower"]["conv_init"].shape == (40, 8, 6)
        out = model.apply(params, jnp.ones((2, 40, 6)))
        assert out.shape == (2, 40, 2)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestForecasterWindowValidation:
    """Mismatched variant/window configs must fail at construction with a
    clear message, not as a reshape error deep inside apply."""

    def _op(self):
        rng = np.random.default_rng(0)
        z = rng.uniform(size=(24, 2)).astype(np.float32)
        W = gc.knn_graph(z, k=4)
        return device_laplacian(gc.laplacian(W, normalized=True),
                                fmt="dense")

    def test_full_window_glstm_rejects_indivisible(self):
        from cnn_graph_tpu.models import GConvForecaster

        with pytest.raises(AssertionError, match="divisible"):
            GConvForecaster(self._op(), seq_closeness=3, seq_period=1,
                            seq_trend=1, variant="glstm")

    def test_split_variant_rejects_wrong_total(self):
        from cnn_graph_tpu.models import GConvForecaster

        with pytest.raises(AssertionError, match="closeness-sized"):
            GConvForecaster(self._op(), seq_closeness=3, seq_period=2,
                            seq_trend=2, variant="glstm_gconv_split")

    def test_period_expand_rejects_missing_timescales(self):
        from cnn_graph_tpu.models import GConvForecaster

        with pytest.raises(AssertionError, match="period"):
            GConvForecaster(self._op(), seq_closeness=4,
                            variant="glstm_period_expand")


class TestPerNodeLSTM:
    """Graph-free per-node LSTM baseline (models/node_lstm.py), the
    reference's load_lstm_data consumer (humantraffic.py:354-383)."""

    @pytest.fixture(scope="class")
    def lstm_data(self):
        from cnn_graph_tpu.data.humantraffic import HumanTraffic
        from cnn_graph_tpu.data.synthetic import synthetic_flow
        from cnn_graph_tpu.models import stack_lstm_collection
        import scipy.io
        import tempfile
        import os

        d = tempfile.mkdtemp(prefix="lstm_")
        in_m, out_m, _ = synthetic_flow(n_nodes=12, n_steps=300, seed=3)
        scipy.io.savemat(os.path.join(d, "ln_data.mat"),
                         {"inmatrix": in_m, "outmatrix": out_m})
        ht = HumanTraffic(d)
        coll = ht.load_lstm_data(4, 0, "ln_data.mat")
        assert len(coll) == 12
        return stack_lstm_collection(coll)

    def test_shapes_and_forward(self, lstm_data):
        from cnn_graph_tpu.models import PerNodeLSTM

        d = lstm_data
        S, n, twoseq = d["train_data"].shape
        assert twoseq == 8 and d["train_labels"].shape == (S, n, 2)
        model = PerNodeLSTM(n_nodes=n, seq=4, num_hidden=8)
        params = model.init(jax.random.PRNGKey(0))
        out = model.apply(params, jnp.asarray(d["train_data"][:5]))
        assert out.shape == (5, n, 2)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_nodes_are_independent(self, lstm_data):
        """No graph: perturbing node j's inputs must change ONLY node j's
        predictions (the property that makes this the baseline the graph
        models are judged against)."""
        from cnn_graph_tpu.models import PerNodeLSTM

        d = lstm_data
        n = d["train_data"].shape[1]
        model = PerNodeLSTM(n_nodes=n, seq=4, num_hidden=8)
        params = model.init(jax.random.PRNGKey(1))
        x = jnp.asarray(d["train_data"][:3])
        base = np.asarray(model.apply(params, x))
        x2 = x.at[:, 5, :].add(1.0)
        pert = np.asarray(model.apply(params, x2))
        changed = np.abs(pert - base).max(axis=(0, 2))
        assert changed[5] > 1e-4
        others = np.delete(changed, 5)
        assert others.max() == 0.0

    def test_trains_below_variance(self, lstm_data):
        from cnn_graph_tpu.models import PerNodeLSTM
        from cnn_graph_tpu.train import TrainConfig, Trainer

        d = lstm_data
        n = d["train_data"].shape[1]
        model = PerNodeLSTM(n_nodes=n, seq=4, num_hidden=16)
        cfg = TrainConfig(num_epochs=30, learning_rate=5e-3, batch_size=64,
                          eval_frequency=200, seed=0, decay_rate=1.0)
        trainer = Trainer(model, cfg, task="regression")
        trainer.fit(d["train_data"], d["train_labels"],
                    d["test_data"], d["test_labels"], verbose=False)
        _, metrics = trainer.evaluate(d["test_data"], d["test_labels"])
        # Beats predicting the per-node mean (variance) by a clear margin.
        var = float(np.var(d["test_labels"]))
        assert metrics["mse"] < 0.5 * var, (metrics["mse"], var)
