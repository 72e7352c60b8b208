"""Data pipeline tests: STL decomposition, HumanTraffic loaders (over
synthetic .mat files), harness, checkpointing."""

import os

import numpy as np
import pytest
import scipy.io

from cnn_graph_tpu.data.humantraffic import DAY, WEEK, HumanTraffic
from cnn_graph_tpu.data.stl import decompose
from cnn_graph_tpu.data.synthetic import synthetic_flow


@pytest.fixture(scope="module")
def flow_dir(tmp_path_factory):
    """Synthetic dataset directory shaped like the reference's .mat layout."""
    d = tmp_path_factory.mktemp("flow")
    in_m, out_m, edges = synthetic_flow(n_nodes=20, n_steps=1400, seed=0)
    scipy.io.savemat(d / "ln_data.mat", {"inmatrix": in_m, "outmatrix": out_m})
    scipy.io.savemat(d / "bj_data.mat", {"inmatrix": in_m, "outmatrix": out_m})
    scipy.io.savemat(d / "edge_matrix.mat", {"edge_matrix": edges})

    # Missing-marker variant: a stretch of -1s mid-series.
    in_bad = in_m.copy()
    in_bad[:, 700:705] = -1
    scipy.io.savemat(d / "bj_clus.mat", {"inmatrix": in_bad, "outmatrix": out_m})

    # Split (slow/fast) traffic summing to the totals.
    rng = np.random.default_rng(1)
    frac = rng.uniform(0.3, 0.7, in_m.shape)
    split_in = np.stack([in_m * frac, in_m * (1 - frac)], axis=2)
    frac = rng.uniform(0.3, 0.7, out_m.shape)
    split_out = np.stack([out_m * frac, out_m * (1 - frac)], axis=2)
    scipy.io.savemat(
        d / "split_lndata_street.mat",
        {
            "inmatrix": in_m, "outmatrix": out_m,
            "split_in_traffic": split_in, "split_out_traffic": split_out,
        },
    )
    scipy.io.savemat(d / "lndata_street.mat",
                     {"inmatrix": in_m, "outmatrix": out_m})
    return str(d), in_m, out_m


class TestSTL:
    def test_decomposition_sums(self):
        in_m, _, _ = synthetic_flow(n_nodes=1, n_steps=480, seed=0)
        stl = decompose(in_m[0], period=DAY)
        np.testing.assert_allclose(
            stl.trend + stl.seasonal + stl.resid, stl.observed, atol=1e-9
        )

    def test_captures_periodicity(self):
        t = np.arange(480)
        x = 10 * np.sin(2 * np.pi * t / DAY) + 0.01 * t
        stl = decompose(x, period=DAY)
        # Seasonal component carries the oscillation; residual is small.
        assert stl.seasonal.std() > 5
        assert np.abs(stl.resid[DAY:-DAY]).max() < 1.0

    def test_residual_matches_analytic_noise_band(self):
        """Quantified deviation bound vs the reference's LOESS STL
        (humantraffic.py:455-474 uses stldecompose): on a synthetic
        trend+seasonal+noise series the moving-average decomposition's
        residual must equal the injected noise up to the estimator's
        smoothing error ~ sigma*sqrt(1/period + 1/n_periods)."""
        rng = np.random.default_rng(0)
        n_per, sigma = 20, 1.0
        t = np.arange(n_per * DAY)
        trend = 0.02 * t + 5.0
        seasonal = 3.0 * np.sin(2 * np.pi * t / DAY) + np.cos(
            4 * np.pi * t / DAY
        )
        noise = sigma * rng.normal(size=len(t))
        stl = decompose(trend + seasonal + noise, period=DAY)

        interior = slice(DAY, -DAY)  # edge-extended trend excluded
        err = stl.resid[interior] - noise[interior]
        bound = 3.0 * sigma * np.sqrt(1.0 / DAY + 1.0 / n_per)
        assert np.std(err) < bound, (np.std(err), bound)
        # The residual is essentially the noise, not leaked structure.
        corr = np.corrcoef(stl.resid[interior], noise[interior])[0, 1]
        assert corr > 0.95
        # Trend/seasonal recovered within the same band.
        assert np.std(stl.trend[interior] - trend[interior]) < bound
        assert np.std(stl.seasonal[interior] - seasonal[interior]) < bound


class TestHumanTraffic:
    def test_load_ln_data_period_shapes(self, flow_dir):
        path, in_m, _ = flow_dir
        ht = HumanTraffic(path)
        tr, va, te, trl, val, tel, edges = ht.load_ln_data_period(
            seq_num=4, seq_num_period=3, seq_num_trend=1
        )
        M = in_m.shape[0]
        C = 2 * (4 + 3 + 1)
        assert tr.shape[1:] == (M, C)
        assert trl.shape[1:] == (M, 2)
        assert te.shape[0] == 168
        assert tel.shape[0] == 168
        assert edges.shape == (M, M)
        # 80/20 split of the rest.
        n_rest = tr.shape[0] + va.shape[0]
        assert tr.shape[0] == int(n_rest * 0.8)

    def test_window_alignment(self, flow_dir):
        # Sample i's label is the step right after its closeness window.
        path, in_m, out_m = flow_dir
        ht = HumanTraffic(path)
        seq = 4
        samples, labels = ht.make_windows(in_m, out_m, seq)
        np.testing.assert_allclose(labels[0][:, 0], in_m[:, seq])
        np.testing.assert_allclose(samples[0][:, :seq], in_m[:, :seq])
        np.testing.assert_allclose(samples[0][:, seq : 2 * seq], out_m[:, :seq])

    def test_period_window_centering(self, flow_dir):
        path, in_m, out_m = flow_dir
        ht = HumanTraffic(path)
        seq, seq_p = 4, 3
        samples, _ = ht.make_windows(in_m, out_m, seq, seq_period=seq_p)
        i = (DAY - seq) + seq_p // 2  # first sample index
        t = i + seq
        lo = (t - DAY) - seq_p // 2
        np.testing.assert_allclose(
            samples[0][:, 2 * seq : 2 * seq + seq_p], in_m[:, lo : lo + seq_p]
        )

    def test_normalization_roundtrip(self, flow_dir):
        path, in_m, out_m = flow_dir
        ht = HumanTraffic(path)
        a, b = ht.normalize(in_m, out_m)
        assert max(a.max(), b.max()) <= 1.0
        np.testing.assert_allclose(ht.reverse_normalize(a), in_m, atol=1e-9)

    def test_seasonal_normalize_bounded(self, flow_dir):
        path, in_m, out_m = flow_dir
        ht = HumanTraffic(path)
        a, b = ht.normalize_seasonal_decompose(in_m, out_m)
        assert 0 <= a.min() and a.max() <= 1.0

    def test_missing_value_filtering(self, flow_dir):
        path, in_m, _ = flow_dir
        ht = HumanTraffic(path)
        res = ht.load_bj_clus_data(seq_num=4)
        # Windows touching the -1 stretch (cols 700:705) are dropped...
        all_data = np.concatenate([res[0], res[1], res[2]])
        assert not np.any(np.isclose(all_data * ht.max_val, -1.0))
        # ...and only those: 5 missing steps kill seq+1+4 = 9 windows.
        n_total = in_m.shape[1] - 4
        assert all_data.shape[0] == n_total - 9

    def test_split_traffic_loader(self, flow_dir):
        path, in_m, _ = flow_dir
        ht = HumanTraffic(path)
        tr, va, te, trl, val, tel, edges = ht.load_split_ln_data(seq_num=3)
        M = in_m.shape[0]
        assert tr.shape[1:] == (M, 2 * 2 * 3)  # slow+fast x in+out x seq
        assert trl.shape[1:] == (M, 2)

    def test_load_data_threshold_binarizes(self, flow_dir):
        path, _, _ = flow_dir
        ht = HumanTraffic(path)
        res = ht.load_data(seq_num=3, edge_threshold=700)
        edges = res[-1]
        vals = np.unique(edges.toarray())
        assert set(vals).issubset({0.0, 1.0})

    def test_lstm_data_per_node(self, flow_dir):
        path, in_m, _ = flow_dir
        ht = HumanTraffic(path)
        coll = ht.load_lstm_data(seq_num=5, neighbor_num=0,
                                 datafile="ln_data.mat")
        assert len(coll) == in_m.shape[0]
        assert coll[0]["train_data"].shape[1] == 10  # 2 * seq
        assert coll[0]["train_labels"].shape[1] == 2

    def test_unisolate_drops_nodes(self, flow_dir):
        path, in_m, _ = flow_dir
        # Zero out one node's edges to make it isolated.
        edges = scipy.io.loadmat(os.path.join(path, "edge_matrix.mat"))[
            "edge_matrix"
        ].copy()
        edges[0, :] = 0
        edges[:, 0] = 0
        sub = os.path.join(path, "iso")
        os.makedirs(sub, exist_ok=True)
        scipy.io.savemat(os.path.join(sub, "edge_matrix.mat"),
                         {"edge_matrix": edges})
        ln = scipy.io.loadmat(os.path.join(path, "ln_data.mat"))
        scipy.io.savemat(os.path.join(sub, "ln_data.mat"),
                         {"inmatrix": ln["inmatrix"],
                          "outmatrix": ln["outmatrix"]})
        ht = HumanTraffic(sub)
        res = ht.load_unisolate_data(seq_num=3)
        # Node 0 (and any node isolated in the random graph) is dropped.
        n_kept = int(np.sum(np.asarray(edges + edges.T).sum(axis=1) != 0))
        assert res[0].shape[1] == n_kept < in_m.shape[0]
        assert res[-1].shape == (n_kept, n_kept)
        # No isolated nodes remain.
        assert np.all(np.asarray(res[-1].sum(axis=1)).ravel() != 0)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import optax
        from cnn_graph_tpu.train.checkpoint import CheckpointManager

        params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        mngr = CheckpointManager(str(tmp_path / "ckpt"))
        assert mngr.save(10, params, opt_state)
        mngr.wait()
        assert mngr.latest_step() == 10

        like = jax.tree.map(jnp.zeros_like, params)
        os_like = jax.tree.map(jnp.zeros_like, opt_state)
        p2, s2, step = mngr.restore(like, os_like)
        assert step == 10
        np.testing.assert_allclose(p2["w"], params["w"])
        jax.tree.map(np.testing.assert_allclose, s2, opt_state)
        mngr.close()


class TestHarness:
    def test_baseline_runs(self):
        from cnn_graph_tpu.utils.harness import baseline

        rng = np.random.default_rng(0)
        X = np.abs(rng.normal(size=(120, 10)))
        y = (X[:, 0] > X[:, 1]).astype(int)
        rows = baseline(X[:80], y[:80], X[80:], y[80:], omit=(3,))
        assert len(rows) == 6
        assert all(r["test_accuracy"] > 40 for r in rows)

    def test_grid_search_isolates_failures(self, capsys):
        from cnn_graph_tpu.utils.harness import grid_search

        class DummyTrainer:
            def __init__(self, ok):
                self.ok = ok

            def fit(self, *a):
                if not self.ok:
                    raise RuntimeError("boom")
                return [1], [1], 0.1

            def evaluate(self, *a):
                return "ok", {"main": 1.0}

        results = grid_search(
            {"ok": [True, False]},
            lambda ok: DummyTrainer(ok),
            None, None, None, None, None, None,
        )
        assert results[0][1] is not None
        assert results[1][1] is None
