"""Int8 twins for the DENSE and BSR formats + the grouped-row BSR kernel.

VERDICT round-4 missing #2: the reference's flagship classification
topology (20NEWS embedding-kNN, lib/utils.py:127-150 + 20news.ipynb
cell 22) auto-serves as a DENSE operator (DESIGN.md §17) and had no
quantized path; scattered graphs above the dense budget land on BSR.
These tests cover both twins (XLA fallback + Pallas interpret mode,
bit-exact integer arithmetic) and the grouped-row BSR kernel that
amortizes the per-block fixed cost (VERDICT round-4 next-step #5).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_graph_tpu.graphs import construction as gc
from cnn_graph_tpu.ops import (
    cheby_conv,
    cheby_finals,
    device_laplacian,
    quantize_block_sparse,
    quantize_dense,
)
from cnn_graph_tpu.ops.pallas_spmm import (
    _grouped_call,
    bsr_call_quant,
    bsr_cheby_hop,
)


@pytest.fixture(scope="module")
def scattered_graph():
    """A small embedding-kNN-style scattered graph (the 20NEWS topology
    shape in miniature): random points in 8-D, k=10, RCM-ordered — wide
    band, substantial block occupancy."""
    rng = np.random.default_rng(0)
    z = rng.normal(size=(900, 8)).astype(np.float32)
    dist, idx = gc.knn(z, k=10, algorithm="auto")
    W = gc.adjacency(dist, idx)
    perm = gc.bandwidth_reducing_permutation(W)
    W = W[perm][:, perm].tocsr()
    return gc.laplacian(W, normalized=True)


@pytest.fixture(scope="module")
def bsr_pair(scattered_graph):
    op_xla = device_laplacian(scattered_graph, fmt="bsr", block_size=128,
                              use_pallas=False)
    op_pl = device_laplacian(scattered_graph, fmt="bsr", block_size=128,
                             use_pallas=True, col_stream=False)
    return op_xla, op_pl


@pytest.fixture(scope="module")
def colstream_pair(scattered_graph):
    op_xla = device_laplacian(scattered_graph, fmt="bsr", block_size=128,
                              use_pallas=False)
    op_cs = device_laplacian(scattered_graph, fmt="bsr", block_size=128,
                             use_pallas=True, col_stream=True)
    return op_xla, op_cs


class TestGroupedBsrKernel:
    def test_grouping_metadata(self, bsr_pair):
        _, op_pl = bsr_pair
        assert op_pl.rows_per_step > 1, "grouping should engage here"
        assert op_pl.group_max > 0
        # Slab zero-pad present for the static overrun.
        nb = int(op_pl.block_cols.shape[0])
        assert op_pl.blocks.shape[0] == nb + op_pl.group_max
        assert np.all(np.asarray(op_pl.blocks)[nb:] == 0)
        # rowptr covers the (possibly padded) row count.
        assert op_pl.block_rowptr.shape[0] == op_pl.m_padded // 128 + 1

    def test_spmm_matches_xla(self, scattered_graph, bsr_pair):
        op_xla, op_pl = bsr_pair
        rng = np.random.default_rng(1)
        X = rng.normal(size=(op_pl.m_padded, 200)).astype(np.float32)
        got = np.asarray(_grouped_call(op_pl, jnp.asarray(X),
                                       interpret=True))
        assert got.shape == (op_pl.m_padded, 200)
        want = np.asarray(op_xla.matmul(jnp.asarray(X[: op_xla.m_padded])))
        np.testing.assert_allclose(got[: op_xla.m_padded], want, atol=1e-4)
        Lr = gc.rescale_laplacian(scattered_graph, 2.0)
        np.testing.assert_allclose(got[: op_pl.m], Lr @ X[: op_pl.m],
                                   atol=1e-4)

    def test_fused_hop(self, bsr_pair):
        op_xla, op_pl = bsr_pair
        rng = np.random.default_rng(2)
        X = jnp.asarray(rng.normal(size=(op_pl.m_padded, 128)),
                        jnp.float32)
        X0 = jnp.asarray(rng.normal(size=X.shape), jnp.float32)
        got = np.asarray(_grouped_call(op_pl, X, X0, interpret=True))
        want = 2.0 * np.asarray(_grouped_call(op_pl, X, interpret=True)) \
            - np.asarray(X0)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_hop_gradients(self, bsr_pair):
        """bsr_cheby_hop's symmetric-adjoint VJP vs autodiff through the
        XLA path."""
        op_xla, op_pl = bsr_pair
        rng = np.random.default_rng(3)
        X = jnp.asarray(rng.normal(size=(op_pl.m_padded, 128)),
                        jnp.float32)
        X0 = jnp.asarray(rng.normal(size=X.shape), jnp.float32)

        def f_kernel(x1, x0):
            return jnp.sum(bsr_cheby_hop(op_pl, x1, x0, 512, True) ** 2)

        def f_xla(x1, x0):
            m = op_xla.m_padded
            y = 2.0 * op_xla.matmul(x1[:m]) - x0[:m]
            return jnp.sum(y ** 2)

        g1 = jax.grad(f_kernel, argnums=(0, 1))(X, X0)
        g2 = jax.grad(f_xla, argnums=(0, 1))(X, X0)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a)[: op_xla.m_padded], np.asarray(b),
                atol=1e-3, rtol=1e-4,
            )


class TestColumnStreamedBsr:
    """The scattered-graph kernel: blocks ordered (column, row) within
    each G-row group; each distinct column's x tile fetched once per
    group (x traffic O(groups x cols) instead of O(blocks) — the
    dominant HBM cost of scattered BSR, DESIGN.md §20)."""

    def test_metadata(self, colstream_pair):
        from cnn_graph_tpu.ops.laplacian import COLSTREAM_CHUNK

        _, op = colstream_pair
        assert op.col_stream and op.rows_per_step > 1
        nb = int(op.block_cols.shape[0])
        assert op.blocks.shape[0] == nb + COLSTREAM_CHUNK
        # Within each group: columns non-decreasing, meta consistent,
        # run lengths multiples of the kernel unroll.
        from cnn_graph_tpu.ops.laplacian import COLSTREAM_UNROLL

        gp = np.asarray(op.cs_groupptr)
        cols = np.asarray(op.block_cols)
        rows = np.asarray(op.block_rows)
        meta = np.asarray(op.cs_meta)
        G = op.rows_per_step
        assert np.all(np.diff(gp) % COLSTREAM_UNROLL == 0)
        for s in range(len(gp) - 1):
            lo, hi = gp[s], gp[s + 1]
            if hi <= lo:
                continue
            assert np.all(np.diff(cols[lo:hi]) >= 0)
            assert np.all((meta[lo:hi] >> 16) == rows[lo:hi] - s * G)

    def test_spmm_hop_and_quant(self, scattered_graph, colstream_pair):
        import dataclasses

        from cnn_graph_tpu.ops.pallas_spmm import _colstream_call

        op_xla, op = colstream_pair
        rng = np.random.default_rng(11)
        X = jnp.asarray(rng.normal(size=(op.m_padded, 200)), jnp.float32)
        got = np.asarray(_colstream_call(op, X, interpret=True))
        mk = op_xla.m_padded
        want = np.asarray(op_xla.matmul(X[:mk]))
        np.testing.assert_allclose(got[:mk], want, atol=1e-4)

        X0 = jnp.asarray(rng.normal(size=X.shape), jnp.float32)
        goth = np.asarray(_colstream_call(op, X, X0, interpret=True))
        np.testing.assert_allclose(goth, 2 * got - np.asarray(X0),
                                   atol=1e-4)

        q = quantize_block_sparse(op, sample_x=3.0)
        q_fb = dataclasses.replace(q, use_pallas=False)
        xq, x0q = q.quantize(X), q.quantize(X0)
        gq = np.asarray(_colstream_call(q, xq, x0q, interpret=True,
                                        band_scale=q.block_scale))
        wq = np.asarray(q_fb.cheby_hop_q(xq, x0q))
        assert np.array_equal(gq, wq)

    def test_hop_gradients(self, colstream_pair):
        from cnn_graph_tpu.ops.pallas_spmm import bsr_cheby_hop

        op_xla, op = colstream_pair
        rng = np.random.default_rng(12)
        X = jnp.asarray(rng.normal(size=(op.m_padded, 128)), jnp.float32)
        X0 = jnp.asarray(rng.normal(size=X.shape), jnp.float32)

        def f_kernel(x1, x0):
            return jnp.sum(bsr_cheby_hop(op, x1, x0, 512, True) ** 2)

        def f_xla(x1, x0):
            m = op_xla.m_padded
            y = 2.0 * op_xla.matmul(x1[:m]) - x0[:m]
            return jnp.sum(y ** 2)

        g1 = jax.grad(f_kernel, argnums=(0, 1))(X, X0)
        g2 = jax.grad(f_xla, argnums=(0, 1))(X, X0)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a)[: op_xla.m_padded], np.asarray(b),
                atol=1e-3, rtol=1e-4,
            )


class TestQuantBlockSparse:
    def test_kernel_bit_exact_with_xla_fallback(self, bsr_pair):
        _, op_pl = bsr_pair
        q = quantize_block_sparse(op_pl, sample_x=3.0)
        q_fb = dataclasses.replace(q, use_pallas=False)
        rng = np.random.default_rng(4)
        X = jnp.asarray(rng.normal(size=(q.m_padded, 200)), jnp.float32)
        xq = q.quantize(X)
        x0q = q.quantize(jnp.asarray(rng.normal(size=X.shape),
                                     jnp.float32))
        got = np.asarray(bsr_call_quant(q, xq, interpret=True))
        want = np.asarray(q_fb.spmm_q(xq))
        assert np.array_equal(got, want)
        goth = np.asarray(bsr_call_quant(q, xq, x0q, interpret=True))
        wanth = np.asarray(q_fb.cheby_hop_q(xq, x0q))
        assert np.array_equal(goth, wanth)

    def test_conv_protocol_tracks_f32(self, bsr_pair):
        op_xla, op_pl = bsr_pair
        q = dataclasses.replace(quantize_block_sparse(op_pl, sample_x=3.0),
                                use_pallas=False)
        rng = np.random.default_rng(5)
        K, Fin, Fout = 5, 8, 6
        x = jnp.asarray(rng.normal(size=(2, q.m, Fin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(K, Fin, Fout)) * 0.2, jnp.float32)
        yq = np.asarray(cheby_conv(x, q, w))
        yf = np.asarray(cheby_conv(x, op_xla, w))
        rel = np.abs(yq - yf).max() / (np.abs(yf).max() + 1e-9)
        assert rel < 0.08, rel

    def test_chain_protocol(self, bsr_pair):
        """cheby_finals dispatches on cheby_hop_q for the BSR twin."""
        _, op_pl = bsr_pair
        q = dataclasses.replace(quantize_block_sparse(op_pl, sample_x=3.0),
                                use_pallas=False)
        rng = np.random.default_rng(6)
        X = jnp.asarray(rng.normal(size=(q.m_padded, 128)), jnp.float32)
        out = cheby_finals(q, q.quantize(X), 6)
        assert out.dtype == jnp.int8
        assert np.isfinite(np.asarray(q.dequantize(out))).all()


class TestQuantDense:
    def test_float_view_and_conv(self, scattered_graph):
        op = device_laplacian(scattered_graph, fmt="dense")
        q = quantize_dense(op, sample_x=3.0)
        rng = np.random.default_rng(7)
        X = jnp.asarray(rng.normal(size=(op.m_padded, 64)), jnp.float32)
        f32 = np.asarray(op.matmul(X))
        qv = np.asarray(q.matmul(X))
        rel = np.abs(qv - f32).max() / (np.abs(f32).max() + 1e-9)
        assert rel < 0.05, rel

        K, Fin, Fout = 5, 8, 6
        x = jnp.asarray(rng.normal(size=(2, op.m, Fin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(K, Fin, Fout)) * 0.2, jnp.float32)
        yq = np.asarray(cheby_conv(x, q, w))
        yf = np.asarray(cheby_conv(x, op, w))
        rel = np.abs(yq - yf).max() / (np.abs(yf).max() + 1e-9)
        assert rel < 0.08, rel

    def test_matches_bsr_twin_semantics(self, scattered_graph, bsr_pair):
        """Dense and BSR twins quantize the same matrix with the same
        scale recipe — their int8 chains must agree closely (they differ
        only in which structural zeros are materialized)."""
        op_xla, _ = bsr_pair
        opd = device_laplacian(scattered_graph, fmt="dense")
        qd = quantize_dense(opd, sample_x=3.0)
        qb = dataclasses.replace(quantize_block_sparse(op_xla,
                                                       sample_x=3.0),
                                 use_pallas=False)
        assert abs(qd.mat_scale - qb.block_scale) < 1e-12
        rng = np.random.default_rng(8)
        X = jnp.asarray(rng.normal(size=(qb.m_padded, 64)), jnp.float32)
        xq = qb.quantize(X)
        a = np.asarray(qd.spmm_q(xq[: qd.m_padded]))
        b = np.asarray(qb.spmm_q(xq))
        assert np.array_equal(a[: qd.m], b[: qd.m])


class TestServingEntryPoint:
    def test_quantize_model_operators_covers_dense_and_bsr(
            self, scattered_graph):
        from cnn_graph_tpu.models import NodeClassifier
        from cnn_graph_tpu.models.common import quantize_model_operators
        from cnn_graph_tpu.ops.laplacian import (
            QuantBlockSparseLaplacian,
            QuantDenseLaplacian,
        )

        for fmt, twin in (("dense", QuantDenseLaplacian),
                          ("bsr", QuantBlockSparseLaplacian)):
            op = device_laplacian(scattered_graph, fmt=fmt,
                                  use_pallas=False)
            model = NodeClassifier(op, input_features=8, num_classes=4,
                                   hidden=[], K=5)
            qm = quantize_model_operators(model, sample_x=3.0)
            assert isinstance(qm.op, twin), (fmt, type(qm.op))
            rng = np.random.default_rng(9)
            x = jnp.asarray(rng.normal(size=(op.m, 8)), jnp.float32)
            params = model.init(jax.random.PRNGKey(0))
            lf = np.asarray(model.apply(params, x))
            lq = np.asarray(qm.apply(params, x))
            agree = (lf.argmax(1) == lq.argmax(1)).mean()
            assert agree > 0.95, (fmt, agree)

    def test_auto_dense_scattered_graph_serves_quantized(
            self, scattered_graph):
        """The 20NEWS-shape story end to end: fmt='auto' on a block-dense
        scattered graph picks DENSE (DESIGN.md §17), and the serving
        entry point now quantizes it instead of passing it through."""
        from cnn_graph_tpu.models import NodeClassifier
        from cnn_graph_tpu.models.common import quantize_model_operators
        from cnn_graph_tpu.ops.laplacian import (
            DenseLaplacian,
            QuantDenseLaplacian,
        )

        op = device_laplacian(scattered_graph, fmt="auto",
                              dense_threshold=256)
        if not isinstance(op, DenseLaplacian):
            pytest.skip("auto did not pick dense for this fixture")
        model = NodeClassifier(op, input_features=8, num_classes=4,
                               hidden=[], K=5)
        qm = quantize_model_operators(model, sample_x=3.0)
        assert isinstance(qm.op, QuantDenseLaplacian)
