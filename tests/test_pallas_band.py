"""Banded sliding-window SpMM: packing invariants, XLA-fallback and
Pallas-interpret parity against scipy, custom-VJP gradients, and the
auto-format selection (compiled path exercised on real TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_graph_tpu.graphs import construction as gc
from cnn_graph_tpu.ops import device_laplacian
from cnn_graph_tpu.ops.laplacian import BandedLaplacian, band_stats
from cnn_graph_tpu.ops.pallas_band import band_spmm


@pytest.fixture(scope="module")
def banded_graph():
    """~1200-node planar kNN graph, RCM-ordered: multiple 128-blocks with
    a genuine moving band (the bench's city-graph shape in miniature)."""
    rng = np.random.default_rng(0)
    side = 35
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    z = np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float32)
    z += rng.normal(0, 0.3, z.shape).astype(np.float32)
    dist, idx = gc.knn(z, k=8, algorithm="auto")
    W = gc.adjacency(dist, idx)
    perm = gc.bandwidth_reducing_permutation(W)
    W = W[perm][:, perm].tocsr()
    return gc.laplacian(W, normalized=True)


class TestBandPacking:
    def test_band_stats_invariants(self, banded_graph):
        from cnn_graph_tpu.ops.pallas_band import ring_span

        base, W, n_blocks, mp = band_stats(banded_graph)
        n_cb = mp // 128
        assert np.all(np.diff(base) >= 0), "bases must be monotone"
        assert base.min() >= 0 and base.max() + W <= n_cb
        assert ring_span(base, W, 4) >= W + 1
        coo = banded_graph.tocoo()
        brow, bcol = coo.row // 128, coo.col // 128
        assert np.all(base[brow] <= bcol) and np.all(bcol < base[brow] + W)

    def test_packed_band_reconstructs_matrix(self, banded_graph):
        op = device_laplacian(banded_graph, fmt="banded", ragged=False, use_pallas=False)
        Lr = gc.rescale_laplacian(banded_graph, 2.0)
        band = np.asarray(op.band)
        base = np.asarray(op.base)
        nbr, W, br, bc = band.shape
        dense = np.zeros((op.m_padded, op.m_padded), np.float32)
        for i in range(nbr):
            for d in range(W):
                c = base[i] + d
                dense[i * br:(i + 1) * br, c * bc:(c + 1) * bc] = band[i, d]
        np.testing.assert_allclose(
            dense[: op.m, : op.m], Lr.toarray(), atol=1e-6
        )

    def test_width_guard(self, banded_graph):
        from cnn_graph_tpu.ops.laplacian import pack_banded

        # A random permutation destroys the band -> packing must refuse.
        rng = np.random.default_rng(1)
        p = rng.permutation(banded_graph.shape[0])
        scattered = banded_graph[p][:, p].tocsr()
        with pytest.raises(ValueError, match="band width"):
            pack_banded(scattered, max_band_width=4)


class TestBandMatmul:
    def test_xla_fallback_matches_scipy(self, banded_graph):
        op = device_laplacian(banded_graph, fmt="banded", use_pallas=False)
        Lr = gc.rescale_laplacian(banded_graph, 2.0)
        rng = np.random.default_rng(1)
        X = rng.normal(size=(op.m_padded, 64)).astype(np.float32)
        X[op.m:] = 0
        got = np.asarray(jax.jit(lambda o, x: o.matmul(x))(op, jnp.asarray(X)))
        np.testing.assert_allclose(got[: op.m], Lr @ X[: op.m], atol=1e-4)
        np.testing.assert_allclose(got[op.m:], 0.0, atol=1e-5)

    def test_pallas_interpret_matches_scipy(self, banded_graph):
        op = device_laplacian(banded_graph, fmt="banded", use_pallas=False)
        Lr = gc.rescale_laplacian(banded_graph, 2.0)
        rng = np.random.default_rng(2)
        X = rng.normal(size=(op.m_padded, 256)).astype(np.float32)
        X[op.m:] = 0
        got = np.asarray(band_spmm(op, jnp.asarray(X), interpret=True))
        np.testing.assert_allclose(got[: op.m], Lr @ X[: op.m], atol=1e-4)

    def test_pallas_column_padding(self, banded_graph):
        # C not a multiple of the tile.
        op = device_laplacian(banded_graph, fmt="banded", use_pallas=False)
        rng = np.random.default_rng(3)
        X = rng.normal(size=(op.m_padded, 200)).astype(np.float32)
        got = np.asarray(band_spmm(op, jnp.asarray(X), interpret=True))
        assert got.shape == (op.m_padded, 200)
        Lr = gc.rescale_laplacian(banded_graph, 2.0)
        np.testing.assert_allclose(got[: op.m], Lr @ X[: op.m], atol=1e-4)

    def test_pallas_multiple_column_tiles(self, banded_graph):
        # col_tile < C forces the j grid dimension > 1 (ring refetch per
        # stripe).
        op = device_laplacian(banded_graph, fmt="banded", use_pallas=False)
        rng = np.random.default_rng(4)
        X = rng.normal(size=(op.m_padded, 256)).astype(np.float32)
        got = np.asarray(
            band_spmm(op, jnp.asarray(X), col_tile=128, interpret=True)
        )
        want = np.asarray(op.matmul(jnp.asarray(X)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_gradient_symmetric_adjoint(self, banded_graph):
        op = device_laplacian(banded_graph, fmt="banded", use_pallas=False)
        rng = np.random.default_rng(5)
        X = jnp.asarray(rng.normal(size=(op.m_padded, 128)).astype(np.float32))

        def f_pallas(x):
            return jnp.sum(band_spmm(op, x, 512, True) ** 2)

        def f_xla(x):
            return jnp.sum(op.matmul(x) ** 2)

        g_pallas = np.asarray(jax.grad(f_pallas)(X))
        g_xla = np.asarray(jax.grad(f_xla)(X))
        np.testing.assert_allclose(g_pallas, g_xla, rtol=1e-4, atol=1e-4)


class TestAutoSelection:
    def test_auto_prefers_banded_for_rcm_graph(self, banded_graph):
        op = device_laplacian(banded_graph, fmt="auto", dense_threshold=512)
        assert isinstance(op, BandedLaplacian)

    def test_auto_scattered_block_dense_picks_dense(self):
        from cnn_graph_tpu.ops.laplacian import (
            BlockSparseLaplacian,
            DenseLaplacian,
        )

        # A large unordered kNN graph: the block band spans nearly the
        # whole matrix, so auto must refuse banded (W > 32 blocks) — and
        # because the occupied 128-blocks exceed 1/3 of all blocks, the
        # full-rate dense matmul beats BSR's per-block DMA (measured
        # 572 vs 828 us/spmm on the 10k-word 20NEWS graph; DESIGN.md
        # §17), so auto picks dense when it fits the HBM budget ...
        rng = np.random.default_rng(6)
        z = rng.uniform(size=(6000, 2)).astype(np.float32)
        W = gc.knn_graph(z, k=6)
        L = gc.laplacian(W, normalized=True)
        op = device_laplacian(L, fmt="auto", dense_threshold=512)
        assert isinstance(op, DenseLaplacian)
        # ... and falls back to BSR when the dense matrix would not.
        op2 = device_laplacian(L, fmt="auto", dense_threshold=512,
                               dense_budget=1 << 20)
        assert isinstance(op2, BlockSparseLaplacian)

    def test_cheby_conv_through_banded(self, banded_graph):
        from cnn_graph_tpu.ops import cheby_conv

        op_band = device_laplacian(banded_graph, fmt="banded",
                                   use_pallas=False)
        op_dense = device_laplacian(banded_graph, fmt="dense")
        rng = np.random.default_rng(7)
        B, F, K, Fout = 4, 3, 5, 8
        m = op_band.m
        x = rng.normal(size=(B, m, F)).astype(np.float32)

        def run(op):
            xp = np.zeros((B, op.m_padded, F), np.float32)
            xp[:, :m] = x
            return np.asarray(jax.jit(cheby_conv)(jnp.asarray(xp), op, w))

        w = jnp.asarray(rng.normal(size=(K, F, Fout)) * 0.1, jnp.float32)
        np.testing.assert_allclose(
            run(op_band)[:, :m], run(op_dense)[:, :m], atol=1e-4
        )


class TestFusedChebyHop:
    def test_hop_matches_unfused(self, banded_graph):
        from cnn_graph_tpu.ops.pallas_band import band_cheby_hop

        op = device_laplacian(banded_graph, fmt="banded", use_pallas=False)
        rng = np.random.default_rng(8)
        x1 = jnp.asarray(rng.normal(size=(op.m_padded, 256)), jnp.float32)
        x0 = jnp.asarray(rng.normal(size=(op.m_padded, 256)), jnp.float32)
        got = np.asarray(band_cheby_hop(op, x1, x0, 512, True))
        want = np.asarray(2.0 * op.matmul(x1) - x0)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_hop_gradients(self, banded_graph):
        from cnn_graph_tpu.ops.pallas_band import band_cheby_hop

        op = device_laplacian(banded_graph, fmt="banded", use_pallas=False)
        rng = np.random.default_rng(9)
        x1 = jnp.asarray(rng.normal(size=(op.m_padded, 128)), jnp.float32)
        x0 = jnp.asarray(rng.normal(size=(op.m_padded, 128)), jnp.float32)

        def f_pallas(x1, x0):
            return jnp.sum(band_cheby_hop(op, x1, x0, 512, True) ** 2)

        def f_ref(x1, x0):
            return jnp.sum((2.0 * op.matmul(x1) - x0) ** 2)

        g1p, g0p = jax.grad(f_pallas, argnums=(0, 1))(x1, x0)
        g1r, g0r = jax.grad(f_ref, argnums=(0, 1))(x1, x0)
        np.testing.assert_allclose(np.asarray(g1p), np.asarray(g1r),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g0p), np.asarray(g0r),
                                   rtol=1e-4, atol=1e-4)

    def test_cheby_basis_uses_hop_protocol(self, banded_graph):
        # The basis built through cheby_hop matches the NumPy oracle.
        from cnn_graph_tpu.graphs.construction import chebyshev_basis
        from cnn_graph_tpu.ops import cheby_basis

        op = device_laplacian(banded_graph, fmt="banded", use_pallas=False)
        rng = np.random.default_rng(10)
        m = op.m
        x = np.zeros((2, op.m_padded, 3), np.float32)
        x[:, :m] = rng.normal(size=(2, m, 3))
        got = np.asarray(jax.jit(cheby_basis, static_argnums=2)(
            jnp.asarray(x), op, 4))
        Lr = gc.rescale_laplacian(banded_graph, 2.0)
        want = chebyshev_basis(Lr, x[0, :m], 4)  # [K, m, F]
        np.testing.assert_allclose(got[:, 0, :m], want, atol=1e-3)


class TestExtendedColumnMode:
    """banded_call's sharded-halo usage: window bases offset into an
    extended x (left/right halo rows), out_rows < x rows.  This is the
    mode the BandedHaloLaplacian Pallas path runs per shard — exercised
    here in interpret mode against the unshifted kernel."""

    def test_shifted_base_matches_unshifted(self, banded_graph):
        from cnn_graph_tpu.ops.pallas_band import banded_call

        op = device_laplacian(banded_graph, fmt="banded", ragged=False, use_pallas=False)
        rng = np.random.default_rng(11)
        C = 256
        x = rng.normal(size=(op.m_padded, C)).astype(np.float32)

        want = np.asarray(banded_call(
            op.band, op.base, jnp.asarray(x), ring=op.ring_slots,
            G=op.rows_per_step, out_rows=op.m_padded, interpret=True,
        ))

        # Prepend OFF zero block-rows to x and shift every window base:
        # identical math through the extended-column path.
        for off in (1, 3):
            x_ext = np.concatenate(
                [rng.normal(size=(off * 128, C)).astype(np.float32), x]
            )
            base_ext = np.asarray(op.base) + off
            ring = int(op.ring_slots)  # span unchanged by a uniform shift
            got = np.asarray(banded_call(
                op.band, jnp.asarray(base_ext.astype(np.int32)),
                jnp.asarray(x_ext), ring=ring, G=op.rows_per_step,
                out_rows=op.m_padded, interpret=True,
            ))
            np.testing.assert_allclose(got, want, atol=1e-4,
                                       err_msg=f"offset {off}")

    def test_shifted_base_fused_hop(self, banded_graph):
        from cnn_graph_tpu.ops.pallas_band import banded_call

        op = device_laplacian(banded_graph, fmt="banded", ragged=False, use_pallas=False)
        rng = np.random.default_rng(12)
        C, off = 128, 2
        x = rng.normal(size=(op.m_padded, C)).astype(np.float32)
        x0 = rng.normal(size=(op.m_padded, C)).astype(np.float32)
        x_ext = np.concatenate(
            [np.zeros((off * 128, C), np.float32), x]
        )
        base_ext = (np.asarray(op.base) + off).astype(np.int32)
        got = np.asarray(banded_call(
            op.band, jnp.asarray(base_ext), jnp.asarray(x_ext),
            jnp.asarray(x0), ring=int(op.ring_slots),
            G=op.rows_per_step, out_rows=op.m_padded, interpret=True,
        ))
        want = np.asarray(2.0 * op.matmul(jnp.asarray(x)) - x0)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestQuantizedBand:
    """Int8 inference path (QuantBandedLaplacian): kernel/fallback
    bit-exactness, single-SpMM error, and drift over a full recurrence
    against the float chain."""

    @pytest.fixture(scope="class")
    def qsetup(self, banded_graph):
        from cnn_graph_tpu.ops import quantize_banded

        op = device_laplacian(banded_graph, fmt="banded", ragged=False, use_pallas=False)
        rng = np.random.default_rng(13)
        x = rng.normal(size=(op.m_padded, 128)).astype(np.float32)
        x[op.m:] = 0
        qop = quantize_banded(op, sample_x=float(np.max(np.abs(x))))
        return op, qop, x

    def test_quantized_matmul_close_to_float(self, qsetup):
        op, qop, x = qsetup
        got = np.asarray(jax.jit(lambda o, v: o.matmul(v))(
            qop, jnp.asarray(x)))
        want = np.asarray(op.matmul(jnp.asarray(x)))
        # Global-scale int8 on Gaussian data: the max/RMS ratio (~4.4)
        # costs ~2 bits, so a single quant->spmm->dequant round trip
        # lands at ~6% RMS (input + output rounding); per-tensor-adaptive
        # scales would halve it but cost 13% of the tap rate
        # (DESIGN.md §11) — accepted for the serving path.
        rel = (np.linalg.norm(got[: op.m] - want[: op.m])
               / np.linalg.norm(want[: op.m]))
        assert rel < 0.08, rel

    def test_kernel_interpret_matches_fallback_bitexact(self, qsetup):
        from cnn_graph_tpu.ops.pallas_band import banded_call

        op, qop, x = qsetup
        xq = qop.quantize(jnp.asarray(x))
        x0q = qop.quantize(jnp.asarray(0.3 * x))
        got = np.asarray(banded_call(
            qop.band, qop.base, xq, x0q, ring=qop.ring_slots,
            G=qop.rows_per_step, out_rows=qop.m_padded, interpret=True,
            band_scale=qop.band_scale,
        ))
        want = np.asarray(qop._call(xq, x0q))  # XLA integer fallback
        np.testing.assert_array_equal(got, want)

    def test_quantized_chain_tracks_float_chain(self, qsetup):
        op, qop, x = qsetup
        K = 15

        @jax.jit
        def chain_f(op, x):
            def hop(c, _):
                a, b = c
                return (b, op.cheby_hop(b, a)), None

            (a, b), _ = jax.lax.scan(hop, (x, op.matmul(x)), None,
                                     length=K)
            return b

        @jax.jit
        def chain_q(qop, x):
            xq = qop.quantize(x)

            def hop(c, _):
                a, b = c
                return (b, qop.cheby_hop_q(b, a)), None

            (a, b), _ = jax.lax.scan(hop, (xq, qop.spmm_q(xq)), None,
                                     length=K)
            return qop.dequantize(b)

        xf = jnp.asarray(x)
        want = np.asarray(chain_f(op, xf))
        got = np.asarray(chain_q(qop, xf))
        rel = (np.linalg.norm(got[: op.m] - want[: op.m])
               / np.linalg.norm(want[: op.m]))
        assert rel < 0.15, rel


class TestRaggedBand:
    """Ragged per-super-step band widths (pack_banded_ragged +
    _kernel_ragged): packing reconstruction, fallback-vs-scipy,
    interpret-kernel parity, gradients, and the quantized twin.
    DESIGN.md §12."""

    @pytest.fixture(scope="class")
    def rop(self, banded_graph):
        return device_laplacian(banded_graph, fmt="banded",
                                use_pallas=False)  # ragged is the default

    def test_ragged_is_default_and_saves_blocks(self, banded_graph, rop):
        uni = device_laplacian(banded_graph, fmt="banded", ragged=False,
                               use_pallas=False)
        assert rop.levels, "banded default should pack ragged"
        assert rop.band.ndim == 3
        assert rop.band.shape[0] <= uni.band.shape[0] * uni.band.shape[1]

    def test_ragged_pack_reconstructs_matrix(self, banded_graph, rop):
        Lr = gc.rescale_laplacian(banded_graph, 2.0).toarray()
        br, bc = rop.block_shape
        G = rop.rows_per_step
        offs, lvl_idx, _ = rop.sched
        band = np.asarray(rop.band)
        base = np.asarray(rop.base)
        dense = np.zeros((rop.m_padded, rop.m_padded), np.float32)
        for s in range(len(offs)):
            w = rop.levels[lvl_idx[s]]
            blk = band[offs[s]: offs[s] + G * w].reshape(G, w, br, bc)
            for g in range(G):
                r0 = (s * G + g) * br
                for d in range(w):
                    c0 = (base[s * G + g] + d) * bc
                    if c0 < rop.m_padded:
                        dense[r0:r0 + br, c0:c0 + bc] += blk[g, d]
        np.testing.assert_allclose(dense[: rop.m, : rop.m], Lr, atol=1e-6)

    def test_ragged_fallback_matches_scipy(self, banded_graph, rop):
        rng = np.random.default_rng(21)
        C = 64
        x = rng.normal(size=(rop.m_padded, C)).astype(np.float32)
        got = np.asarray(jax.jit(lambda o, v: o.matmul(v))(
            rop, jnp.asarray(x)))
        Lr = gc.rescale_laplacian(banded_graph, 2.0)
        want = Lr @ x[: rop.m]
        np.testing.assert_allclose(got[: rop.m], want, atol=1e-4)

    def test_ragged_interpret_kernel_matches_fallback(self, rop):
        from cnn_graph_tpu.ops.pallas_band import band_cheby_hop, band_spmm

        rng = np.random.default_rng(22)
        C = 192  # forces column padding too
        x = jnp.asarray(rng.normal(size=(rop.m_padded, C)), jnp.float32)
        x0 = jnp.asarray(rng.normal(size=(rop.m_padded, C)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(band_spmm(rop, x, 512, True)),
            np.asarray(rop.matmul(x)), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(band_cheby_hop(rop, x, x0, 512, True)),
            np.asarray(2.0 * rop.matmul(x) - x0), atol=1e-4)

    def test_ragged_gradients_symmetric_adjoint(self, rop):
        from cnn_graph_tpu.ops.pallas_band import band_cheby_hop

        rng = np.random.default_rng(23)
        C = 128
        x = jnp.asarray(rng.normal(size=(rop.m_padded, C)), jnp.float32)
        x0 = jnp.asarray(rng.normal(size=(rop.m_padded, C)), jnp.float32)

        def f(x, x0):
            return jnp.sum(band_cheby_hop(rop, x, x0, 512, True) ** 2)

        gx, gx0 = jax.grad(f, argnums=(0, 1))(x, x0)
        g = 2.0 * band_cheby_hop(rop, x, x0, 512, True)
        np.testing.assert_allclose(np.asarray(gx),
                                   np.asarray(2.0 * rop.matmul(g)),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(gx0), np.asarray(-g),
                                   atol=1e-6)

    def test_ragged_quantized_bitexact_and_conv(self, banded_graph, rop):
        from cnn_graph_tpu.ops import cheby_conv, quantize_banded
        from cnn_graph_tpu.ops.pallas_band import banded_call_ragged

        rng = np.random.default_rng(24)
        qop = quantize_banded(rop, sample_x=3.0)
        assert qop.levels == rop.levels
        xq = qop.quantize(jnp.asarray(
            rng.normal(size=(rop.m_padded, 128)).astype(np.float32)))
        x0q = qop.quantize(jnp.asarray(
            rng.normal(size=(rop.m_padded, 128)).astype(np.float32)))
        got = np.asarray(banded_call_ragged(
            qop.band, qop.base, jnp.asarray(np.asarray(qop.sched,
                                                       np.int32)),
            xq, x0q, levels=qop.levels, ring=qop.ring_slots,
            G=qop.rows_per_step, out_rows=qop.m_padded, interpret=True,
            band_scale=qop.band_scale))
        want = np.asarray(qop._call(xq, x0q))
        np.testing.assert_array_equal(got, want)

        # and through the public conv with the f32 ragged op as oracle
        K, Fin, Fout = 6, 8, 8
        x = jnp.asarray(rng.normal(size=(2, rop.m, Fin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(K, Fin, Fout)) * 0.2, jnp.float32)
        want_c = np.asarray(jax.jit(cheby_conv)(x, rop, w))
        got_c = np.asarray(jax.jit(cheby_conv)(x, qop, w))
        rel = np.linalg.norm(got_c - want_c) / np.linalg.norm(want_c)
        assert rel < 0.12, rel


class TestAdjointChainConv:
    """cheby_conv_banded: the streaming banded conv whose backward runs
    the fused three-term ADJOINT recurrence (band_cheby_hop_c, one
    kernel pass per hop) instead of autodiff's un-fused SpMM + two
    elementwise passes.  VERDICT round-3 next-step #2."""

    @pytest.fixture(scope="class")
    def ops_pair(self, banded_graph):
        rop = device_laplacian(banded_graph, fmt="banded",
                               use_pallas=False)
        uop = device_laplacian(banded_graph, fmt="banded", ragged=False,
                               use_pallas=False)
        dref = device_laplacian(banded_graph, fmt="dense")
        return rop, uop, dref

    def test_hop_c_interpret_matches_math(self, ops_pair):
        from cnn_graph_tpu.ops.pallas_band import band_cheby_hop_c

        rop, uop, _ = ops_pair
        rng = np.random.default_rng(30)
        C = 192
        x1 = jnp.asarray(rng.normal(size=(rop.m_padded, C)), jnp.float32)
        x0 = jnp.asarray(rng.normal(size=(rop.m_padded, C)), jnp.float32)
        c = jnp.asarray(rng.normal(size=(rop.m_padded, C)), jnp.float32)
        for op in (rop, uop):
            import dataclasses

            pal = dataclasses.replace(op, use_pallas=True)
            got = np.asarray(band_cheby_hop_c(pal, x1, x0, c,
                                              interpret=True))
            want = np.asarray(2.0 * op.matmul(x1) - x0 + c)
            np.testing.assert_allclose(got, want, atol=1e-4)

    def test_forward_matches_dense_reference(self, ops_pair):
        from cnn_graph_tpu.ops import cheby_conv

        rop, _uop, dref = ops_pair
        rng = np.random.default_rng(31)
        B, Fin, Fout, K = 3, 4, 5, 7
        x = jnp.asarray(rng.normal(size=(B, rop.m, Fin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(K, Fin, Fout)) * 0.2, jnp.float32)
        got = np.asarray(jax.jit(cheby_conv)(x, rop, w))
        want = np.asarray(jax.jit(cheby_conv)(
            jnp.asarray(np.asarray(x)[:, : dref.m]), dref, w))
        np.testing.assert_allclose(got, want[:, : rop.m], atol=2e-3)

    @pytest.mark.parametrize("K", [1, 2, 3, 7])
    def test_grads_match_autodiff_through_hops(self, ops_pair, K):
        """dx and dW from the fused adjoint chain vs plain autodiff
        through the per-hop path (the old cheby_basis + einsum route)."""
        from cnn_graph_tpu.ops.filters import cheby_basis, cheby_conv_banded

        rop, _uop, _ = ops_pair
        rng = np.random.default_rng(32)
        B, Fin, Fout = 2, 4, 3
        x = jnp.asarray(rng.normal(size=(B, rop.m, Fin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(K, Fin, Fout)) * 0.3, jnp.float32)
        t = jnp.asarray(rng.normal(size=(B, rop.m, Fout)), jnp.float32)

        def loss_stream(x, w):
            return jnp.sum(cheby_conv_banded(x, rop, w) * t)

        def loss_generic(x, w):
            basis = cheby_basis(x, rop, K)
            y = jnp.einsum("kbmf,kfo->bmo", basis, w)
            return jnp.sum(y * t)

        gx1, gw1 = jax.jit(jax.grad(loss_stream, argnums=(0, 1)))(x, w)
        gx2, gw2 = jax.jit(jax.grad(loss_generic, argnums=(0, 1)))(x, w)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                                   atol=2e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                                   atol=2e-3, rtol=1e-4)

    def test_node_classifier_trains_through_streaming_conv(self,
                                                          banded_graph):
        """End to end: a NodeClassifier on a banded operator still
        learns (loss drops) through the new conv + adjoint backward."""
        import optax

        from cnn_graph_tpu.models import NodeClassifier

        op = device_laplacian(banded_graph, fmt="banded",
                              use_pallas=False)
        rng = np.random.default_rng(33)
        model = NodeClassifier(op, input_features=4, num_classes=3,
                               hidden=[8], K=4)
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.normal(size=(op.m_padded, 4)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 3, op.m_padded), jnp.int32)
        mask = jnp.ones((op.m_padded,), bool)
        opt = optax.adam(1e-2)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            l, g = jax.value_and_grad(model.loss)(params, x, y, mask)
            up, state = opt.update(g, state, params)
            return optax.apply_updates(params, up), state, l

        losses = []
        for _ in range(12):
            params, state, l = step(params, state)
            losses.append(float(l))
        assert losses[-1] < losses[0], losses

    def test_input_grad_false_skips_dx_keeps_dw(self, ops_pair):
        """input_grad=False (the first-layer declaration): dW identical
        to the differentiated path, dx exactly zero — and the backward
        jaxpr carries no adjoint-chain kernel calls."""
        from cnn_graph_tpu.ops.filters import cheby_conv_banded

        rop, _uop, _ = ops_pair
        rng = np.random.default_rng(34)
        B, Fin, Fout, K = 2, 4, 3, 7
        x = jnp.asarray(rng.normal(size=(B, rop.m, Fin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(K, Fin, Fout)) * 0.3, jnp.float32)
        t = jnp.asarray(rng.normal(size=(B, rop.m, Fout)), jnp.float32)

        def loss(x, w, input_grad):
            return jnp.sum(cheby_conv_banded(x, rop, w, input_grad) * t)

        gx1, gw1 = jax.grad(loss, argnums=(0, 1))(x, w, True)
        gx0, gw0 = jax.grad(loss, argnums=(0, 1))(x, w, False)
        np.testing.assert_allclose(np.asarray(gw0), np.asarray(gw1),
                                   atol=1e-5, rtol=1e-5)
        assert not np.any(np.asarray(gx0))
        assert np.any(np.asarray(gx1))


class TestChebyFinals:
    """cheby_finals: the donated double-hop chain driver (final-carry
    recurrence behind the throughput benches) against the NumPy oracle,
    and the in-place (input_output_aliases) kernel path in interpret
    mode."""

    @pytest.mark.parametrize("K", [1, 2, 5, 6])
    def test_matches_oracle_float(self, banded_graph, K):
        from cnn_graph_tpu.graphs.construction import chebyshev_basis
        from cnn_graph_tpu.ops import cheby_finals

        op = device_laplacian(banded_graph, fmt="banded",
                              use_pallas=False)
        rng = np.random.default_rng(21)
        x = np.zeros((op.m_padded, 16), np.float32)
        x[: op.m] = rng.normal(size=(op.m, 16))
        got = np.asarray(jax.jit(
            lambda o, v: cheby_finals(o, v, K))(op, jnp.asarray(x)))
        Lr = gc.rescale_laplacian(banded_graph, 2.0)
        want = chebyshev_basis(Lr, x[: op.m], K)[K - 1]
        np.testing.assert_allclose(got[: op.m], want, atol=2e-3)

    @pytest.mark.parametrize("K", [4, 5])
    def test_quant_path_matches_unrolled(self, banded_graph, K):
        from cnn_graph_tpu.ops import cheby_finals, quantize_banded

        op = device_laplacian(banded_graph, fmt="banded",
                              use_pallas=False)
        rng = np.random.default_rng(22)
        x = np.zeros((op.m_padded, 16), np.float32)
        x[: op.m] = rng.normal(size=(op.m, 16))
        qop = quantize_banded(op, sample_x=float(np.max(np.abs(x))))
        xq = jax.jit(lambda o, v: o.quantize(v))(qop, jnp.asarray(x))

        got = np.asarray(jax.jit(
            lambda o, v: cheby_finals(o, v, K))(qop, xq))

        @jax.jit
        def unrolled(qop, xq):
            basis = [xq, qop.spmm_q(xq)]
            for _ in range(2, K):
                basis.append(qop.cheby_hop_q(basis[-1], basis[-2]))
            return basis[K - 1]

        want = np.asarray(unrolled(qop, xq))
        np.testing.assert_array_equal(got, want)  # same int arithmetic

    def test_donated_kernel_matches_undonated(self, banded_graph):
        from cnn_graph_tpu.ops.pallas_band import banded_call

        op = device_laplacian(banded_graph, fmt="banded", ragged=False,
                              use_pallas=False)
        rng = np.random.default_rng(23)
        C = 128
        x = rng.normal(size=(op.m_padded, C)).astype(np.float32)
        x0 = rng.normal(size=(op.m_padded, C)).astype(np.float32)
        kw = dict(ring=op.ring_slots, G=op.rows_per_step,
                  out_rows=op.m_padded, interpret=True)
        want = np.asarray(banded_call(
            op.band, op.base, jnp.asarray(x), jnp.asarray(x0), **kw))
        got = np.asarray(banded_call(
            op.band, op.base, jnp.asarray(x), jnp.asarray(x0),
            donate_x0=True, **kw))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_donated_ragged_kernel_matches(self, banded_graph):
        from cnn_graph_tpu.ops.pallas_band import banded_call_ragged

        op = device_laplacian(banded_graph, fmt="banded",
                              use_pallas=False)
        assert op.levels, "fixture should pack ragged by default"
        rng = np.random.default_rng(24)
        C = 128
        x = rng.normal(size=(op.m_padded, C)).astype(np.float32)
        x0 = rng.normal(size=(op.m_padded, C)).astype(np.float32)
        sched = jnp.asarray(np.asarray(op.sched, np.int32))
        kw = dict(levels=op.levels, ring=op.ring_slots,
                  G=op.rows_per_step, out_rows=op.m_padded,
                  interpret=True)
        want = np.asarray(banded_call_ragged(
            op.band, op.base, sched, jnp.asarray(x), jnp.asarray(x0),
            **kw))
        got = np.asarray(banded_call_ragged(
            op.band, op.base, sched, jnp.asarray(x), jnp.asarray(x0),
            donate_x0=True, **kw))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestPrefetchAhead:
    """The PREFETCH_AHEAD parameterization (probe mode 'pa'): deeper
    band-slab pipelines must be value-identical — only the DMA schedule
    changes."""

    @pytest.mark.parametrize("pa", [2, 3])
    def test_deeper_pipeline_matches_default(self, banded_graph, pa):
        import dataclasses

        from cnn_graph_tpu.ops.pallas_band import (
            banded_call_ragged, ring_span,
        )

        rop = device_laplacian(banded_graph, fmt="banded",
                               use_pallas=False)
        rng = np.random.default_rng(40)
        C = 128
        x = jnp.asarray(rng.normal(size=(rop.m_padded, C)), jnp.float32)
        x0 = jnp.asarray(rng.normal(size=(rop.m_padded, C)), jnp.float32)

        base = np.asarray(rop.base, np.int64)
        hw = np.asarray(rop.sched[2], np.int64)
        nsb = len(hw)
        G = rop.rows_per_step
        started = hw[np.minimum(np.arange(nsb) + pa, nsb - 1)]
        ring = int((started - base[np.arange(nsb) * G]).max()) + 1
        sched = jnp.asarray(np.asarray(rop.sched, np.int32))

        got = np.asarray(banded_call_ragged(
            rop.band, rop.base, sched, x, x0, levels=rop.levels,
            ring=ring, G=G, out_rows=rop.m_padded, interpret=True,
            prefetch_ahead=pa))
        want = np.asarray(2.0 * rop.matmul(x) - x0)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_uniform_kernel_pa2(self, banded_graph):
        from cnn_graph_tpu.ops.pallas_band import banded_call, ring_span

        uop = device_laplacian(banded_graph, fmt="banded", ragged=False,
                               use_pallas=False)
        rng = np.random.default_rng(41)
        C = 128
        x = jnp.asarray(rng.normal(size=(uop.m_padded, C)), jnp.float32)
        ring = ring_span(np.asarray(uop.base), uop.band.shape[1],
                         uop.rows_per_step, pa=2)
        got = np.asarray(banded_call(
            uop.band, uop.base, x, ring=ring, G=uop.rows_per_step,
            out_rows=uop.m_padded, interpret=True, prefetch_ahead=2))
        want = np.asarray(uop.matmul(x))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestDeepKWindow:
    """The deep-K window kernel variant (banded_call_dkw): one wide
    [br, W_l*bc] MXU dot per block-row from a contiguous x window
    (mirrored ring slots), replacing W_l separate taps.  Must be
    bit-exact (int8) / accumulation-equal (float) with the ragged
    tap-loop kernel's XLA oracle."""

    @pytest.fixture(scope="class")
    def ragged_op(self):
        from cnn_graph_tpu.data.synthetic import city_graph

        L, _ = city_graph(96, k=8, seed=0)  # 9216 nodes, 3 levels
        return device_laplacian(L, fmt="banded", dtype=jnp.float32,
                                use_pallas=False)

    def _dkw_parts(self, o):
        from cnn_graph_tpu.ops.pallas_band import pack_dkw_from_ragged

        bands, sched = pack_dkw_from_ragged(
            np.asarray(o.band), o.sched, o.levels, o.rows_per_step,
            *o.block_shape,
        )
        return [jnp.asarray(b) for b in bands], jnp.asarray(sched)

    def test_float_spmm_and_hop(self, ragged_op):
        from cnn_graph_tpu.ops.pallas_band import banded_call_dkw

        op = ragged_op
        assert len(op.levels) >= 2, "fixture should be multi-level"
        bands, sched = self._dkw_parts(op)
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.normal(size=(op.m_padded, 200)), jnp.float32)
        X0 = jnp.asarray(rng.normal(size=X.shape), jnp.float32)
        want = np.asarray(op.matmul(X))
        got = np.asarray(banded_call_dkw(
            bands, op.base, sched, X, levels=op.levels,
            ring=op.ring_slots, G=op.rows_per_step,
            out_rows=op.m_padded, interpret=True,
        ))
        np.testing.assert_allclose(got, want, atol=1e-4)
        goth = np.asarray(banded_call_dkw(
            bands, op.base, sched, X, X0, levels=op.levels,
            ring=op.ring_slots, G=op.rows_per_step,
            out_rows=op.m_padded, interpret=True,
        ))
        np.testing.assert_allclose(goth, 2 * got - np.asarray(X0),
                                   atol=1e-4)

    def test_quant_bit_exact_and_c_injection(self, ragged_op):
        import dataclasses

        from cnn_graph_tpu.ops import quantize_banded
        from cnn_graph_tpu.ops.pallas_band import banded_call_dkw

        q = quantize_banded(ragged_op, sample_x=3.0)
        q_fb = dataclasses.replace(q, use_pallas=False)
        bands, sched = self._dkw_parts(q)
        rng = np.random.default_rng(1)
        X = jnp.asarray(rng.normal(size=(q.m_padded, 256)), jnp.float32)
        xq, x0q = q.quantize(X), q.quantize(X * 0.5)
        got = np.asarray(banded_call_dkw(
            bands, q.base, sched, xq, x0q, levels=q.levels,
            ring=q.ring_slots, G=q.rows_per_step, out_rows=q.m_padded,
            band_scale=q.band_scale, interpret=True,
        ))
        want = np.asarray(q_fb.cheby_hop_q(xq, x0q))
        assert np.array_equal(got, want)

        # Float hop with the adjoint-chain c injection.
        op = ragged_op
        bands_f, sched_f = self._dkw_parts(op)
        C = jnp.asarray(rng.normal(size=X.shape), jnp.float32)
        X0 = X * 0.25
        got_c = np.asarray(banded_call_dkw(
            bands_f, op.base, sched_f, X, X0, C, levels=op.levels,
            ring=op.ring_slots, G=op.rows_per_step,
            out_rows=op.m_padded, interpret=True,
        ))
        want_c = 2 * np.asarray(op.matmul(X)) - np.asarray(X0) \
            + np.asarray(C)
        np.testing.assert_allclose(got_c, want_c, atol=1e-4)
