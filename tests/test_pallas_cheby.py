"""Fused dense Chebyshev kernel tests (interpret mode; compiled path is
driven on real TPU by the verify flow and bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_graph_tpu.graphs import construction as gc
from cnn_graph_tpu.ops import cheby_conv, device_laplacian
from cnn_graph_tpu.ops.filters import _fused_eligible
from cnn_graph_tpu.ops.pallas_cheby import (
    cheby_conv_fused,
    expand_tap_weights,
    fused_vmem_ok,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    z = rng.uniform(size=(200, 2)).astype(np.float32)
    L = gc.laplacian(gc.knn_graph(z, k=6), normalized=True)
    return device_laplacian(L, fmt="dense", use_pallas=False)


class TestExpandTapWeights:
    def test_block_diagonal_structure(self):
        w = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 3)),
                        jnp.float32)
        wexp = expand_tap_weights(w, samples_per_tile=3)
        assert wexp.shape == (2, 12, 9)
        w_np = np.asarray(w)
        we = np.asarray(wexp)
        for s in range(3):
            np.testing.assert_allclose(
                we[:, s * 4 : (s + 1) * 4, s * 3 : (s + 1) * 3], w_np
            )
        # Off-diagonal blocks are zero.
        assert np.abs(we[:, 0:4, 3:6]).max() == 0


class TestFusedConv:
    def test_matches_xla_path(self, setup):
        op = setup
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(10, 200, 32)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(7, 32, 16)).astype(np.float32) * 0.1)
        want = np.asarray(cheby_conv(x, op, w))
        got = np.asarray(cheby_conv_fused(x, op, w, col_tile=128,
                                          interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_partial_batch_tile(self, setup):
        op = setup
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(5, 200, 32)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(4, 32, 32)).astype(np.float32) * 0.1)
        want = np.asarray(cheby_conv(x, op, w))
        got = np.asarray(cheby_conv_fused(x, op, w, col_tile=256,
                                          interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_gradients_match_xla(self, setup):
        op = setup
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(4, 200, 32)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(5, 32, 16)).astype(np.float32) * 0.1)

        def loss_fused(x, w):
            return jnp.sum(jnp.sin(cheby_conv_fused(x, op, w, 128, True)))

        def loss_xla(x, w):
            return jnp.sum(jnp.sin(cheby_conv(x, op, w)))

        gx1, gw1 = jax.grad(loss_fused, argnums=(0, 1))(x, w)
        gx2, gw2 = jax.grad(loss_xla, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(gx1, gx2, atol=1e-4)
        np.testing.assert_allclose(gw1, gw2, atol=1e-3)


class TestEligibility:
    def test_aligned_shapes_eligible(self, setup):
        assert _fused_eligible(setup, 32, 32)
        assert _fused_eligible(setup, 32, 64)

    def test_misaligned_shapes_fall_back(self, setup):
        assert not _fused_eligible(setup, 10, 2)  # S*F not 128-aligned
        assert not _fused_eligible(setup, 1, 32)  # backward tile too big

    def test_vmem_budget(self):
        assert fused_vmem_ok(976, jnp.bfloat16)
        assert not fused_vmem_ok(4096, jnp.float32)

    def test_dispatch_uses_fused_only_when_flagged(self, setup):
        # CPU operators default to use_fused=False; cheby_conv must not
        # try to launch a compiled Pallas kernel.
        assert setup.use_fused is False
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, 200, 32)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 32, 32)).astype(np.float32))
        out = cheby_conv(x, setup, w)  # XLA path, no pallas
        assert out.shape == (2, 200, 32)
