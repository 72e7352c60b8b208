"""Pallas TPU kernel: fully-fused dense Chebyshev convolution.

For graphs small enough that the (rescaled) dense Laplacian fits in VMEM
(M <= ~1700 at bf16 — covers the MNIST grid and every coarsened level),
the whole filter y = sum_k T_k(L) x W_k runs as ONE kernel:

* L stays VMEM-resident across all K hops (the XLA path re-touches HBM
  every hop and materializes the [K, M, F*B] basis stack plus a relayout
  for the tap matmul — measured at ~2x the SpMM cost itself);
* the three-term recurrence ping-pongs between two VMEM buffers;
* each hop's filter tap is applied immediately to an f32 accumulator via
  a block-diagonal-expanded weight matrix, so the tap is a single
  [M, TC] @ [TC, S*Fout] MXU matmul per hop (S = samples per column tile).

Layout: activations enter as ``[Mp, B*F]`` with batch-major columns
(c = b*F + f), so a TC-wide column tile holds S = TC/F whole samples and
the expanded weights are block-diagonal with S identical [F, Fout] blocks.

Grid: one program per column tile; per program the K hop weights are
streamed from HBM with double-buffered DMA while the MXU runs the
recurrence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cheby_conv_fused", "expand_tap_weights", "fused_vmem_ok"]


def fused_vmem_ok(m_padded: int, compute_dtype, col_tile: int = 512,
                  budget_bytes: int = 14 * 1024 * 1024 + 512 * 1024) -> bool:
    """Whether the fused kernel's VMEM working set fits."""
    itemsize = jnp.dtype(compute_dtype).itemsize
    need = (
        m_padded * m_padded * itemsize      # L
        + 2 * m_padded * col_tile * 4       # recurrence ping-pong (f32)
        + m_padded * col_tile * 4           # accumulator (f32)
        + 2 * col_tile * col_tile * itemsize  # weight double-buffer
        + m_padded * col_tile * 4           # x tile
    )
    return need <= budget_bytes


def expand_tap_weights(w: jax.Array, samples_per_tile: int) -> jax.Array:
    """``[K, F, O]`` -> block-diagonal ``[K, S*F, S*O]`` (S identical
    diagonal blocks), so a column tile of S samples taps in one matmul."""
    K, F, O = w.shape
    S = samples_per_tile
    eye = jnp.eye(S, dtype=w.dtype)
    # out[k, s*F + f, s2*O + o] = eye[s, s2] * w[k, f, o]
    return jnp.einsum("st,kfo->ksfto", eye, w).reshape(K, S * F, S * O)


def _kernel(L_ref, x_ref, wexp_hbm, y_ref, ta, tb, acc, wbuf, wsem,
            *, K, cdt):
    def wdma(k, slot):
        return pltpu.make_async_copy(wexp_hbm.at[k], wbuf.at[slot],
                                     wsem.at[slot])

    wdma(0, 0).start()

    def tap(k, t_ref):
        slot = k % 2
        if k + 1 < K:  # static: the hop loop is unrolled
            wdma(k + 1, (k + 1) % 2).start()
        wdma(k, slot).wait()
        acc[:] += jnp.dot(
            t_ref[:].astype(cdt), wbuf[slot],
            preferred_element_type=jnp.float32,
        )

    acc[:] = jnp.zeros_like(acc)
    ta[:] = x_ref[:]
    tap(0, ta)  # T_0 = x
    if K > 1:
        tb[:] = jnp.dot(
            L_ref[:], ta[:].astype(cdt), preferred_element_type=jnp.float32
        )
        tap(1, tb)  # T_1 = L x
    for k in range(2, K):
        # Three-term recurrence, ping-ponging between ta and tb.
        src, dst = (tb, ta) if k % 2 == 0 else (ta, tb)
        dst[:] = (
            2.0
            * jnp.dot(L_ref[:], src[:].astype(cdt),
                      preferred_element_type=jnp.float32)
            - dst[:]
        )
        tap(k, dst)
    y_ref[:] = acc[:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def cheby_conv_fused(x: jax.Array, L, w: jax.Array,
                     col_tile: int = 512,
                     interpret: bool = False) -> jax.Array:
    """Fused Chebyshev conv for DenseLaplacian operators.

    ``x``: [B, M, Fin], ``w``: [K, Fin, Fout]  ->  [B, M, Fout].
    Matches ops.filters.cheby_conv to accumulation-order precision.

    Differentiable via a custom VJP: dx reuses the fused kernel with
    transposed taps (T_k(L) is symmetric, so the adjoint of the filter is
    the filter with ``W_k^T``); dW rematerializes the basis with the XLA
    stacked path (trading one recompute for never storing the K-stack in
    the forward pass).
    """
    return _fused_fwd_impl(x, L, w, col_tile, interpret)


def _fused_fwd_impl(x, L, w, col_tile, interpret):
    K, F, O = w.shape
    B, M, Fx = x.shape
    assert Fx == F
    mp = L.m_padded
    cdt = L.compute_dtype

    S = max(col_tile // F, 1)
    tc = S * F
    bp = -(-B // S) * S  # pad batch to whole tiles
    n_tiles = bp // S

    # [B, M, F] -> [Mp, B*F] batch-major columns.
    xt = jnp.transpose(x, (1, 0, 2)).reshape(M, B * F)
    xt = jnp.pad(xt, ((0, mp - M), (0, (bp - B) * F)))

    wexp = expand_tap_weights(w.astype(cdt), S)  # [K, tc, S*O]

    y = pl.pallas_call(
        functools.partial(_kernel, K=K, cdt=cdt),
        out_shape=jax.ShapeDtypeStruct((mp, bp * O), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((mp, mp), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),   # L, resident
                pl.BlockSpec((mp, tc), lambda j: (0, j),
                             memory_space=pltpu.VMEM),   # x column tile
                pl.BlockSpec(memory_space=pl.ANY),       # expanded W in HBM
            ],
            out_specs=pl.BlockSpec((mp, S * O), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((mp, tc), jnp.float32),   # t_a
                pltpu.VMEM((mp, tc), jnp.float32),   # t_b
                pltpu.VMEM((mp, S * O), jnp.float32),  # accumulator
                pltpu.VMEM((2, tc, S * O), cdt),     # W double-buffer
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * mp * bp * F * (K - 1)
            + 2 * mp * tc * S * O * K * n_tiles,
            bytes_accessed=mp * mp * jnp.dtype(cdt).itemsize
            + 2 * mp * bp * F * 4,
            transcendentals=0,
        ),
    )(L.mat.astype(cdt), xt, wexp)

    # [Mp, Bp*O] -> [B, M, O]
    y = y[:M].reshape(M, bp, O)
    return jnp.transpose(y, (1, 0, 2))[:B].astype(x.dtype)


def _fused_fwd(x, L, w, col_tile, interpret):
    return _fused_fwd_impl(x, L, w, col_tile, interpret), (x, L, w)


def _dw_eligible(F: int, O: int, col_tile: int = 256) -> bool:
    s = max(col_tile // F, 1)
    return (s * F) % 128 == 0 and (s * O) % 128 == 0


def _fused_bwd(col_tile, interpret, residuals, g):
    x, L, w = residuals
    K, F, O = w.shape
    # dx: adjoint filter = same filter with transposed taps (L symmetric).
    wt = jnp.transpose(w, (0, 2, 1))  # [K, O, F]
    dx = _fused_fwd_impl(g, L, wt, col_tile, interpret)
    # dW[k, f, o] = sum_{b,m} (T_k x)[b, m, f] g[b, m, o]: in-kernel
    # recompute when the shapes tile (no basis stack in HBM), else the
    # XLA stacked-basis fallback.
    if _dw_eligible(F, O):
        dw = cheby_dw_fused(x, L, g, K, interpret=interpret).astype(w.dtype)
    else:
        from cnn_graph_tpu.ops.filters import cheby_basis

        basis = cheby_basis(x, L, K)  # [K, B, M, F]
        dw = jnp.einsum(
            "kbmf,bmo->kfo", basis.astype(g.dtype), g,
            preferred_element_type=w.dtype,
        ).astype(w.dtype)
    from cnn_graph_tpu.ops.laplacian import zero_cotangent

    return dx, zero_cotangent(L), dw


cheby_conv_fused.defvjp(_fused_fwd, _fused_bwd)


def _dw_kernel(L_ref, x_ref, g_ref, out_ref, ta, tb, *, K, F, cdt):
    """Recompute the recurrence and emit per-hop tap cotangent factors.

    Per hop k:  P = T_k^T g  ([tc, S*O]),  PA = A^T P  ([F, S*O]) where
    A[c, f] = (c mod F == f) sums each sample's F-row group; the final
    fold over samples (and tiles) happens in XLA.
    """
    tc = ta.shape[1]
    so = g_ref.shape[1]
    O = so * F // tc
    rows = jax.lax.broadcasted_iota(jnp.int32, (tc, F), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tc, F), 1)
    A = (rows % F == cols).astype(cdt)
    # Sample-diagonal mask: row c belongs to sample c//F, column d to
    # sample d//O; only matching-sample entries contribute to dW.
    rsamp = jax.lax.broadcasted_iota(jnp.int32, (tc, so), 0) // F
    csamp = jax.lax.broadcasted_iota(jnp.int32, (tc, so), 1) // O
    diag_mask = (rsamp == csamp).astype(jnp.float32)

    def emit(k, t_ref):
        P = jax.lax.dot_general(
            t_ref[:].astype(cdt), g_ref[:].astype(cdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tc, S*O]
        out_ref[0, k] = jax.lax.dot_general(
            A, (P * diag_mask).astype(cdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [F, S*O]

    ta[:] = x_ref[:]
    emit(0, ta)
    if K > 1:
        tb[:] = jnp.dot(
            L_ref[:], ta[:].astype(cdt), preferred_element_type=jnp.float32
        )
        emit(1, tb)
    for k in range(2, K):
        src, dst = (tb, ta) if k % 2 == 0 else (ta, tb)
        dst[:] = (
            2.0
            * jnp.dot(L_ref[:], src[:].astype(cdt),
                      preferred_element_type=jnp.float32)
            - dst[:]
        )
        emit(k, dst)


def cheby_dw_fused(x: jax.Array, L, g: jax.Array, K: int,
                   col_tile: int = 256, interpret: bool = False) -> jax.Array:
    """``dW[k, f, o] = sum_{b,m} (T_k x)[b, m, f] g[b, m, o]`` without
    materializing the basis: the recurrence is recomputed in-kernel and
    each hop contributes a per-tile factor folded in XLA."""
    B, M, F = x.shape
    O = g.shape[2]
    mp = L.m_padded
    cdt = L.compute_dtype

    S = max(col_tile // F, 1)
    tc = S * F
    bp = -(-B // S) * S
    n_tiles = bp // S

    xt = jnp.transpose(x, (1, 0, 2)).reshape(M, B * F)
    xt = jnp.pad(xt, ((0, mp - M), (0, (bp - B) * F)))
    gt = jnp.transpose(g, (1, 0, 2)).reshape(M, B * O)
    gt = jnp.pad(gt, ((0, mp - M), (0, (bp - B) * O)))

    parts = pl.pallas_call(
        functools.partial(_dw_kernel, K=K, F=F, cdt=cdt),
        out_shape=jax.ShapeDtypeStruct((n_tiles, K, F, S * O), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((mp, mp), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mp, tc), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mp, S * O), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, K, F, S * O),
                                   lambda j: (j, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((mp, tc), jnp.float32),
                pltpu.VMEM((mp, tc), jnp.float32),
            ],
        ),
        interpret=interpret,
    )(L.mat.astype(cdt), xt, gt)

    # Fold samples within tiles and across tiles: [nt, K, F, S, O] -> sum.
    return parts.reshape(n_tiles, K, F, S, O).sum(axis=(0, 3))
