"""Pallas TPU kernel: block-sparse-row SpMM for the Chebyshev recurrence.

Computes ``y = L @ x`` where L is stored as dense MXU tiles at nonzero
block positions (ops/laplacian.py: BlockSparseLaplacian).  The XLA
fallback materializes a gathered ``[nb, bs, C]`` operand in HBM and a
segment-sum; this kernel instead streams exactly the needed x row-blocks
into VMEM with double-buffered DMA and accumulates each output row-block
on the MXU — HBM traffic is O(nnz-blocks) with no intermediate tensors.

Grid: (row-blocks, column-tiles).  Per program, the block-CSR row extent
``row_ptr[i]:row_ptr[i+1]`` (scalar-prefetched, so DMA addresses are known
before the body runs) is walked with an NBUF-slot pipeline:

    start DMA b+NBUF-1 | wait DMA b | acc += blocks[b] @ x[cols[b]]

The kernel assumes block rows are sorted (pack_block_sparse guarantees it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bsr_spmm"]


NBUF = 4  # DMA pipeline depth: per-block transfers are small (~tens of
# KB), so latency only hides behind compute with several copies in flight.


def _kernel(row_ptr_ref, cols_ref, blocks_ref, x_ref, y_ref,
            acc_ref, bbuf_ref, xbuf_ref, bsem, xsem, *, br, bc, tc):
    i = pl.program_id(0)
    j = pl.program_id(1)
    lo = row_ptr_ref[i]
    hi = row_ptr_ref[i + 1]

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def dma_pair(b, slot):
        col = cols_ref[b]
        return (
            pltpu.make_async_copy(blocks_ref.at[b], bbuf_ref.at[slot],
                                  bsem.at[slot]),
            pltpu.make_async_copy(
                x_ref.at[pl.ds(col * bc, bc), pl.ds(j * tc, tc)],
                xbuf_ref.at[slot],
                xsem.at[slot],
            ),
        )

    def start(b, slot):
        bd, xd = dma_pair(b, slot)
        bd.start()
        xd.start()

    # Warm-up: fill the pipeline.
    for d in range(NBUF - 1):
        @pl.when(lo + d < hi)
        def _(d=d):
            start(lo + d, jax.lax.rem(jnp.int32(d), NBUF))

    def body(b, _):
        slot = jax.lax.rem(b - lo, NBUF)
        ahead = b + NBUF - 1

        @pl.when(ahead < hi)
        def _():
            start(ahead, jax.lax.rem(ahead - lo, NBUF))

        bcur, xcur = dma_pair(b, slot)
        bcur.wait()
        xcur.wait()
        acc_ref[:] += jnp.dot(
            bbuf_ref[slot], xbuf_ref[slot], preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(lo, hi, body, 0)
    y_ref[:] = acc_ref[:].astype(y_ref.dtype)


def _kernel_chunked(row_ptr_ref, cols_ref, blocks_ref, x_ref, y_ref,
                    acc_ref, bslab_ref, xbuf_ref, bsem, xsem,
                    *, br, bc, tc, Lmax):
    """Chunked-DMA BSR: one contiguous slab transfer per block-row.

    Blocks of a row are adjacent in memory (pack_block_sparse sorts by
    (row, col)), so the whole extent [rowptr[i], rowptr[i]+Lmax) arrives
    in ONE DMA, double-buffered across rows — amortizing the fixed
    per-transfer cost that dominates the per-block pipeline (~0.6us per
    block measured at 50k nodes).  The static Lmax overrun past rowptr
    [i+1] is safe: the operator pads ``blocks`` with Lmax zero blocks
    (BlockSparseLaplacian.row_max).  x tiles stay per-block (their
    columns are scattered), pipelined NBUF deep as before.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    nbr = pl.num_programs(0)
    lo = row_ptr_ref[i]
    hi = row_ptr_ref[i + 1]

    def slab_dma(row, slot):
        return pltpu.make_async_copy(
            blocks_ref.at[pl.ds(row_ptr_ref[row], Lmax)],
            bslab_ref.at[slot],
            bsem.at[slot],
        )

    def x_dma(b, slot):
        col = cols_ref[b]
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(col * bc, bc), pl.ds(j * tc, tc)],
            xbuf_ref.at[slot],
            xsem.at[slot],
        )

    # Row slab: started one row ahead (at the row's first column step),
    # waited at this row's first column step; later column steps reuse
    # the resident slab.
    @pl.when(j == 0)
    def _():
        @pl.when(i == 0)
        def _():
            slab_dma(0, 0).start()

        @pl.when(i + 1 < nbr)
        def _():
            slab_dma(i + 1, jax.lax.rem(i + 1, 2)).start()

        slab_dma(i, jax.lax.rem(i, 2)).wait()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for d in range(NBUF - 1):
        @pl.when(lo + d < hi)
        def _(d=d):
            x_dma(lo + d, jax.lax.rem(jnp.int32(d), NBUF)).start()

    islot = jax.lax.rem(i, 2)

    def body(b, _):
        slot = jax.lax.rem(b - lo, NBUF)
        ahead = b + NBUF - 1

        @pl.when(ahead < hi)
        def _():
            x_dma(ahead, jax.lax.rem(ahead - lo, NBUF)).start()

        x_dma(b, slot).wait()
        acc_ref[:] += jnp.dot(
            bslab_ref[islot, b - lo], xbuf_ref[slot],
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(lo, hi, body, 0)
    y_ref[:] = acc_ref[:].astype(y_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bsr_spmm(L, x: jax.Array, col_tile: int = 512,
             interpret: bool = False) -> jax.Array:
    """``L @ x`` for a BlockSparseLaplacian with block-CSR row pointers.

    ``x``: [Mp, C]; C is padded to a multiple of the column tile.
    Differentiable via a custom VJP (``dx = L @ g`` — the rescaled
    Laplacian is symmetric); Pallas kernels have no automatic JVP rule.
    The operator is a differentiable argument with zero cotangents (it
    may carry tracers when threaded through jit, which nondiff_argnums
    cannot accept).
    """
    return _bsr_spmm_impl(L, x, col_tile, interpret)


def _bsr_fwd(L, x, col_tile, interpret):
    return _bsr_spmm_impl(L, x, col_tile, interpret), L


def _bsr_bwd(col_tile, interpret, L, g):
    from cnn_graph_tpu.ops.laplacian import zero_cotangent

    return zero_cotangent(L), _bsr_spmm_impl(L, g, col_tile, interpret)


def _bsr_spmm_impl(L, x: jax.Array, col_tile: int = 512,
                   interpret: bool = False) -> jax.Array:
    br, bc = L.block_shape
    mp = L.m_padded
    nbr = mp // br
    C = x.shape[1]
    tc = min(col_tile, max(128, -(-C // 128) * 128))
    cp = -(-C // tc) * tc
    if cp != C:
        x = jnp.pad(x, ((0, 0), (0, cp - C)))

    chunked = getattr(L, "row_max", 0) > 0
    if chunked:
        kernel = functools.partial(_kernel_chunked, br=br, bc=bc, tc=tc,
                                   Lmax=L.row_max)
        block_scratch = pltpu.VMEM((2, L.row_max, br, bc), L.blocks.dtype)
        bsem_shape = (2,)
    else:
        kernel = functools.partial(_kernel, br=br, bc=bc, tc=tc)
        block_scratch = pltpu.VMEM((NBUF, br, bc), L.blocks.dtype)
        bsem_shape = (NBUF,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbr, cp // tc),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # blocks stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (br, tc), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((br, tc), jnp.float32),        # accumulator
            block_scratch,                            # block slab/pipeline
            pltpu.VMEM((NBUF, bc, tc), x.dtype),         # x-tile pipeline
            pltpu.SemaphoreType.DMA(bsem_shape),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, cp), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * L.blocks.shape[0] * br * bc * tc * (cp // tc),
            bytes_accessed=(
                L.blocks.size * L.blocks.dtype.itemsize
                + 2 * mp * cp * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
    )(L.block_rowptr, L.block_cols, L.blocks, x)
    return y[:, :C]


bsr_spmm.defvjp(_bsr_fwd, _bsr_bwd)
