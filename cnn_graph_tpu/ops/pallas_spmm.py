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

__all__ = ["bsr_spmm", "bsr_call_quant"]


NBUF = 4  # DMA pipeline depth: per-block transfers are small (~tens of
# KB), so latency only hides behind compute with several copies in flight.


def _kernel_grouped(row_ptr_ref, cols_ref, blocks_ref, x_ref, *rest,
                    br, bc, tc, G, Lg, hop, band_scale):
    """Grouped-row BSR kernel: G consecutive block-rows per grid step.

    The per-block pipeline (``_kernel``) pays its fixed costs — DMA
    start/wait bookkeeping and scalar reads — PER BLOCK (~140 ns on top
    of the ~105 ns MXU tap at C=512 bf16, the "246 ns/block" of
    DESIGN.md §17).  Here the G rows' blocks, contiguous in block-CSR
    order, arrive as ONE double-buffered slab DMA of the static max
    group extent ``Lg`` (the operator pads ``blocks`` with Lg zero
    blocks so the overrun is safe), and the x-tile pipeline runs
    uninterrupted across row boundaries within the group — the banded
    kernel's amortization lesson applied to scattered graphs.

    ``band_scale`` enables the int8 path (int8 tiles x int8 x, int32
    accumulation, dequant/requant at emission in input-scale units);
    ``hop`` adds the fused Chebyshev update ``y = 2 (L @ x) - x0``.
    Emission is shared with the banded kernels (``_emit_row``).
    """
    from cnn_graph_tpu.ops.pallas_band import _emit_row

    if hop:
        x0_ref, y_ref, bslab, xbuf, bsem, xsem = rest
    else:
        y_ref, bslab, xbuf, bsem, xsem = rest
        x0_ref = None
    quant = band_scale is not None
    acc_dt = jnp.int32 if quant else jnp.float32
    s = pl.program_id(0)
    j = pl.program_id(1)
    nsb = pl.num_programs(0)
    lo_s = row_ptr_ref[s * G]
    hi_s = row_ptr_ref[(s + 1) * G]

    def slab_dma(step, slot):
        return pltpu.make_async_copy(
            blocks_ref.at[pl.ds(row_ptr_ref[step * G], Lg)],
            bslab.at[slot],
            bsem.at[slot],
        )

    # Block slab: double-buffered across grid steps, resident across
    # column tiles (fetched at each step's first column tile only).
    @pl.when(j == 0)
    def _():
        @pl.when(s == 0)
        def _():
            slab_dma(0, 0).start()

        @pl.when(s + 1 < nsb)
        def _():
            slab_dma(s + 1, jax.lax.rem(s + 1, 2)).start()

        slab_dma(s, jax.lax.rem(s, 2)).wait()

    islot = jax.lax.rem(s, 2)

    def x_dma(b, slot):
        col = cols_ref[b]
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(col * bc, bc), pl.ds(j * tc, tc)],
            xbuf.at[slot],
            xsem.at[slot],
        )

    # Warm the x pipeline across the whole group's flat block extent;
    # it then runs uninterrupted across row boundaries.
    for d in range(NBUF - 1):
        @pl.when(lo_s + d < hi_s)
        def _(d=d):
            x_dma(lo_s + d, jax.lax.rem(jnp.int32(d), NBUF)).start()

    for g in range(G):
        lo = row_ptr_ref[s * G + g]
        hi = row_ptr_ref[s * G + g + 1]

        def body(b, acc):
            ahead = b + NBUF - 1

            @pl.when(ahead < hi_s)
            def _():
                x_dma(ahead, jax.lax.rem(ahead - lo_s, NBUF)).start()

            slot = jax.lax.rem(b - lo_s, NBUF)
            x_dma(b, slot).wait()
            return acc + jnp.dot(
                bslab[islot, b - lo_s], xbuf[slot],
                preferred_element_type=acc_dt,
            )

        acc = jax.lax.fori_loop(lo, hi, body, jnp.zeros((br, tc), acc_dt))
        _emit_row(y_ref, x0_ref, None, acc, g, br, hop, quant, band_scale)


def _kernel_colstream(groupptr_ref, meta_ref, gcols_ref, gcolptr_ref,
                      blocks_ref, x_ref, *rest, br, bc, tc, G, CH, U,
                      hop, band_scale):
    """Column-streamed grouped BSR with an UNROLLED block walk.

    Two measured facts shape this kernel (DESIGN.md §20): (1) the
    per-block pipeline's flat ~250 ns/block is the scalar-core cost of
    one dynamic ``fori`` iteration per block (loopcost probe: ~229 ns/
    iteration; 8 static dots per iteration run at 196 TF/s);
    (2) per-block x-tile fetches are most of scattered BSR's HBM
    traffic.  So: each G-row group's blocks are ordered (column, row)
    and padded to a multiple of ``U`` host-side
    (``ops.laplacian.colstream_pack``); the walk processes ``U`` blocks
    per iteration (pad blocks are zero with meta 0 — they add
    nothing), each DISTINCT column's x tile is fetched once per group,
    and blocks stream as ``CH``-block contiguous double-buffered
    chunks (``CH`` a multiple of ``U`` so chunk transitions happen at
    bundle boundaries).  Per-row accumulators live in one ``[G*br,
    tc]`` VMEM scratch updated at the block's row-within-group offset.

    ``band_scale`` enables the int8 path; ``hop`` the fused Chebyshev
    update — both folded into the single whole-group emission.
    """
    if hop:
        x0_ref, y_ref, bchunk, xbuf, acc_ref, bsem, xsem = rest
    else:
        y_ref, bchunk, xbuf, acc_ref, bsem, xsem = rest
        x0_ref = None
    quant = band_scale is not None
    acc_dt = jnp.int32 if quant else jnp.float32
    NBX = U + 1  # x-tile ring: a bundle can consume up to U columns
    # PLUS the carry-over column from the previous bundle; lookahead
    # starts are deferred to after the dots, so U+1 slots suffice.
    s = pl.program_id(0)
    j = pl.program_id(1)
    lo = groupptr_ref[s]
    hi = groupptr_ref[s + 1]
    clo = gcolptr_ref[s]
    chi = gcolptr_ref[s + 1]

    def chunk_dma(k, slot):
        return pltpu.make_async_copy(
            blocks_ref.at[pl.ds(lo + k * CH, CH)], bchunk.at[slot],
            bsem.at[slot],
        )

    def x_dma(ci, slot):
        col = gcols_ref[ci]
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(col * bc, bc), pl.ds(j * tc, tc)],
            xbuf.at[slot],
            xsem.at[slot],
        )

    @pl.when(lo < hi)
    def _():
        chunk_dma(0, 0).start()

    for d in range(NBX - 1):
        @pl.when(clo + d < chi)
        def _(d=d):
            x_dma(clo + d, jax.lax.rem(jnp.int32(d), NBX)).start()

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(t, carry):
        last_ci, cur_k = carry
        r0 = t * U
        k = r0 // CH

        # Chunk transitions happen at bundle boundaries (CH % U == 0):
        # entering a new chunk waits it and starts the next.
        @pl.when(k > cur_k)
        def _():
            chunk_dma(k, jax.lax.rem(k, 2)).wait()

            @pl.when((k + 1) * CH < hi - lo)
            def _():
                chunk_dma(k + 1, jax.lax.rem(k + 1, 2)).start()

        kslot = jax.lax.rem(k, 2)

        # Column waits hoisted OUT of the dot walk: within a bundle the
        # column slot is nondecreasing, so the bundle's LAST meta is its
        # column high-water mark (pads carry the last real slot).  The
        # U-dot walk is then branch-free — scalar-serialized per-block
        # branches were the flat ~229 ns/iteration the loopcost probe
        # measured.  Lookahead STARTS are deferred to after the dots:
        # starting column c overwrites ring slot (c - NBX), which the
        # dots may still need if done eagerly (the bundle reads columns
        # in [last_ci, ci_hi] and NBX = U + 1 exactly covers them).
        ci_hi = clo + (meta_ref[lo + r0 + U - 1] & 0xFFFF)

        jax.lax.fori_loop(
            last_ci + 1, ci_hi + 1,
            lambda c, _: (x_dma(c, jax.lax.rem(c - clo, NBX)).wait(),
                          0)[1],
            0,
        )

        for d in range(U):
            meta = meta_ref[lo + r0 + d]
            g = jax.lax.shift_right_logical(meta, 16)
            ci_b = clo + (meta & 0xFFFF)
            tap = jnp.dot(
                bchunk[kslot, r0 + d - k * CH],
                xbuf[jax.lax.rem(ci_b - clo, NBX)],
                preferred_element_type=acc_dt,
            )
            acc_ref[pl.ds(g * br, br), :] += tap

        def scol(c, _):
            ahead = c + NBX - 1

            @pl.when(ahead < chi)
            def _():
                x_dma(ahead, jax.lax.rem(ahead - clo, NBX)).start()

            return 0

        jax.lax.fori_loop(last_ci + 1, ci_hi + 1, scol, 0)
        return ci_hi, k

    jax.lax.fori_loop(0, (hi - lo) // U, body,
                      (clo - 1, jnp.int32(-1)))

    acc = acc_ref[:]
    if quant:
        y = band_scale * acc.astype(jnp.float32)
        if hop:
            y = 2.0 * y - x0_ref[:].astype(jnp.float32)
        y_ref[:] = jnp.clip(jnp.round(y), -127.0, 127.0).astype(
            y_ref.dtype
        )
    else:
        if hop:
            acc = 2.0 * acc - x0_ref[:].astype(jnp.float32)
        y_ref[:] = acc.astype(y_ref.dtype)


def _colstream_call(L, x, x0=None, col_tile: int = 512,
                    interpret: bool = False,
                    band_scale: float | None = None):
    """Invoke the column-streamed kernel on a col_stream-packed
    (Quant)BlockSparseLaplacian."""
    from cnn_graph_tpu.ops.laplacian import (
        COLSTREAM_CHUNK,
        COLSTREAM_UNROLL,
    )

    br, bc = L.block_shape
    mp = L.m_padded
    G = L.rows_per_step
    CH = COLSTREAM_CHUNK
    U = COLSTREAM_UNROLL
    nsb = mp // br // G
    C = x.shape[1]
    tc = min(col_tile, max(128, -(-C // 128) * 128))
    cp = -(-C // tc) * tc
    if cp != C:
        x = jnp.pad(x, ((0, 0), (0, cp - C)))
        if x0 is not None:
            x0 = jnp.pad(x0, ((0, 0), (0, cp - C)))
    hop = x0 is not None

    row_block = pl.BlockSpec(
        (G * br, tc), lambda s, j, *_: (s, j), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # blocks stay in HBM
        pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
    ]
    if hop:
        in_specs.append(row_block)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nsb, cp // tc),
        in_specs=in_specs,
        out_specs=row_block,
        scratch_shapes=[
            pltpu.VMEM((2, CH, br, bc), L.blocks.dtype),   # block chunks
            pltpu.VMEM((U + 1, bc, tc), x.dtype),          # x-tile ring
            pltpu.VMEM((G * br, tc),
                       jnp.int32 if band_scale is not None
                       else jnp.float32),                  # accumulators
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((U + 1,)),
        ],
    )
    nb = int(L.block_cols.shape[0])
    operands = (L.cs_groupptr, L.cs_meta, L.cs_gcols, L.cs_gcolptr,
                L.blocks, x) + ((x0,) if hop else ())
    y = pl.pallas_call(
        functools.partial(_kernel_colstream, br=br, bc=bc, tc=tc, G=G,
                          CH=CH, U=U, hop=hop, band_scale=band_scale),
        out_shape=jax.ShapeDtypeStruct((mp, cp), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * br * bc * cp,
            bytes_accessed=(
                nb * br * bc * L.blocks.dtype.itemsize
                + (3 if hop else 2) * mp * cp * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
    )(*operands)
    return y[:, :C]


def _grouped_call(L, x, x0=None, col_tile: int = 512,
                  interpret: bool = False,
                  band_scale: float | None = None):
    """Invoke the grouped-row kernel on a (Quant)BlockSparseLaplacian."""
    br, bc = L.block_shape
    mp = L.m_padded
    G = L.rows_per_step
    Lg = L.group_max
    assert Lg > 0, "grouped kernel needs the slab zero-pad (group_max)"
    nsb = mp // br // G
    C = x.shape[1]
    tc = min(col_tile, max(128, -(-C // 128) * 128))
    cp = -(-C // tc) * tc
    if cp != C:
        x = jnp.pad(x, ((0, 0), (0, cp - C)))
        if x0 is not None:
            x0 = jnp.pad(x0, ((0, 0), (0, cp - C)))
    hop = x0 is not None

    row_block = pl.BlockSpec(
        (G * br, tc), lambda s, j, *_: (s, j), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # blocks stay in HBM
        pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
    ]
    if hop:
        in_specs.append(row_block)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsb, cp // tc),
        in_specs=in_specs,
        out_specs=row_block,
        scratch_shapes=[
            pltpu.VMEM((2, Lg, br, bc), L.blocks.dtype),  # block slabs
            pltpu.VMEM((NBUF, bc, tc), x.dtype),          # x-tile pipeline
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    nb = int(L.block_cols.shape[0])
    operands = (L.block_rowptr, L.block_cols, L.blocks, x) + (
        (x0,) if hop else ()
    )
    y = pl.pallas_call(
        functools.partial(_kernel_grouped, br=br, bc=bc, tc=tc, G=G,
                          Lg=Lg, hop=hop, band_scale=band_scale),
        out_shape=jax.ShapeDtypeStruct((mp, cp), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * br * bc * cp,
            bytes_accessed=(
                nb * br * bc * L.blocks.dtype.itemsize
                + (3 if hop else 2) * mp * cp * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
    )(*operands)
    return y[:, :C]


def _bsr_apply(L, x, x0, col_tile, interpret):
    """Route to the column-streamed or slab-grouped kernel by layout."""
    if getattr(L, "col_stream", False):
        return _colstream_call(L, x, x0, col_tile, interpret)
    return _grouped_call(L, x, x0, col_tile, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bsr_cheby_hop(L, x1: jax.Array, x0: jax.Array, col_tile: int = 512,
                  interpret: bool = False) -> jax.Array:
    """Fused Chebyshev hop ``y = 2 (L @ x1) - x0`` through the grouped
    or column-streamed BSR kernel — one pass instead of SpMM + a
    separate 3-transfer XLA elementwise update (the same fusion the
    banded kernel ships, DESIGN.md §10).  Symmetric-adjoint VJP:
    ``dx1 = 2 L g``, ``dx0 = -g``; the operator rides as a
    differentiable argument with zero cotangents."""
    return _bsr_apply(L, x1, x0, col_tile, interpret)


def _bsr_hop_fwd(L, x1, x0, col_tile, interpret):
    return _bsr_apply(L, x1, x0, col_tile, interpret), L


def _bsr_hop_bwd(col_tile, interpret, L, g):
    from cnn_graph_tpu.ops.laplacian import zero_cotangent

    dx1 = 2.0 * _bsr_spmm_impl(L, g, col_tile, interpret)
    return zero_cotangent(L), dx1, -g


bsr_cheby_hop.defvjp(_bsr_hop_fwd, _bsr_hop_bwd)


def bsr_call_quant(L, x_q: jax.Array, x0_q: jax.Array | None = None,
                   col_tile: int = 512,
                   interpret: bool = False) -> jax.Array:
    """Int8 BSR SpMM / fused hop for a QuantBlockSparseLaplacian:
    int8 tiles x int8 activations, int32 accumulation, dequant/requant
    at emission in input-scale units (same arithmetic as the XLA
    fallback in ops/laplacian.py, bit-exactly).  Inference-only."""
    if getattr(L, "col_stream", False):
        return _colstream_call(L, x_q, x0_q, col_tile, interpret,
                               band_scale=L.block_scale)
    return _grouped_call(L, x_q, x0_q, col_tile, interpret,
                         band_scale=L.block_scale)


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
    if getattr(L, "col_stream", False):
        # Column-streamed kernel: x-tile reuse across each row-group
        # (see _kernel_colstream) — the scattered-graph path.
        return _colstream_call(L, x, None, col_tile, interpret)
    if getattr(L, "rows_per_step", 1) > 1:
        # Grouped-row slab kernel: amortizes per-block fixed costs over
        # G block-rows per grid step (see _kernel_grouped).
        return _grouped_call(L, x, None, col_tile, interpret)
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
