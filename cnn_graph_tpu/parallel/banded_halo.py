"""Banded halo-exchange operator: row-sharded banded SpMM whose
communication is two neighbor ``ppermute`` shifts on the ICI ring.

The block-banded structure that makes the single-chip kernel fast
(ops/pallas_band.py) also collapses the multi-chip exchange problem:
after RCM ordering, shard ``s``'s band only references x rows owned by
shards ``s-1`` and ``s+1`` (a contiguous tail/head of each).  So instead
of the general all_to_all exchange plan (parallel/halo.py,
parallel/sparse_halo.py), each Chebyshev hop moves exactly

    left halo  = last  h_l block-rows of the LEFT  neighbor  (shift +1)
    right halo = first h_r block-rows of the RIGHT neighbor  (shift -1)

— two ``lax.ppermute`` calls whose pattern maps 1:1 onto the TPU ICI
ring (SURVEY.md §2.3's "lay out shardings so collectives ride ICI").
Edge shards receive zeros from the unpaired side, which their band never
references (their windows are interior by construction).

Per shard the compute is the banded Pallas kernel itself
(ops.pallas_band.banded_call) on the extended activations
``[left | local | right]`` — same fused Chebyshev hop, same sliding
x-window; the halo blocks simply extend the window space.  On CPU (and
under the driver's virtual mesh) the XLA gather/einsum fallback runs the
identical math.

Reference parity note: the reference has no distributed execution at all
(SURVEY.md §2.3); this operator is part of the framework's TPU-native
scaling layer alongside NodeSharded (all-gather), HaloSharded (dense
all_to_all) and SparseHalo (block-sparse all_to_all).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cnn_graph_tpu.graphs.construction import rescale_laplacian
from cnn_graph_tpu.ops.laplacian import (
    ChebyHopMixin,
    QuantOpMixin,
    auto_rows_per_step,
    band_stats,
    pack_banded,
    zero_cotangent,
)

__all__ = ["BandedHaloLaplacian", "QuantBandedHaloLaplacian",
           "banded_halo_laplacian", "quantize_banded_halo"]

MXU_TILE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["band", "base", "sched", "sched_int", "sched_suf",
                 "bands_dkw", "sched_dkw", "sched_dkw_int",
                 "sched_dkw_suf"],
    meta_fields=["mesh", "m", "m_padded", "nnz", "halo_left", "halo_right",
                 "rows_per_shard", "block_shape", "ring_slots",
                 "rows_per_step", "use_pallas", "boundary_pre",
                 "boundary_suf", "overlap", "levels"],
)
@dataclasses.dataclass(frozen=True)
class BandedHaloLaplacian(ChebyHopMixin):
    """Row-sharded banded Laplacian with neighbor-ring halo exchange.

    ``band``: [n, nbr_s, W, br, bc] (sharded P('nodes')); ``base``:
    [n, nbr_s] block-column window bases INTO THE EXTENDED column space
    ``[left halo | local | right halo]`` of each shard (monotone per
    shard, as the kernel requires).

    ``boundary_pre`` / ``boundary_suf`` split each shard's block-rows
    into a halo-touching prefix/suffix and a halo-free interior (both
    multiples of the kernel's rows-per-step G, max'd across shards).
    With ``overlap=True`` the interior SpMM is issued with NO data
    dependence on the ppermute results, so XLA's latency-hiding
    scheduler can run the neighbor exchange behind it (SURVEY.md §2.3
    "overlapping exchange with local SpMM"); only the small
    prefix/suffix passes wait for the halo.
    """

    band: jax.Array
    base: jax.Array
    mesh: Mesh
    m: int
    m_padded: int
    nnz: int
    halo_left: int    # block-rows received from the left neighbor
    halo_right: int   # block-rows received from the right neighbor
    rows_per_shard: int
    block_shape: tuple
    ring_slots: int
    rows_per_step: int
    use_pallas: bool
    boundary_pre: int = 0   # halo-touching prefix block-rows (multiple of G)
    boundary_suf: int = 0   # halo-touching suffix block-rows (multiple of G)
    overlap: bool = False   # interior/boundary split for comm overlap
    # Ragged per-super-step band widths (DESIGN.md S19): the band is the
    # FLAT per-shard layout [n, total_max, br, bc] and the int32
    # schedules [n, 3, nsb] carry (flat offsets, level idx, column
    # high-water) — extended coords for the full/prefix passes
    # (``sched``), interior-local coords (``sched_int``) and a
    # region-prefix-max suffix variant (``sched_suf``).  Empty levels =
    # the uniform layout.
    levels: tuple = ()
    sched: jax.Array | None = None
    sched_int: jax.Array | None = None
    sched_suf: jax.Array | None = None
    # Deep-K window twin layout (DESIGN.md §20), per shard: one sharded
    # array per width level [n, rows_l, br, W_l*bc] and region
    # schedules whose row 0 holds per-level ROW offsets.  When present,
    # every Pallas region pass runs `banded_call_dkw` (one wide MXU dot
    # per block-row) instead of the tap-loop ragged kernel.
    bands_dkw: tuple | None = None
    sched_dkw: jax.Array | None = None
    sched_dkw_int: jax.Array | None = None
    sched_dkw_suf: jax.Array | None = None

    @property
    def compute_dtype(self):
        return self.band.dtype

    @property
    def band_width(self):
        return self.levels[-1] if self.levels else self.band.shape[2]

    def matmul(self, x: jax.Array) -> jax.Array:
        """``L @ x`` for ``x`` [Mp, C] sharded P('nodes', None)."""
        return _banded_halo_matmul(self, x)

    def cheby_hop(self, x1: jax.Array, x0: jax.Array) -> jax.Array:
        """Fused recurrence hop ``2 (L @ x1) - x0`` (one kernel pass per
        shard; x0 is row-aligned with the output so it rides the same
        sharding)."""
        return _banded_halo_hop(self, x1, x0)

    def cheby_chain(self, x: jax.Array, K: int) -> jax.Array:
        """The stacked K-term Chebyshev basis ``[K, Mp, C]`` with ALL
        hops (ppermutes included) inside ONE shard_map region — one
        dispatch per chain instead of per SpMM (the per-hop wrapper
        bound caps strong scaling; BASELINE.md).  Differentiable: the
        adjoint recurrence runs as one region too.  Bit-exact with the
        per-hop path."""
        return _banded_halo_chain(self, x, K)

    # ---- shard-local implementation ----

    def _apply_impl(self, x: jax.Array, x0: jax.Array | None) -> jax.Array:
        return _apply_sharded(self, x, x0)


def _ragged_from_uniform(band, base_local, h_l, h_r, G, pre, suf,
                         max_levels: int = 4):
    """Derive per-shard ragged flat bands + int32 schedules from the
    uniform per-shard band ``[n, nbr_s, W, br, bc]`` (host-side numpy).

    Returns ``(levels, flat[n, total_max, br, bc], sched[n, 3, nsb],
    sched_int[n, 3, int_sb], sched_suf[n, 3, suf_sb], ring)``.  The
    schedules carry (flat-band block offset, level index, monotone
    column high-water) per super-step: ``sched`` in EXTENDED local
    coords (valid for the full pass and, as a prefix slice, the
    boundary-prefix pass — its running max starts at step 0 either
    way), ``sched_int`` over the interior steps only with bases
    shifted to x_local coords (-h_l), ``sched_suf`` over the suffix
    steps with the running max restarted there.  Levels are chosen
    once across ALL shards so every shard compiles the same kernel;
    ring is the max collision span over every region/shard.
    """
    from cnn_graph_tpu.ops.laplacian import choose_band_levels
    from cnn_graph_tpu.ops.pallas_band import PREFETCH_AHEAD

    n, nbr_s, W, br, bc = band.shape
    assert nbr_s % G == 0
    nsb = nbr_s // G
    n_cb_ext = nbr_s + h_l + h_r  # square blocks: col blocks == row blocks

    # Per-row true span from the rightmost nonzero block (>= 1).
    nz = band.reshape(n, nbr_s, W, -1).any(axis=3)
    has = nz.any(axis=2)
    dmax = W - 1 - np.argmax(nz[:, :, ::-1], axis=2)
    span = np.where(has, dmax + 1, 1).astype(np.int64)

    ws = span.reshape(n, nsb, G).max(axis=2)            # [n, nsb]
    levels = choose_band_levels(ws.reshape(-1), max_levels)
    lv = np.asarray(levels, np.int64)
    lvl_idx = np.searchsorted(lv, ws)                   # [n, nsb]
    wl = lv[lvl_idx]

    offs = np.zeros((n, nsb), np.int64)
    offs[:, 1:] = np.cumsum(G * wl, axis=1)[:, :-1]
    total_max = int((G * wl).sum(axis=1).max())
    flat = np.zeros((n, total_max, br, bc), band.dtype)
    for s in range(n):
        for t_ in range(nsb):
            L_ = int(wl[s, t_])
            o = int(offs[s, t_])
            flat[s, o:o + G * L_] = (
                band[s, t_ * G:(t_ + 1) * G, :L_].reshape(G * L_, br, bc)
            )

    base64 = base_local.astype(np.int64)

    def hw_of(base_rows, lo, hi, col_count):
        """Running max of (step's last-row base + level) over steps
        [lo, hi), restarted at lo, clamped to col_count."""
        last_rows = (np.arange(lo, hi) + 1) * G - 1
        step_hi = base_rows[:, last_rows] + wl[:, lo:hi]
        return np.minimum(np.maximum.accumulate(step_hi, axis=1),
                          col_count)

    def sched_of(lo, hi, hw):
        return np.stack([
            np.broadcast_to(offs[:, lo:hi], hw.shape),
            np.broadcast_to(lvl_idx[:, lo:hi], hw.shape),
            hw,
        ], axis=1).astype(np.int32)                      # [n, 3, hi-lo]

    def ring_of(base_rows, lo, hi, hw):
        """Max live-column span with PA lookahead over the region."""
        steps = hi - lo
        idx = np.minimum(np.arange(steps) + PREFETCH_AHEAD, steps - 1)
        started = hw[:, idx]
        in_use = base_rows[:, (np.arange(lo, hi)) * G]
        return int((started - in_use).max()) + 1

    pre_sb, suf_sb = pre // G, suf // G
    hw_full = hw_of(base64, 0, nsb, n_cb_ext)
    sched = sched_of(0, nsb, hw_full)
    rings = [ring_of(base64, 0, nsb, hw_full)]
    if pre_sb:
        rings.append(ring_of(base64, 0, pre_sb, hw_full[:, :pre_sb]))

    int_lo, int_hi = pre_sb, nsb - suf_sb
    if int_hi > int_lo and (pre_sb or suf_sb):
        base_int = base64 - h_l
        hw_int = hw_of(base_int, int_lo, int_hi, nbr_s)
        sched_int = sched_of(int_lo, int_hi, hw_int)
        rings.append(ring_of(base_int, int_lo, int_hi, hw_int))
    else:
        sched_int = sched[:, :, :1]  # unused placeholder
    if suf_sb:
        hw_suf = hw_of(base64, nsb - suf_sb, nsb, n_cb_ext)
        sched_suf = sched_of(nsb - suf_sb, nsb, hw_suf)
        rings.append(ring_of(base64, nsb - suf_sb, nsb, hw_suf))
    else:
        sched_suf = sched[:, :, :1]  # unused placeholder

    return levels, flat, sched, sched_int, sched_suf, max(rings)


def _dkw_per_shard(flat, sched_np, levels, G, br, bc):
    """Per-shard deep-K-window repack of the flat ragged bands.

    Runs ``ops.pallas_band.pack_dkw_from_ragged`` per shard, pads each
    level's row count to the max across shards (zero rows — schedules
    never reference them) and returns ``(bands, row0)`` where
    ``bands[l]`` is ``[n, rows_l_max, br, W_l*bc]`` and ``row0`` is the
    per-shard dkw schedule row 0 (per-level ROW offsets) to substitute
    into the region schedules."""
    from cnn_graph_tpu.ops.pallas_band import pack_dkw_from_ragged

    n = flat.shape[0]
    nl = len(levels)
    per = []
    for s in range(n):
        sch = (sched_np[s, 0], sched_np[s, 1], sched_np[s, 2])
        bands_s, sd = pack_dkw_from_ragged(flat[s], sch, levels, G,
                                           br, bc)
        per.append((bands_s, sd))
    rows_max = [max(p[0][i].shape[0] for p in per) for i in range(nl)]
    bands = [
        np.zeros((n, rows_max[i], br, levels[i] * bc), flat.dtype)
        for i in range(nl)
    ]
    row0 = np.zeros((n, sched_np.shape[2]), np.int32)
    for s, (bs, sd) in enumerate(per):
        for i in range(nl):
            bands[i][s, : bs[i].shape[0]] = bs[i]
        row0[s] = sd[0]
    return bands, row0


def _exchange_parts(op, x_local):
    """Start the neighbor ppermutes; return [left?, x_local, right?]
    WITHOUT concatenating, so callers can place compute between the
    collective launch and its first use.  Unpaired edge shards
    receive zeros (their band never reads that region)."""
    n = op.mesh.shape["nodes"]
    br = op.block_shape[0]  # halo extents are block-ROWS of x
    parts = []
    if op.halo_left:
        tail = x_local[-op.halo_left * br:]
        parts.append(
            jax.lax.ppermute(tail, "nodes",
                             [(i, i + 1) for i in range(n - 1)])
        )
    parts.append(x_local)
    if op.halo_right:
        head = x_local[: op.halo_right * br]
        parts.append(
            jax.lax.ppermute(head, "nodes",
                             [(i + 1, i) for i in range(n - 1)])
        )
    return parts


def _shard_hop(op, band, base, x_local, x0_local,
               band_scale: float | None, scheds=None):
    """One shard-local fused hop: neighbor exchange + banded pass.

    ``band``/``base`` are the unwrapped per-shard slices; runs inside a
    ``shard_map`` region.  ``band_scale`` switches on the quantized
    path: int8 band x int8 activations, int32 window taps,
    dequant/requant at emission — the same integer arithmetic as
    ``QuantBandedLaplacian._call``, so the sharded chain is bit-exact
    with the single-chip one.  The halo ppermutes then move int8
    payloads: HALF the ICI bytes per hop of the bf16 training operator
    (DESIGN.md §13).

    With ``op.levels`` set the band is the per-shard RAGGED flat layout
    and ``scheds=(sched, sched_int, sched_suf)`` are the unwrapped
    per-shard schedules (see ``_ragged_from_uniform``); each region's
    pass runs ``banded_call_ragged`` against the WHOLE flat band (the
    schedule's offsets address it), so no band slicing is needed.
    """
    ms = op.rows_per_shard
    quant = band_scale is not None
    ragged = bool(op.levels)
    br = op.block_shape[0]
    if ragged:
        (sched_full, sched_int, sched_suf, *dkw) = scheds
        dkw = dkw[0] if dkw else None  # (sdk, sdi, sds, bands) | None
        G = op.rows_per_step
        nbr_s = ms // br
    else:
        nbr_s, _W, br, _bc = band.shape

    def run(bslice, baseslice, xarr, x0slice, out_rows):
        """One UNIFORM banded pass on a row sub-range (Pallas on TPU, an
        accumulator-exact einsum oracle elsewhere)."""
        if op.use_pallas:
            from cnn_graph_tpu.ops.pallas_band import banded_call

            return banded_call(
                bslice, baseslice, xarr, x0slice,
                ring=op.ring_slots, G=op.rows_per_step,
                out_rows=out_rows, band_scale=band_scale,
            ).astype(x_local.dtype)
        _nb, W, _br, bc = bslice.shape
        xb = xarr.reshape(-1, bc, xarr.shape[1])
        cols = baseslice[:, None] + jnp.arange(W)[None, :]
        wins = jnp.take(xb, cols, axis=0)  # [rows, W, bc, C]
        return _emit(bslice, wins, x0slice, out_rows)

    def run_ragged(sched, baseslice, xarr, x0slice, out_rows,
                   sched_dkw=None, bands_dkw=None):
        """One RAGGED banded pass over the super-steps ``sched`` covers;
        offsets address the whole flat band.  With dkw operands the
        pass runs the deep-K window kernel instead (one wide MXU dot
        per block-row; DESIGN.md §20)."""
        if op.use_pallas and sched_dkw is not None:
            from cnn_graph_tpu.ops.pallas_band import banded_call_dkw

            return banded_call_dkw(
                bands_dkw, baseslice, sched_dkw, xarr, x0slice,
                levels=op.levels, ring=op.ring_slots, G=G,
                out_rows=out_rows, band_scale=band_scale,
            ).astype(x_local.dtype)
        if op.use_pallas:
            from cnn_graph_tpu.ops.pallas_band import banded_call_ragged

            return banded_call_ragged(
                band, baseslice, sched, xarr, x0slice,
                levels=op.levels, ring=op.ring_slots, G=G,
                out_rows=out_rows, band_scale=band_scale,
            ).astype(x_local.dtype)
        # Oracle: gather each row's lvl blocks from the flat band via the
        # schedule, zero-pad to the max level, and run the same
        # accumulator-exact einsum as the uniform path.
        lv = jnp.asarray(np.asarray(op.levels, np.int32))
        Wmax = int(op.levels[-1])
        rows = sched.shape[1] * G
        step = jnp.arange(rows) // G
        g = jnp.arange(rows) % G
        lvl = lv[sched[1]][step]                       # [rows]
        start = sched[0][step] + g * lvl               # [rows]
        d = jnp.arange(Wmax)[None, :]
        valid = d < lvl[:, None]
        idx = jnp.clip(start[:, None] + d, 0, band.shape[0] - 1)
        blocks = jnp.where(valid[:, :, None, None], band[idx], 0)
        bc = op.block_shape[1]
        xb = xarr.reshape(-1, bc, xarr.shape[1])
        cols = jnp.clip(baseslice[:, None] + d, 0, xb.shape[0] - 1)
        wins = jnp.take(xb, cols, axis=0)              # [rows, Wmax, bc, C]
        return _emit(blocks, wins, x0slice, out_rows)

    def _emit(bslice, wins, x0slice, out_rows):
        if quant:
            acc = jnp.einsum(
                "iwab,iwbc->iac", bslice, wins,
                preferred_element_type=jnp.int32,
            ).reshape(out_rows, -1)
            y = band_scale * acc.astype(jnp.float32)
            if x0slice is not None:
                y = 2.0 * y - x0slice.astype(jnp.float32)
            return jnp.clip(jnp.round(y), -127.0, 127.0).astype(
                x_local.dtype
            )
        y = jnp.einsum(
            "iwab,iwbc->iac", bslice.astype(x_local.dtype), wins,
            preferred_element_type=jnp.float32,
        ).reshape(out_rows, -1)
        if x0slice is not None:
            y = 2.0 * y - x0slice
        return y.astype(x_local.dtype)

    def x0_rows(lo, hi):
        return (None if x0_local is None
                else x0_local[lo * br:hi * br])

    parts = _exchange_parts(op, x_local)
    pre, suf = op.boundary_pre, op.boundary_suf
    interior = nbr_s - pre - suf
    if op.overlap and interior > 0 and (pre or suf):
        # Interior block-rows read only local columns: shift
        # their window bases out of the extended space and run
        # them against x_local — no dependence on the ppermute
        # results, so the exchange hides behind this pass.
        if ragged:
            y_int = run_ragged(
                sched_int, base[pre:pre + interior] - op.halo_left,
                x_local, x0_rows(pre, pre + interior), interior * br,
                sched_dkw=(dkw[1] if dkw else None),
                bands_dkw=(dkw[3] if dkw else None),
            )
        else:
            y_int = run(
                band[pre:pre + interior],
                base[pre:pre + interior] - op.halo_left,
                x_local, x0_rows(pre, pre + interior), interior * br,
            )
        x_ext = (jnp.concatenate(parts, axis=0)
                 if len(parts) > 1 else x_local)
        ys = []
        if pre:
            ys.append(
                run_ragged(sched_full[:, : pre // G], base[:pre], x_ext,
                           x0_rows(0, pre), pre * br,
                           sched_dkw=(dkw[0][:, : pre // G]
                                      if dkw else None),
                           bands_dkw=(dkw[3] if dkw else None))
                if ragged else
                run(band[:pre], base[:pre], x_ext,
                    x0_rows(0, pre), pre * br)
            )
        ys.append(y_int)
        if suf:
            ys.append(
                run_ragged(sched_suf, base[nbr_s - suf:], x_ext,
                           x0_rows(nbr_s - suf, nbr_s), suf * br,
                           sched_dkw=(dkw[2] if dkw else None),
                           bands_dkw=(dkw[3] if dkw else None))
                if ragged else
                run(band[nbr_s - suf:], base[nbr_s - suf:],
                    x_ext, x0_rows(nbr_s - suf, nbr_s), suf * br)
            )
        return jnp.concatenate(ys, axis=0)
    x_ext = (jnp.concatenate(parts, axis=0)
             if len(parts) > 1 else x_local)
    if ragged:
        return run_ragged(sched_full, base, x_ext, x0_local, ms,
                          sched_dkw=(dkw[0] if dkw else None),
                          bands_dkw=(dkw[3] if dkw else None))
    return run(band, base, x_ext, x0_local, ms)


def _sched_operands(op):
    """Schedule (+ dkw) operands shipped into every shard_map region."""
    ragged = bool(op.levels)
    ops_ = ()
    if ragged:
        ops_ = (op.sched, op.sched_int, op.sched_suf)
        if getattr(op, "bands_dkw", None) is not None:
            ops_ += (op.sched_dkw, op.sched_dkw_int,
                     op.sched_dkw_suf) + tuple(op.bands_dkw)
    return ragged, ops_, (P("nodes"),) * len(ops_)


def _unwrap_scheds(op, rest):
    """Split a region's tail args into (scheds-for-_shard_hop, rest).

    ``scheds`` is ``(sched, sched_int, sched_suf[, dkw])`` with the
    shard axis stripped; ``dkw = (sdk, sdi, sds, bands_list)``."""
    if not op.levels:
        return None, rest
    nl = len(op.levels)
    has_dkw = getattr(op, "bands_dkw", None) is not None
    n_s = 3 + (3 + nl if has_dkw else 0)
    s_ops, rem = rest[:n_s], rest[n_s:]
    scheds = (s_ops[0][0], s_ops[1][0], s_ops[2][0])
    if has_dkw:
        scheds = scheds + ((s_ops[3][0], s_ops[4][0], s_ops[5][0],
                            [b[0] for b in s_ops[6:]]),)
    return scheds, rem


def _apply_sharded(op, x: jax.Array, x0: jax.Array | None,
                   band_scale: float | None = None) -> jax.Array:
    """One sharded hop as its own shard_map region (see _shard_hop)."""

    def local(band, base, *rest):
        scheds, xs = _unwrap_scheds(op, rest)
        return _shard_hop(op, band[0], base[0], xs[0],
                          xs[1] if len(xs) > 1 else None, band_scale,
                          scheds=scheds)

    ragged, sched_ops, sched_specs = _sched_operands(op)
    operands = (op.band, op.base) + sched_ops + (x,) + (
        (x0,) if x0 is not None else ()
    )
    in_specs = (
        (P("nodes"), P("nodes")) + sched_specs + (P("nodes", None),)
        + ((P("nodes", None),) if x0 is not None else ())
    )
    # Fully-manual shard_map, like parallel/sparse_halo.py: the
    # whole-graph node models carry no batch dimension here.
    return jax.shard_map(
        local,
        mesh=op.mesh,
        in_specs=in_specs,
        out_specs=P("nodes", None),
        axis_names=set(op.mesh.axis_names),
        check_vma=False,
    )(*operands)


def _chain_sharded(op, x: jax.Array, K: int,
                   band_scale: float | None = None) -> jax.Array:
    """The WHOLE K-term Chebyshev basis in ONE shard_map region.

    Per-hop operators pay one dispatch (plus GSPMD entry/exit resharding)
    per SpMM — measured at ~8 us/spmm on the tunnel once slope-fit
    (BASELINE.md round-4).  Running all K-1 hops (ppermutes included)
    inside a single region amortizes even that per CHAIN — and lets the
    hop loop keep its carries in place, which measured FASTER than the
    per-hop plain kernel (DESIGN.md §17).  Returns the stacked basis
    ``[K, Mp, C]`` (sharded P(None, 'nodes', None)); bit-exact with the
    per-hop path (same per-shard arithmetic, same order)."""
    def local(band, base, *rest):
        scheds, xs = _unwrap_scheds(op, rest)
        (x_local,) = xs
        band, base = band[0], base[0]

        def hop(x1, x0):
            return _shard_hop(op, band, base, x1, x0, band_scale,
                              scheds=scheds)

        basis = [x_local]
        if K > 1:
            basis.append(_shard_hop(op, band, base, x_local, None,
                                    band_scale, scheds=scheds))
        for _ in range(2, K):
            basis.append(hop(basis[-1], basis[-2]))
        return jnp.stack(basis)

    ragged, sched_ops, sched_specs = _sched_operands(op)
    return jax.shard_map(
        local,
        mesh=op.mesh,
        in_specs=(P("nodes"), P("nodes")) + sched_specs
        + (P("nodes", None),),
        out_specs=P(None, "nodes", None),
        axis_names=set(op.mesh.axis_names),
        check_vma=False,
    )(op.band, op.base, *sched_ops, x)


def _adjoint_chain_sharded(op, g: jax.Array) -> jax.Array:
    """Adjoint of the K-term basis chain in ONE shard_map region.

    Given cotangents ``g`` [K, Mp, C] of the stacked basis, the reverse
    of the three-term recurrence is itself a three-term recurrence run
    backward (L symmetric):

        s_{K-1} = g_{K-1}
        s_{K-2} = g_{K-2} + 2 L s_{K-1}
        s_k     = g_k + 2 L s_{k+1} - s_{k+2}        (K-3 >= k >= 1)
        dx = s_0 = g_0 + L s_1 - s_2

    Every ``2 L s - s_prev`` is the same fused hop (+ the g_k add), so
    the adjoint costs exactly one forward chain plus one plain SpMM —
    all inside a single dispatch."""
    K = g.shape[0]

    def local(band, base, *rest):
        scheds, xs = _unwrap_scheds(op, rest)
        (g_local,) = xs
        band, base = band[0], base[0]

        def hop(x1, x0):
            return _shard_hop(op, band, base, x1, x0, None,
                              scheds=scheds)

        def spmm(v):
            return _shard_hop(op, band, base, v, None, None,
                              scheds=scheds)

        if K == 1:
            return g_local[0]
        if K == 2:
            return g_local[0] + spmm(g_local[1])
        # s_{K-2} = g_{K-2} + 2 L s_{K-1} (hop against a zero x0).
        s_next = g_local[K - 2] + hop(
            g_local[K - 1], jnp.zeros_like(g_local[K - 1])
        )
        s_next2 = g_local[K - 1]
        for k in range(K - 3, 0, -1):
            s_next, s_next2 = g_local[k] + hop(s_next, s_next2), s_next
        return g_local[0] + spmm(s_next) - s_next2

    ragged, sched_ops, sched_specs = _sched_operands(op)
    return jax.shard_map(
        local,
        mesh=op.mesh,
        in_specs=(P("nodes"), P("nodes")) + sched_specs
        + (P(None, "nodes", None),),
        out_specs=P("nodes", None),
        axis_names=set(op.mesh.axis_names),
        check_vma=False,
    )(op.band, op.base, *sched_ops, g)


@jax.custom_vjp
def _banded_halo_matmul(op, x):
    return op._apply_impl(x, None)


def _bhm_fwd(op, x):
    return op._apply_impl(x, None), op


def _bhm_bwd(op, g):
    # Global L is symmetric -> dx = L @ g, which is this same sharded
    # operator applied to the (identically sharded) cotangent.
    return zero_cotangent(op), op._apply_impl(g, None)


_banded_halo_matmul.defvjp(_bhm_fwd, _bhm_bwd)


@jax.custom_vjp
def _banded_halo_hop(op, x1, x0):
    return op._apply_impl(x1, x0)


def _bhh_fwd(op, x1, x0):
    return op._apply_impl(x1, x0), op


def _bhh_bwd(op, g):
    dx1 = 2.0 * op._apply_impl(g, None)
    return zero_cotangent(op), dx1.astype(g.dtype), -g


_banded_halo_hop.defvjp(_bhh_fwd, _bhh_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _banded_halo_chain(op, x, K):
    return _chain_sharded(op, x, K)


def _bhc_fwd(op, x, K):
    # The recurrence is linear in x: the adjoint needs no forward values,
    # only the operator.
    return _chain_sharded(op, x, K), op


def _bhc_bwd(K, op, g):
    return zero_cotangent(op), _adjoint_chain_sharded(op, g)


_banded_halo_chain.defvjp(_bhc_fwd, _bhc_bwd)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["band", "base", "sched", "sched_int", "sched_suf",
                 "bands_dkw", "sched_dkw", "sched_dkw_int",
                 "sched_dkw_suf"],
    meta_fields=["mesh", "m", "m_padded", "nnz", "halo_left", "halo_right",
                 "rows_per_shard", "block_shape", "ring_slots",
                 "rows_per_step", "use_pallas", "boundary_pre",
                 "boundary_suf", "overlap", "band_scale", "act_scale",
                 "headroom", "levels"],
)
@dataclasses.dataclass(frozen=True)
class QuantBandedHaloLaplacian(QuantOpMixin):
    """Int8-quantized row-sharded banded Laplacian — MULTI-CHIP serving.

    Same exchange plan and band geometry as :class:`BandedHaloLaplacian`
    (two neighbor ``ppermute`` shifts per hop), but the band is int8,
    the recurrence carries ride int8 across chips (the halo payload is
    HALF the bf16 operator's ICI bytes), and every shard runs the
    quantized banded kernel (int32 taps at the MXU int8 rate,
    dequant/requant at emission — DESIGN.md §11/§13).

    Implements the same ``quantize``/``dequantize``/``spmm_q``/
    ``cheby_hop_q`` protocol as ``QuantBandedLaplacian``, so
    ``ops.cheby_conv`` (and therefore NodeClassifier / ChebNet / the
    forecasting family) dispatches to the int8-resident recurrence with
    a runtime activation scale — sharded serving is the same one-call
    ``models.common.quantize_model_operators`` away as single-chip.
    Inference-only: no VJP (train in f32/bf16, quantize for serving).
    """

    band: jax.Array   # [n, nbr_s, W, br, bc] int8, sharded P('nodes')
    base: jax.Array   # [n, nbr_s] int32, extended-column window bases
    mesh: Mesh
    m: int
    m_padded: int
    nnz: int
    halo_left: int
    halo_right: int
    rows_per_shard: int
    block_shape: tuple
    ring_slots: int
    rows_per_step: int
    use_pallas: bool
    boundary_pre: int = 0
    boundary_suf: int = 0
    overlap: bool = False
    band_scale: float = 1.0
    act_scale: float = 1.0
    headroom: float = 2.0
    levels: tuple = ()
    sched: jax.Array | None = None
    sched_int: jax.Array | None = None
    sched_suf: jax.Array | None = None
    bands_dkw: tuple | None = None  # deep-K window twin (see float op)
    sched_dkw: jax.Array | None = None
    sched_dkw_int: jax.Array | None = None
    sched_dkw_suf: jax.Array | None = None

    @property
    def band_width(self):
        return self.levels[-1] if self.levels else self.band.shape[2]

    def spmm_q(self, x_q: jax.Array) -> jax.Array:
        """``quantize(L @ dequantize(x_q))``, one int8 pass per shard."""
        return _apply_sharded(self, x_q, None, band_scale=self.band_scale)

    def cheby_hop_q(self, x1_q: jax.Array, x0_q: jax.Array) -> jax.Array:
        """Quantized fused recurrence hop ``2 (L @ x1) - x0``."""
        return _apply_sharded(self, x1_q, x0_q, band_scale=self.band_scale)

    def cheby_chain_q(self, x_q: jax.Array, K: int) -> jax.Array:
        """Stacked int8 K-term basis, all hops in ONE shard_map region
        (int8 carries over the ICI ring; one dispatch per chain).
        Bit-exact with the per-hop quantized path."""
        return _chain_sharded(self, x_q, K, band_scale=self.band_scale)


def quantize_banded_halo(op: BandedHaloLaplacian, headroom: float = 2.0,
                         sample_x: float = 1.0) -> QuantBandedHaloLaplacian:
    """Quantize a sharded BandedHaloLaplacian for int8 serving.

    Same scale design as ``ops.laplacian.quantize_banded``: ONE global
    band scale ``max|L| / 127`` (the spectral rescale bounds entries
    uniformly — a global reduce over the sharded band), ONE activation
    scale with ``headroom`` for the recurrence carries.  The reduce and
    the cast run jitted so no eager op ever touches the device, and the
    quantized band keeps the P('nodes') sharding.
    """
    shard = NamedSharding(op.mesh, P("nodes"))
    s_b = float(jax.device_get(
        jax.jit(lambda b: jnp.max(jnp.abs(b.astype(jnp.float32))))(op.band)
    ))
    s_b = s_b / 127.0 if s_b > 0.0 else 1.0
    band_q = jax.jit(
        lambda b: jnp.clip(
            jnp.round(b.astype(jnp.float32) / s_b), -127, 127
        ).astype(jnp.int8),
        out_shardings=shard,
    )(op.band)
    bands_dkw_q = None
    if op.bands_dkw is not None:
        # Re-derive the deep-K window layout from the QUANTIZED flat
        # band so both layouts hold identical int8 values; the dkw
        # schedules are layout metadata and carry over unchanged.
        bands_np, _row0 = _dkw_per_shard(
            np.asarray(jax.device_get(band_q)),
            np.asarray(jax.device_get(op.sched)),
            op.levels, op.rows_per_step, *op.block_shape,
        )
        bands_dkw_q = tuple(
            jax.device_put(jnp.asarray(b), shard) for b in bands_np
        )
    return QuantBandedHaloLaplacian(
        band=band_q,
        base=op.base,
        bands_dkw=bands_dkw_q,
        sched_dkw=op.sched_dkw,
        sched_dkw_int=op.sched_dkw_int,
        sched_dkw_suf=op.sched_dkw_suf,
        mesh=op.mesh,
        m=op.m,
        m_padded=op.m_padded,
        nnz=op.nnz,
        halo_left=op.halo_left,
        halo_right=op.halo_right,
        rows_per_shard=op.rows_per_shard,
        block_shape=op.block_shape,
        ring_slots=op.ring_slots,
        rows_per_step=op.rows_per_step,
        use_pallas=op.use_pallas,
        boundary_pre=op.boundary_pre,
        boundary_suf=op.boundary_suf,
        overlap=op.overlap,
        band_scale=s_b,
        act_scale=float(sample_x) * headroom / 127.0,
        headroom=headroom,
        levels=op.levels,
        sched=op.sched,
        sched_int=op.sched_int,
        sched_suf=op.sched_suf,
    )


def banded_halo_laplacian(
    L: scipy.sparse.spmatrix,
    mesh: Mesh,
    lmax: float = 2.0,
    rescale: bool = True,
    dtype=jnp.float32,
    rows_per_step: int | None = None,
    use_pallas: bool | None = None,
    max_band_width: int = 48,
    ragged: bool = True,
    force_boundary: int = 0,
) -> BandedHaloLaplacian:
    """Build the row-sharded banded operator over ``mesh``'s 'nodes' axis.

    Requires an RCM-bandable matrix whose halo fits within ONE neighbor
    shard on each side (true for planar/kNN city graphs once shards hold
    more block-rows than the band is wide); raises otherwise — fall back
    to ``sparse_halo_laplacian`` for scattered or tiny-shard cases.

    ``ragged`` (default on, like the single-chip packer) stores each
    G-row super-step at one of <= 4 static width levels instead of the
    global max W — the same ~20% band FLOP/byte cut as DESIGN.md §12,
    now per shard; the schedules ride as sharded int32 operands so every
    shard runs one compiled kernel (DESIGN.md §19).
    """
    if rescale:
        L = rescale_laplacian(L, lmax=lmax)
    L = L.tocsr()
    L.eliminate_zeros()
    m = L.shape[0]
    nnz = int(L.nnz)
    n = mesh.shape["nodes"]
    br = bc = MXU_TILE
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)

    stats = band_stats(L, (br, bc))
    base0, W, _, _ = stats
    if W > max_band_width:
        raise ValueError(
            f"band width {W} blocks exceeds {max_band_width}; "
            "RCM-reorder the graph or use sparse_halo_laplacian"
        )
    if rows_per_step is None:
        G = auto_rows_per_step(base0, W, br, bc, jnp.dtype(dtype).itemsize)
        # Rows are padded to a multiple of n*G and padded rows inherit
        # the last REAL row's base — a G that is large next to the
        # per-shard row count can push a whole shard into padding whose
        # windows then look like giant left halos.  Cap G so padding
        # stays under half a shard (no-op at production sizes: 50k/n=8
        # has 392 block-rows, cap 24).
        G = max(1, min(G, len(base0) // (2 * n)))
    else:
        G = rows_per_step

    # One packing path with the single-chip format: rows padded so every
    # shard holds the same whole number of super-steps.
    band, base, _, _, mp = pack_banded(
        L, (br, bc), max_band_width=max_band_width, rows_per_step=G,
        stats=stats, row_multiple=n * G, band_dtype=np.dtype(dtype),
    )
    nbr = mp // br
    nbr_s = nbr // n

    # Per-shard halo extents (uniform so every shard runs one program).
    starts = np.arange(n) * nbr_s
    ends = starts + nbr_s - 1
    h_l = int(np.max(starts - base[starts]))
    h_r = int(np.max(np.maximum(base[ends] + W - (ends + 1), 0)))
    if h_l > nbr_s or h_r > nbr_s:
        raise ValueError(
            f"halo ({h_l} left / {h_r} right block-rows) exceeds the "
            f"{nbr_s} block-rows per shard — too many shards for this "
            "band; use fewer shards or sparse_halo_laplacian"
        )

    # Window bases into each shard's extended column space.
    shard_of_row = np.repeat(np.arange(n), nbr_s)
    base_local = (base - shard_of_row * nbr_s + h_l).astype(np.int32)
    base_local = base_local.reshape(n, nbr_s)
    assert np.all(base_local >= 0)
    assert np.all(base_local + W <= nbr_s + h_l + h_r)

    band = band.reshape(n, nbr_s, W, br, bc)

    # Trailing padded rows (all-zero band) inherit the last real row's
    # base, which can sit below h_l in local coordinates and misclassify
    # them as halo-touching.  Their band is zero, so re-base them into
    # the local window space: monotone (>= previous row), >= h_l, and
    # window-in-range.  Results are unchanged (zero rows); only the
    # interior/boundary classification and fetch bounds move.
    nz = band.reshape(n, nbr_s, -1).any(axis=2).reshape(-1)
    last_real = int(np.max(np.nonzero(nz)[0])) if nz.any() else -1
    for gi in range(last_real + 1, n * nbr_s):
        s_i, i = divmod(gi, nbr_s)
        prev = base_local[s_i, i - 1] if i > 0 else h_l
        base_local[s_i, i] = np.clip(
            max(int(prev), h_l), 0, nbr_s + h_l + h_r - W
        )
    assert np.all(np.diff(base_local, axis=1) >= 0)

    # Interior/boundary split for exchange-compute overlap: the prefix
    # rows whose windows reach into the left halo (base < h_l) and the
    # suffix rows reaching the right halo (base + W > h_l + nbr_s),
    # rounded up to whole kernel super-steps (G) and max'd across shards
    # so every shard runs the same three programs.  Interior rows read
    # only local columns, so their SpMM needs no ppermute result.
    pre = max(
        int(np.searchsorted(base_local[s], h_l, side="left"))
        for s in range(n)
    )
    suf = max(
        nbr_s - int(np.searchsorted(base_local[s], h_l + nbr_s - W,
                                    side="right"))
        for s in range(n)
    )
    pre = _round_up(pre, G)
    suf = _round_up(suf, G)
    if force_boundary:
        # Test hook (ADVICE round-4 #5): force a non-trivial
        # prefix/interior/suffix split even when halos are empty (e.g.
        # nodes=1), so the multi-region ragged Pallas passes are
        # exercisable on a single real chip.  Results are identical by
        # construction (per-row arithmetic does not depend on the
        # split); see `_probe.py raggedshard`.
        pre = suf = max(pre, suf, _round_up(force_boundary, G))
    overlap = pre + suf < nbr_s and (pre > 0 or suf > 0)
    if not overlap:
        pre = suf = 0

    from cnn_graph_tpu.ops.pallas_band import ring_span

    # Ring sized over every sub-range the split can run (a bigger ring
    # is always safe — it only relaxes the collision bound).
    pieces = [(0, nbr_s)]
    if overlap:
        pieces += [(0, pre), (pre, nbr_s - suf), (nbr_s - suf, nbr_s)]
    ring = max(
        ring_span(base_local[s, lo:hi], W, G)
        for s in range(n)
        for lo, hi in pieces
        if hi > lo
    )

    # Ragged derivation from the uniform layout (band is still the
    # host-side numpy [n, nbr_s, W, br, bc] here).
    levels: tuple = ()
    sched_j = sched_int_j = sched_suf_j = None
    bands_dkw_j = sched_dkw_j = sched_dkw_int_j = sched_dkw_suf_j = None
    shard = NamedSharding(mesh, P("nodes"))
    if ragged:
        levels, band, sched_np, sched_int_np, sched_suf_np, ring = (
            _ragged_from_uniform(np.asarray(band), base_local, h_l, h_r,
                                 G, pre, suf)
        )
        sched_j = jax.device_put(jnp.asarray(sched_np), shard)
        sched_int_j = jax.device_put(jnp.asarray(sched_int_np), shard)
        sched_suf_j = jax.device_put(jnp.asarray(sched_suf_np), shard)
        if use_pallas:
            # Deep-K window twin layout (DESIGN.md §20): same band
            # content, one wide dot per block-row in the kernel.  Region
            # schedules reuse rows 1-2 (level idx, column high-water);
            # row 0 becomes the per-level ROW offset.
            bands_np, row0 = _dkw_per_shard(np.asarray(band), sched_np,
                                            levels, G, br, bc)
            nsb_s = nbr_s // G
            pre_sb, suf_sb = pre // G, suf // G
            sched_dkw_np = sched_np.copy()
            sched_dkw_np[:, 0, :] = row0
            sched_dkw_int_np = sched_int_np.copy()
            if nsb_s - suf_sb > pre_sb and (pre_sb or suf_sb):
                sched_dkw_int_np[:, 0, :] = row0[:, pre_sb:nsb_s - suf_sb]
            sched_dkw_suf_np = sched_suf_np.copy()
            if suf_sb:
                sched_dkw_suf_np[:, 0, :] = row0[:, nsb_s - suf_sb:]
            bands_dkw_j = tuple(
                jax.device_put(jnp.asarray(b), shard) for b in bands_np
            )
            sched_dkw_j = jax.device_put(jnp.asarray(sched_dkw_np),
                                         shard)
            sched_dkw_int_j = jax.device_put(
                jnp.asarray(sched_dkw_int_np), shard)
            sched_dkw_suf_j = jax.device_put(
                jnp.asarray(sched_dkw_suf_np), shard)

    # Pre-shard the per-shard fields over 'nodes' (like sparse_halo):
    # otherwise the FULL global band lands on one device and every call
    # pays a reshard — fatal at the >single-chip scales this targets.
    return BandedHaloLaplacian(
        band=jax.device_put(jnp.asarray(band, dtype=dtype), shard),
        base=jax.device_put(jnp.asarray(base_local), shard),
        mesh=mesh,
        m=m,
        m_padded=mp,
        nnz=nnz,
        halo_left=h_l,
        halo_right=h_r,
        rows_per_shard=nbr_s * br,
        block_shape=(br, bc),
        ring_slots=ring,
        rows_per_step=G,
        use_pallas=use_pallas,
        boundary_pre=pre,
        boundary_suf=suf,
        overlap=overlap,
        levels=levels,
        sched=sched_j,
        sched_int=sched_int_j,
        sched_suf=sched_suf_j,
        bands_dkw=bands_dkw_j,
        sched_dkw=sched_dkw_j,
        sched_dkw_int=sched_dkw_int_j,
        sched_dkw_suf=sched_dkw_suf_j,
    )
