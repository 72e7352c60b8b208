"""Block-sparse halo-exchange operator: edge-partitioned SpMM at scales
where the dense per-shard matrix is impossible.

The dense halo operator (parallel/halo.py) stores each shard's rows as a
dense ``[Ms, Ms + n*H]`` block — fine to ~10k nodes/shard, hopeless at
ogbn-papers100M scale (BASELINE.json config 5).  This operator keeps the
same exchange plan but stores each shard's extended-column matrix as
MXU-tile block-sparse rows (ops/laplacian.py packing), padded to the
maximum block count across shards so every shard runs one SPMD program:

    x_ext   = [local rows | halo recv]           (one all_to_all per hop)
    partial = blocks[b] @ x_ext[cols[b]]         (dense MXU tiles)
    y_local = segment_sum(partial, block_rows)

Per-shard memory is O(local nnz-blocks), per-hop ICI traffic is
O(edge cut) — the multi-host scale path for the Chebyshev recurrence.
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
from cnn_graph_tpu.ops.laplacian import ChebyHopMixin, pack_block_sparse
from cnn_graph_tpu.parallel.halo import build_halo_plan, halo_exchange_columns

__all__ = ["SparseHaloLaplacian", "sparse_halo_laplacian"]


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["blocks", "block_rows", "block_cols", "send_idx"],
    meta_fields=["mesh", "m", "m_padded", "nnz", "halo", "rows_per_shard",
                 "block_shape", "ext_cols_padded"],
)
@dataclasses.dataclass(frozen=True)
class SparseHaloLaplacian(ChebyHopMixin):
    """Row-sharded block-sparse Laplacian with halo exchange.

    Leading axis of every data field is the shard axis (sharded
    P('nodes')); block counts are padded to the max across shards with
    zero blocks at (row 0, col 0) — they contribute nothing.
    """

    blocks: jax.Array       # [n, nb_max, br, bc]
    block_rows: jax.Array   # [n, nb_max] int32 (sorted per shard)
    block_cols: jax.Array   # [n, nb_max] int32 (extended-column blocks)
    send_idx: jax.Array     # [n, n, H] int32
    mesh: Mesh
    m: int
    m_padded: int
    nnz: int
    halo: int
    rows_per_shard: int
    block_shape: tuple
    ext_cols_padded: int    # extended column space, padded to bc

    @property
    def compute_dtype(self):
        return self.blocks.dtype

    def matmul(self, x: jax.Array) -> jax.Array:
        """``L @ x`` for ``x`` [Mp, C] sharded P('nodes', None).

        Differentiable via a custom VJP (``dx = L @ g`` — the rescaled
        Laplacian is symmetric), which keeps autodiff out of the
        shard_map internals (JAX cannot transpose the gather/segment-sum
        pattern under partially-manual meshes)."""
        return _sparse_halo_matmul(self, x)

    def _matmul_impl(self, x: jax.Array) -> jax.Array:
        n = self.mesh.shape["nodes"]
        H = self.halo
        br, bc = self.block_shape
        ms = self.rows_per_shard
        ext_p = self.ext_cols_padded

        def local_matmul(blocks, brows, bcols, send_idx_local, x_local):
            blocks, brows, bcols = blocks[0], brows[0], bcols[0]
            x_ext = halo_exchange_columns(x_local, send_idx_local, n, H)
            pad = ext_p - x_ext.shape[0]
            if pad:
                x_ext = jnp.pad(x_ext, ((0, pad), (0, 0)))
            xb = x_ext.reshape(ext_p // bc, bc, -1)
            gathered = jnp.take(xb, bcols, axis=0)  # [nb, bc, C]
            partial = jnp.einsum(
                "nij,njc->nic", blocks.astype(x.dtype), gathered,
                preferred_element_type=x.dtype,
            )
            yb = jax.ops.segment_sum(
                partial, brows, num_segments=ms // br,
                indices_are_sorted=True,
            )
            return yb.reshape(ms, -1).astype(x.dtype)

        # Fully-manual shard_map (all mesh axes): activations are
        # replicated over non-'nodes' axes in this operator's use case
        # (whole-graph node models carry no batch dim).  Partial-manual +
        # custom_vjp trips a JAX spec-inference limitation.
        return jax.shard_map(
            local_matmul,
            mesh=self.mesh,
            in_specs=(P("nodes"), P("nodes"), P("nodes"),
                      P("nodes", None, None), P("nodes", None)),
            out_specs=P("nodes", None),
            axis_names=set(self.mesh.axis_names),
            check_vma=False,
        )(self.blocks, self.block_rows, self.block_cols, self.send_idx, x)


@jax.custom_vjp
def _sparse_halo_matmul(op, x):
    return op._matmul_impl(x)


def _shm_fwd(op, x):
    return op._matmul_impl(x), op


def _shm_bwd(op, g):
    from cnn_graph_tpu.ops.laplacian import zero_cotangent

    # L symmetric: adjoint = itself; the operator gets zero cotangents.
    return zero_cotangent(op), op._matmul_impl(g)


_sparse_halo_matmul.defvjp(_shm_fwd, _shm_bwd)


def sparse_halo_laplacian(
    L: scipy.sparse.spmatrix,
    mesh: Mesh,
    lmax: float = 2.0,
    rescale: bool = True,
    dtype=jnp.float32,
    block_shape: tuple = (128, 128),
) -> SparseHaloLaplacian:
    """Build the block-sparse halo operator (RCM-order the graph first)."""
    if rescale:
        L = rescale_laplacian(L, lmax=lmax)
    L = L.tocsr()
    m = L.shape[0]
    n = mesh.shape["nodes"]
    br, bc = block_shape
    Lp, mp, ms, need, send_idx, H = build_halo_plan(
        L, n, tile=int(np.lcm(br, bc))
    )
    ms = mp // n
    ext_p = -(-(ms + n * H) // bc) * bc

    per_shard = []
    for s in range(n):
        block = Lp[s * ms : (s + 1) * ms].tocoo()
        # Global col -> extended-local col (local range then halo slots).
        col_map = {}
        for t in range(n):
            for slot, c in enumerate(need[s][t]):
                col_map[int(c)] = ms + t * H + slot
        ext_cols = np.array(
            [
                col_map.get(int(c), int(c) - s * ms)
                for c in block.col
            ],
            np.int64,
        )
        local = scipy.sparse.coo_matrix(
            (block.data, (block.row, ext_cols)), shape=(ms, ext_p)
        )
        per_shard.append(pack_block_sparse(local, (br, bc)))

    nb_max = max(max(p[0].shape[0] for p in per_shard), 1)
    blocks = np.zeros((n, nb_max, br, bc), np.float32)
    brows = np.zeros((n, nb_max), np.int32)
    bcols = np.zeros((n, nb_max), np.int32)
    for s, (blk, br_s, bc_s, _ptr, _mp) in enumerate(per_shard):
        nb = blk.shape[0]
        blocks[s, :nb] = blk
        brows[s, :nb] = br_s
        bcols[s, :nb] = bc_s
        # Padding blocks keep row/col 0 (zero contribution); keep rows
        # sorted for segment_sum by pointing them at the LAST row block.
        brows[s, nb:] = (ms // br) - 1

    shard = lambda spec: NamedSharding(mesh, spec)
    return SparseHaloLaplacian(
        blocks=jax.device_put(jnp.asarray(blocks, dtype=dtype),
                              shard(P("nodes"))),
        block_rows=jax.device_put(jnp.asarray(brows), shard(P("nodes"))),
        block_cols=jax.device_put(jnp.asarray(bcols), shard(P("nodes"))),
        send_idx=jax.device_put(jnp.asarray(send_idx),
                                shard(P("nodes", None, None))),
        mesh=mesh,
        m=m,
        m_padded=mp,
        nnz=int(L.nnz),
        halo=H,
        rows_per_shard=ms,
        block_shape=(br, bc),
        ext_cols_padded=ext_p,
    )
