"""Spectral graph filters: the device compute path.

TPU-native equivalents of the reference's filter layer (functional
``cheby_conv``/``fourier_conv`` in lib/filter.py:45/30 and the method-style
``chebyshev5``/``chebyshev2``/``fourier`` in lib/graph_conv.py:83-176).
Everything here is a pure jittable function of ``(x, operator, params)``:

* the Chebyshev recurrence runs as K-1 Laplacian products in whichever
  format the operator carries (dense MXU matmul / block-sparse / BCOO),
  followed by ONE large ``[B*M, K*F] @ [K*F, Fout]`` MXU matmul that fuses
  the per-hop filter taps;
* the Fourier filter is two dense basis matmuls around a per-node mix —
  trivially MXU-shaped (the reference bakes U in as a graph constant,
  filter.py:37; here U is just an array argument).

Conventions: activations are ``[B, M, F]`` (batch, node, feature);
Chebyshev weights are ``[K, Fin, Fout]`` (the reference flattens to
``[K*Fin, Fout]`` with Fin-major order, filter.py:64 — use
``cheby_weights_from_flat`` for exact migration); Fourier weights are
``[M, Fout, Fin]`` (filter.py:40).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cnn_graph_tpu.ops.laplacian import LaplacianOperator

__all__ = [
    "cheby_basis",
    "cheby_conv",
    "fourier_conv",
    "cheby_weights_from_flat",
]


def _fused_eligible(L, fin: int, fout: int, col_tile: int = 512) -> bool:
    """Shape guard for the fused Pallas conv: the column tile must hold
    whole samples with 128-lane-aligned activation and output tiles, and
    the working set must fit VMEM (see ops/pallas_cheby.py)."""
    from cnn_graph_tpu.ops.pallas_cheby import fused_vmem_ok

    # Both directions must tile cleanly: the custom VJP runs the kernel
    # again with (fin, fout) swapped for dx.
    for a, b in ((fin, fout), (fout, fin)):
        if a > col_tile:
            return False
        s = max(col_tile // a, 1)
        if (s * a) % 128 != 0 or (s * b) % 128 != 0 or s * b > 2048:
            return False
        if not fused_vmem_ok(L.m_padded, L.compute_dtype, col_tile=s * a):
            return False
    return True


def _pad_nodes(x: jax.Array, m_padded: int) -> jax.Array:
    """Zero-pad the node axis of [M, ...] to the operator's padded size."""
    m = x.shape[0]
    if m == m_padded:
        return x
    return jnp.pad(x, [(0, m_padded - m)] + [(0, 0)] * (x.ndim - 1))


def _cheby_basis_quant(x: jax.Array, L, K: int) -> jax.Array:
    """Quantized-carry Chebyshev basis for a QuantBandedLaplacian.

    The activation scale is computed AT RUNTIME from ``max|x|`` (one
    cheap reduce) — the kernel's epilogue works in input-scale units, so
    the scale never enters the kernel and no calibration pass is needed.
    One quantize in, K-1 int8-resident hops at the MXU int8 rate, one
    dequantize out (to ``x.dtype``) for the tap matmul.
    """
    B, M, F = x.shape
    xt = _pad_nodes(jnp.transpose(x, (1, 2, 0)).reshape(M, F * B),
                    L.m_padded).astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xt)), 1e-30) * (L.headroom / 127.0)
    xq = L.quantize(xt, scale=s_x)

    basis = [xq]
    if K > 1:
        basis.append(L.spmm_q(xq))
    for _ in range(2, K):
        basis.append(L.cheby_hop_q(basis[-1], basis[-2]))

    stacked = jnp.stack(basis)[:, :M]  # [K, M, F*B] int8
    stacked = L.dequantize(stacked, x.dtype, scale=s_x)
    return jnp.transpose(stacked.reshape(K, M, F, B), (0, 3, 1, 2))


def cheby_basis(x: jax.Array, L: LaplacianOperator, K: int) -> jax.Array:
    """Stacked Chebyshev basis ``T_k(L) x`` for k < K.

    ``x``: [B, M, F]  ->  returns [K, B, M, F].

    The recurrence ``T_k = 2 L T_{k-1} - T_{k-2}`` (graphs.construction.
    chebyshev_basis is the NumPy oracle) runs on the node axis with the
    feature*batch axes flattened into the lane dimension, so each hop is a
    single wide matmul rather than a batched loop.  Quantized operators
    (``cheby_hop_q`` protocol) run the recurrence on int8-resident
    carries — the inference/serving path (DESIGN.md §11).
    """
    if hasattr(L, "cheby_hop_q"):
        return _cheby_basis_quant(x, L, K)
    B, M, F = x.shape
    compute_dtype = getattr(L, "compute_dtype", x.dtype)
    xt = _pad_nodes(jnp.transpose(x, (1, 2, 0)).reshape(M, F * B), L.m_padded)
    # Run the recurrence in the operator's dtype (bf16 operators keep the
    # whole chain on the MXU's native path; values are bounded by the
    # [-1, 1] spectral rescale so bf16 is well-conditioned here).
    xt = xt.astype(compute_dtype)

    basis = [xt]
    if K > 1:
        basis.append(L.matmul(xt))
    for _ in range(2, K):
        # cheby_hop fuses the 2*(L@x)-x0 update where the operator has a
        # kernel for it (BandedLaplacian); elsewhere it's the same math.
        basis.append(L.cheby_hop(basis[-1], basis[-2]))

    stacked = jnp.stack(basis)  # [K, Mp, F*B]
    stacked = stacked[:, :M].reshape(K, M, F, B)
    # Stays in compute_dtype; cheby_conv accumulates the tap matmul in the
    # input dtype via preferred_element_type.
    return jnp.transpose(stacked, (0, 3, 1, 2))


def cheby_conv(x: jax.Array, L: LaplacianOperator, w: jax.Array) -> jax.Array:
    """Chebyshev-polynomial spectral graph convolution.

    ``x``: [B, M, Fin], ``w``: [K, Fin, Fout]  ->  [B, M, Fout].

    Equivalent computation to the reference's ``cheby_conv``
    (lib/filter.py:45-95) / ``chebyshev5`` (lib/graph_conv.py:144-176):
    y = sum_k T_k(L) x W_k, with the K taps folded into one MXU matmul.

    (An XLA-level "streaming" variant that accumulated per-hop taps from a
    transposed layout was measured at parity for steady-state but with a
    ~100x compile-time blowup from 25 unrolled batched dots — the fused
    low-memory path is the Pallas kernel in ops/pallas_cheby.py instead.)
    """
    K, Fin, Fout = w.shape
    B, M, F = x.shape
    assert F == Fin, f"feature mismatch: x has {F}, w expects {Fin}"

    # bf16 operators use a smaller column tile: the fused kernel's VMEM
    # working set at tile 512 exceeds the 16MB scoped limit once XLA also
    # places the output block there (measured OOM by 1.6MB at M=976).
    fused_tile = 512 if L.compute_dtype == jnp.float32 else 256
    if getattr(L, "use_fused", False) and _fused_eligible(
        L, Fin, Fout, col_tile=fused_tile
    ):
        from cnn_graph_tpu.ops.pallas_cheby import cheby_conv_fused

        return cheby_conv_fused(x, L, w, col_tile=fused_tile)

    basis = cheby_basis(x, L, K)  # [K, B, M, Fin] in L.compute_dtype
    return jnp.einsum(
        "kbmf,kfo->bmo",
        basis,
        w.astype(basis.dtype),
        preferred_element_type=x.dtype,
    ).astype(x.dtype)


def cheby_weights_from_flat(w_flat: jax.Array, K: int, Fin: int) -> jax.Array:
    """Convert reference-layout weights ``[K*Fin, Fout]`` (Fin-major: row
    index = fin*K + k, see graph_conv.py:171-174) to ``[K, Fin, Fout]``."""
    Fout = w_flat.shape[1]
    return jnp.transpose(w_flat.reshape(Fin, K, Fout), (1, 0, 2))


def fourier_conv(x: jax.Array, U: jax.Array, w: jax.Array) -> jax.Array:
    """Non-parametric spectral filter in the full Fourier basis.

    ``x``: [B, M, Fin], ``U``: [M, M] eigenvector basis (columns =
    eigenvectors, ascending eigenvalues), ``w``: [M, Fout, Fin] per-frequency
    mixing weights  ->  [B, M, Fout].

    Math parity with ``filter_in_fourier_conv`` (lib/filter.py:11-27):
    out = U ( W_lambda . (U^T x) ).
    """
    xhat = jnp.einsum("ml,bmf->blf", U, x, preferred_element_type=x.dtype)
    filtered = jnp.einsum("lof,blf->blo", w, xhat, preferred_element_type=x.dtype)
    return jnp.einsum("ml,blo->bmo", U, filtered, preferred_element_type=x.dtype)
