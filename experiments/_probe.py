#!/usr/bin/env python
"""Parameterized TPU measurement probe (consolidated round-1/2 one-offs).

One script, four modes — the measurement harness behind the numbers in
DESIGN.md §10-§11 (per-shape MXU rates, device peaks, predication and
chunked-DMA A/Bs).  Each mode runs self-contained device programs with
all operands resident and a dependent iteration chain, timed by fetching
a SCALAR via ``jax.device_get`` (on the tunneled platform
``block_until_ready`` can return before the remote execution finishes —
see experiments/_compile_probe.py and the verify skill).

  python experiments/_probe.py peak [iters]   # XLA tuned matmul ceiling
  python experiments/_probe.py mxu  [iters]   # Pallas in-kernel tap shapes
  python experiments/_probe.py pred [iters]   # per-tap lax.cond predication
  python experiments/_probe.py bsr  [side]    # chunked vs per-block BSR DMA

Findings these modes produced (recorded in DESIGN.md §11): measured
device peaks bf16 114 TF/s / f32 47 / int8 153 TOP/s (vs 197 TF
datasheet); Pallas in-kernel taps cap at ~73-81 TF bf16 / ~96 TOP int8
regardless of M/K composition; predication costs more than the skipped
work; chunked row-slab DMA is slower than the per-block pipeline.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from experiments import _common  # noqa: E402,F401


def _timed_scalar(run, *args):
    """Compile+warm, then time one steady-state call via scalar fetch."""
    import jax

    s = jax.device_get(run(*args))
    t0 = time.perf_counter()
    s = jax.device_get(run(*args))
    return float(s), time.perf_counter() - t0


# ---------------------------------------------------------------- peak

def _peak_probe(name, size, dtype, iters, acc_dtype=None):
    """XLA's own matmul rate: chained fori_loop of big square matmuls.
    Whatever this reports is the honest ``flops_per_s`` for the roofline
    model (utils/profiling.py) and the "% of peak" anchor in DESIGN.md."""
    import jax
    import jax.numpy as jnp

    if dtype == "int8":
        a = jnp.ones((size, size), jnp.int8)
        w = jnp.ones((size, size), jnp.int8)

        @jax.jit
        def run(a, w):
            def body(i, z):
                # int32 accumulate; fold back to int8 with a shift so the
                # chain stays bounded and data-dependent.
                zz = jax.lax.dot(z, w, preferred_element_type=jnp.int32)
                return (zz >> 12).astype(jnp.int8)

            out = jax.lax.fori_loop(0, iters, body, a)
            return jnp.sum(out.astype(jnp.int32))
    else:
        dt = jnp.dtype(dtype)
        acc = acc_dtype or dt
        a = jnp.ones((size, size), dt) * 0.03
        w = jnp.eye(size, dtype=dt) * 1.0003

        @jax.jit
        def run(a, w):
            def body(i, z):
                return jax.lax.dot(
                    z, w, preferred_element_type=acc
                ).astype(dt)

            out = jax.lax.fori_loop(0, iters, body, a)
            return jnp.mean(out.astype(jnp.float32) ** 2)

    s, dt_s = _timed_scalar(run, a, w)
    flops = 2 * size**3 * iters
    print(f"{name:14s} {dt_s*1e3:8.1f} ms  {flops/dt_s/1e12:6.1f} "
          f"T{'OP' if dtype=='int8' else 'FLOP'}/s  probe={s:.3e}",
          flush=True)


def main_peak(argv):
    import jax.numpy as jnp

    it = int(argv[0]) if argv else 50
    _peak_probe("bf16_2048", 2048, "bfloat16", it * 8)
    _peak_probe("bf16_4096", 4096, "bfloat16", it)
    _peak_probe("bf16_8192", 8192, "bfloat16", max(it // 8, 4))
    _peak_probe("f32_4096", 4096, "float32", max(it // 4, 4))
    _peak_probe("bf16_4096_f32acc", 4096, "bfloat16", it,
                acc_dtype=jnp.float32)
    _peak_probe("int8_4096", 4096, "int8", it)


# ----------------------------------------------------------------- mxu

def _mxu_probe(name, m, k, n, iters, taps=1, dtype="bfloat16"):
    """In-kernel Pallas tap rate per dot geometry, all operands VMEM-
    resident, dependency injected so Mosaic cannot hoist the dots.
    ``taps>1`` is the banded kernel's per-row shape (taps x [m,k/taps]
    dots into one accumulator); ``taps=1`` is one deep-K dot plus a
    small counted injection tap."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    int8 = dtype == "int8"
    dt = jnp.dtype(dtype)
    acc_dt = jnp.int32 if int8 else jnp.float32

    def kernel(a_ref, b_ref, o_ref):
        def body(i, carry):
            if taps > 1:
                # fold the carry into each RHS slab (slab rows == 128).
                acc = jnp.zeros((m, n), acc_dt)
                for d in range(taps):
                    bb = b_ref[d] + carry
                    acc += jnp.dot(a_ref[d], bb,
                                   preferred_element_type=acc_dt)
            else:
                # deep-K: inject the dependency as one extra small tap
                # (its FLOPs are counted in the total below).
                acc = jnp.dot(a_ref[0], b_ref[0],
                              preferred_element_type=acc_dt)
                acc += jnp.dot(a_ref[0][:, :128], carry,
                               preferred_element_type=acc_dt)
            if int8:
                return (acc[:128, :] >> 12).astype(dt)
            return (acc[:128, :] * 1e-6).astype(dt)

        out = jax.lax.fori_loop(0, iters, body, jnp.zeros((128, n), dt))
        o_ref[:] = out

    a = jnp.ones((taps, m, k // taps), dt)
    b = jnp.ones((taps, k // taps, n), dt)

    @jax.jit
    def run(a, b):
        o = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, n), dt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    _, dt_s = _timed_scalar(run, a, b)
    flops = 2 * m * (k + (128 if taps == 1 else 0)) * n * iters
    tflops = flops / dt_s / 1e12
    unit = "TOP/s " if int8 else "TFLOP/s"
    peak = 153 if int8 else 114
    print(f"{name:12s} {dt_s*1e3:8.2f} ms  {dt_s/iters*1e6:6.2f} us/iter "
          f"{tflops:6.1f} {unit} ({tflops/peak*100:4.1f}% of measured "
          f"device peak)", flush=True)


def main_mxu(argv):
    it = int(argv[0]) if argv else 20000
    # Banded-kernel row shapes (W=9 taps of [128,128]@[128,512]) vs the
    # same FLOPs as one deep-K dot, M scaling, and the int8 variants.
    _mxu_probe("tap9_bf16", m=128, k=1152, n=512, iters=it, taps=9)
    _mxu_probe("deepk_bf16", m=128, k=1152, n=512, iters=it)
    _mxu_probe("deepk_m256", m=256, k=1152, n=512, iters=it // 2)
    _mxu_probe("tap9_int8", m=128, k=1152, n=512, iters=it, taps=9,
               dtype="int8")
    _mxu_probe("deepk_int8", m=128, k=1152, n=512, iters=it, dtype="int8")
    # Square references (the XLA-peak shapes, in-kernel).
    sq = max(it // 8, 256)
    _mxu_probe("sq1024", m=1024, k=1024, n=1024, iters=sq)
    _mxu_probe("i8_sq1024", m=1024, k=1024, n=1024, iters=sq, dtype="int8")


# ---------------------------------------------------------------- pred

def _pred_probe(name, widths, iters, m=128, k0=128, n=512, taps=9,
                cond=True):
    """tap9 loop with each tap wrapped in ``lax.cond(d < w_i)`` where the
    per-row width cycles through a prefetched pattern — does predication
    actually skip MXU work, or cost more than it saves?"""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.bfloat16
    w_arr = jnp.asarray(np.asarray(widths, np.int32))
    nw = len(widths)

    def kernel(w_ref, a_ref, b_ref, o_ref):
        def body(i, carry):
            acc = jnp.dot(a_ref[0], carry,
                          preferred_element_type=jnp.float32)
            w_i = w_ref[jax.lax.rem(i, nw)]
            for d in range(taps):
                if cond:
                    acc = jax.lax.cond(
                        d < w_i,
                        lambda a: a + jnp.dot(
                            a_ref[d], b_ref[d],
                            preferred_element_type=jnp.float32),
                        lambda a: a,
                        acc,
                    )
                else:
                    acc += jnp.dot(a_ref[d], b_ref[d],
                                   preferred_element_type=jnp.float32)
            return (acc * 1e-6).astype(dt)

        out = jax.lax.fori_loop(0, iters, body, jnp.zeros((k0, n), dt))
        o_ref[:] = out

    a = jnp.ones((taps, m, k0), dt)
    b = jnp.ones((taps, k0, n), dt)

    @jax.jit
    def run(w, a, b):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        o = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((k0, n), dt),
            grid_spec=grid_spec,
        )(w, a, b)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    _, dt_s = _timed_scalar(run, w_arr, a, b)
    mean_w = float(np.mean(widths))
    flops = 2 * m * k0 * n * (mean_w + 1) * iters  # +1 injection tap
    print(f"{name:10s} {dt_s/iters*1e6:6.2f} us/iter  mean_w={mean_w:.1f}  "
          f"{flops/dt_s/1e12:5.1f} TFLOP/s useful", flush=True)


def main_pred(argv):
    it = int(argv[0]) if argv else 20000
    _pred_probe("base9", [9], it, cond=False)
    _pred_probe("cond_w9", [9], it)
    _pred_probe("cond_w7", [5, 6, 7, 8, 9, 9, 7, 5, 6, 8], it)
    _pred_probe("cond_w5", [5], it)


# ----------------------------------------------------------------- bsr

def main_bsr(argv):
    """A/B: chunked row-slab DMA vs per-block pipeline in the BSR kernel.
    Same graph, same kernel maths — only the block fetch strategy differs
    (BlockSparseLaplacian.row_max toggles it)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnn_graph_tpu.data.synthetic import city_graph
    from cnn_graph_tpu.ops import device_laplacian

    side = int(argv[0]) if argv else 224
    K, C, outer = 25, 512, 4
    L, _ = city_graph(side, k=8, seed=0)
    op = device_laplacian(L, fmt="bsr", block_size=128,
                          dtype=jnp.bfloat16, use_pallas=True,
                          chunked_rows=True)
    print(f"nodes={op.m} nnz={op.nnz} "
          f"blocks={int(op.block_cols.shape[0])} row_max={op.row_max}",
          flush=True)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(op.m_padded, C)), jnp.bfloat16)

    @jax.jit
    def chain(op, x):
        def body(_, carry):
            x0, x1 = carry

            def hop(_, c):
                a, b = c
                return b, op.cheby_hop(b, a)

            a, b = jax.lax.fori_loop(0, K - 1, hop, (x0, x1))
            s = jax.lax.rsqrt(jnp.mean(a.astype(jnp.float32) ** 2) + 1e-6)
            return (a * s).astype(x.dtype), b

        out = jax.lax.fori_loop(0, outer, body, (x, op.matmul(x)))[1]
        return jnp.mean(out.astype(jnp.float32) ** 2)

    for name, o in (("chunked", op),
                    ("per-block", dataclasses.replace(op, row_max=0))):
        s, dt = _timed_scalar(chain, o, X)
        assert np.isfinite(s)
        dt /= outer * (K - 1)
        print(f"{name:10s} {dt*1e6:7.1f} us/spmm "
              f"{op.nnz/dt/1e9:.3f} Gedges/s", flush=True)


def main_band(argv):
    """A/B: banded-kernel G (block-rows per grid step) and layout for the
    int8 serving chain.  Host-side fill analysis shows ragged G=8 keeps
    19.0% of the 20.0% G=4 fill saving while HALVING grid steps (98->49
    at 50k), and the int8 path's VMEM footprint (int8 band + int8
    carries) is ~4x smaller than the bf16 one that sized the G=4
    default — so larger G trades ~1% more MXU FLOPs against the per-
    grid-step fixed cost (~0.7us pipeline + ~1us scalar DMA bookkeeping,
    ops/pallas_band.py docstring)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnn_graph_tpu.data.synthetic import city_graph
    from cnn_graph_tpu.ops import device_laplacian, quantize_banded

    side = int(argv[0]) if argv else 224
    K, C, outer = 25, 512, 4
    L, _ = city_graph(side, k=8, seed=0)
    rng = np.random.default_rng(0)

    @jax.jit
    def chain_q(qop, x):
        xq = qop.quantize(x.astype(jnp.float32))

        def body(_, carry):
            def hop(_, c):
                p, q = c
                return q, qop.cheby_hop_q(q, p)

            return jax.lax.fori_loop(0, K - 1, hop, carry)

        out = jax.lax.fori_loop(0, outer, body, (xq, qop.spmm_q(xq)))[1]
        return jnp.mean(qop.dequantize(out) ** 2)

    all_variants = {
        "ragged_G4": (True, 4), "ragged_G8": (True, 8),
        "ragged_G16": (True, 16), "uniform_G4": (False, 4),
        "uniform_G8": (False, 8),
    }
    names = argv[1:] if len(argv) > 1 else list(all_variants)
    for name in names:
        ragged, G = all_variants[name]
        op = device_laplacian(L, fmt="banded", dtype=jnp.bfloat16,
                              ragged=ragged, rows_per_step=G)
        qop = quantize_banded(op, sample_x=3.0)
        X = jnp.asarray(rng.normal(size=(op.m_padded, C)), jnp.bfloat16)
        s, dt = _timed_scalar(chain_q, qop, X)
        assert np.isfinite(s)
        dt /= outer * (K - 1)
        blocks = (op.band.shape[0] if op.levels
                  else op.band.shape[0] * op.band.shape[1])
        print(f"{name:11s} G={G:2d} blocks={blocks:5d} "
              f"ring={op.ring_slots:3d} {dt*1e6:7.1f} us/spmm "
              f"{op.nnz/dt/1e9:.4f} Gedges/s", flush=True)


MODES = {"peak": main_peak, "mxu": main_mxu, "pred": main_pred,
         "bsr": main_bsr, "band": main_band}

if __name__ == "__main__":
    if len(sys.argv) < 2 or sys.argv[1] not in MODES:
        print(__doc__)
        sys.exit(1)
    MODES[sys.argv[1]](sys.argv[2:])
