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
  python experiments/_probe.py band [side]    # ragged/uniform x G sweep
  python experiments/_probe.py pa   [side] [pa...]  # PREFETCH_AHEAD sweep
  python experiments/_probe.py trace [side] [dir]   # jax.profiler per-op table
  python experiments/_probe.py tracetrain [side]    # 50k train-step op table
  python experiments/_probe.py serve [side] [dir]   # 50k serving artifact timing
  python experiments/_probe.py serveload [dir]      # fresh-process artifact load
  python experiments/_probe.py scatter [K]    # 20NEWS-like scattered graph

Findings these modes produced: the round-≤3 numbers (DESIGN.md §11)
were depressed by a fixed ~25.6 ms/dispatch tunnel round-trip; all
modes now SLOPE-FIT two chain lengths (DESIGN.md §16).  Recalibrated:
device peaks bf16 193 TF/s (98% of datasheet) / f32 140 / int8 370
TOP/s; in-kernel taps 160 TF bf16 / 284 TOP int8 (72-82% of datasheet);
predication costs more than the skipped work; chunked row-slab DMA is
slower than the per-block pipeline.
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

def _peak_probe(name, size, dtype, iters, acc_dtype=None, precision=None):
    """XLA's own matmul rate: chained fori_loop of big square matmuls,
    SLOPE-FIT over two chain lengths so the fixed per-dispatch host
    round-trip (~25.6 ms on this tunnel — which silently depressed the
    round-1 'measured peaks' by up to 42%; DESIGN.md §16) cancels.
    Whatever this reports is the honest ``flops_per_s`` for the roofline
    model (utils/profiling.py) and the "% of peak" anchor in DESIGN.md."""
    import jax
    import jax.numpy as jnp

    from cnn_graph_tpu.utils.profiling import slope_time

    if dtype == "int8":
        a = jnp.ones((size, size), jnp.int8)
        w = jnp.ones((size, size), jnp.int8)

        def make_run(u):
            @jax.jit
            def run(a, w):
                def body(i, z):
                    # int32 accumulate; fold back to int8 with a shift so
                    # the chain stays bounded and data-dependent.
                    zz = jax.lax.dot(z, w,
                                     preferred_element_type=jnp.int32)
                    return (zz >> 12).astype(jnp.int8)

                out = jax.lax.fori_loop(0, u, body, a)
                return jnp.sum(out.astype(jnp.int32))

            return run
    else:
        dt = jnp.dtype(dtype)
        acc = acc_dtype or dt
        a = jnp.ones((size, size), dt) * 0.03
        w = jnp.eye(size, dtype=dt) * 1.0003

        def make_run(u):
            @jax.jit
            def run(a, w):
                def body(i, z):
                    return jax.lax.dot(
                        z, w, preferred_element_type=acc,
                        precision=precision,
                    ).astype(dt)

                out = jax.lax.fori_loop(0, u, body, a)
                return jnp.mean(out.astype(jnp.float32) ** 2)

            return run

    per_iter, fixed = slope_time(make_run, (a, w),
                                 units=(max(iters // 4, 2), iters))
    flops = 2 * size**3
    print(f"{name:14s} {per_iter*1e6:8.1f} us/iter  "
          f"{flops/per_iter/1e12:6.1f} "
          f"T{'OP' if dtype=='int8' else 'FLOP'}/s  "
          f"fixed={fixed*1e3:.1f} ms", flush=True)


def main_peak(argv):
    import jax.numpy as jnp

    it = int(argv[0]) if argv else 50
    _peak_probe("bf16_2048", 2048, "bfloat16", it * 8)
    _peak_probe("bf16_4096", 4096, "bfloat16", it)
    _peak_probe("bf16_8192", 8192, "bfloat16", max(it // 8, 4))
    _peak_probe("f32_4096", 4096, "float32", max(it // 4, 4))
    # Faithful fp32: precision=HIGHEST forces the multi-pass bf16
    # emulation instead of the TPU default's single-pass bf16 compute —
    # the honest ceiling for a kernel that REQUESTS full f32 precision
    # (no shipped kernel does; the V5E_FLOPS['float32'] roofline entry
    # is the default-precision rate, see utils/profiling.py).
    import jax as _jax
    _peak_probe("f32_hi_4096", 4096, "float32", max(it // 8, 4),
                precision=_jax.lax.Precision.HIGHEST)
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

    from cnn_graph_tpu.utils.profiling import slope_time

    int8 = dtype == "int8"
    dt = jnp.dtype(dtype)
    acc_dt = jnp.int32 if int8 else jnp.float32

    def make_kernel(u):
        def kernel(a_ref, b_ref, o_ref):
            def body(i, carry):
                if taps > 1:
                    # fold the carry into each RHS slab (slab rows==128).
                    # Mosaic has no vector<i8> add — route int8 through
                    # i32 (the cast cost is shared by all taps).
                    acc = jnp.zeros((m, n), acc_dt)
                    for d in range(taps):
                        if int8:
                            bb = (b_ref[d].astype(jnp.int32)
                                  + carry.astype(jnp.int32)
                                  ).astype(jnp.int8)
                        else:
                            bb = b_ref[d] + carry
                        acc += jnp.dot(a_ref[d], bb,
                                       preferred_element_type=acc_dt)
                else:
                    # deep-K: inject the dependency as one extra small
                    # tap (its FLOPs are counted in the total below).
                    acc = jnp.dot(a_ref[0], b_ref[0],
                                  preferred_element_type=acc_dt)
                    acc += jnp.dot(a_ref[0][:, :128], carry,
                                   preferred_element_type=acc_dt)
                if int8:
                    return (acc[:128, :] >> 12).astype(dt)
                return (acc[:128, :] * 1e-6).astype(dt)

            out = jax.lax.fori_loop(0, u, body, jnp.zeros((128, n), dt))
            o_ref[:] = out

        return kernel

    a = jnp.ones((taps, m, k // taps), dt)
    b = jnp.ones((taps, k // taps, n), dt)

    def make_run(u):
        kernel = make_kernel(u)

        @jax.jit
        def run(a, b):
            o = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((128, n), dt),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, b)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        return run

    # Slope fit cancels the fixed dispatch (~25.6 ms) that depressed the
    # round-2/3 in-kernel tap-rate numbers (DESIGN.md §16).
    per_iter, _fixed = slope_time(make_run, (a, b),
                                  units=(max(iters // 4, 2), iters))
    flops = 2 * m * (k + (128 if taps == 1 else 0)) * n
    tflops = flops / per_iter / 1e12
    unit = "TOP/s " if int8 else "TFLOP/s"
    peak = 394 if int8 else 197
    print(f"{name:12s} {per_iter*1e6:6.2f} us/iter "
          f"{tflops:6.1f} {unit} ({tflops/peak*100:4.1f}% of datasheet "
          f"peak)", flush=True)


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

    from cnn_graph_tpu.utils.profiling import slope_time

    dt = jnp.bfloat16
    w_arr = jnp.asarray(np.asarray(widths, np.int32))
    nw = len(widths)

    def make_run(u):
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

            out = jax.lax.fori_loop(0, u, body, jnp.zeros((k0, n), dt))
            o_ref[:] = out

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

        return run

    a = jnp.ones((taps, m, k0), dt)
    b = jnp.ones((taps, k0, n), dt)

    # Slope fit: fixed dispatch out of the per-iter number (DESIGN §16).
    per_iter, _fixed = slope_time(make_run, (w_arr, a, b),
                                  units=(max(iters // 4, 2), iters))
    mean_w = float(np.mean(widths))
    flops = 2 * m * k0 * n * (mean_w + 1)  # +1 injection tap
    print(f"{name:10s} {per_iter*1e6:6.2f} us/iter  mean_w={mean_w:.1f}  "
          f"{flops/per_iter/1e12:5.1f} TFLOP/s useful", flush=True)


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

    from cnn_graph_tpu.utils.profiling import slope_time

    def make_chain(u):
        @jax.jit
        def chain(op, x):
            def body(_, carry):
                x0, x1 = carry

                def hop(_, c):
                    a, b = c
                    return b, op.cheby_hop(b, a)

                a, b = jax.lax.fori_loop(0, K - 1, hop, (x0, x1))
                s = jax.lax.rsqrt(
                    jnp.mean(a.astype(jnp.float32) ** 2) + 1e-6
                )
                return (a * s).astype(x.dtype), b

            out = jax.lax.fori_loop(0, u, body, (x, op.matmul(x)))[1]
            return jnp.mean(out.astype(jnp.float32) ** 2)

        return chain

    for name, o in (("chunked", op),
                    ("per-block", dataclasses.replace(op, row_max=0))):
        per_block, _f = slope_time(make_chain, (o, X),
                                   units=(outer, 4 * outer))
        dt = per_block / (K - 1)
        print(f"{name:10s} {dt*1e6:7.1f} us/spmm "
              f"{op.nnz/dt/1e9:.3f} Gedges/s", flush=True)


def main_loopcost(argv):
    """Isolate the per-iteration cost of a dynamic ``fori_loop`` body
    in a Pallas kernel (the BSR kernels' structure): same total MXU
    dots, issued (a) one per fori iteration with dynamic VMEM operand
    indices, (b) eight per iteration (static unroll inside a dynamic
    loop).  The gap is the scalar-core loop/bookkeeping overhead per
    iteration — the prime suspect for scattered BSR's flat
    ~250 ns/block (x-reuse and slab-DMA strategies both measured
    no-ops; DESIGN.md §20)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cnn_graph_tpu.utils.profiling import slope_time

    N = int(argv[0]) if argv else 2048  # in-kernel dots per call (fixed)
    T, m, k, n = 16, 128, 128, 512
    dt = jnp.bfloat16

    def make_run(unroll):
        def kernel(seed_ref, a_ref, b_ref, o_ref, acc_ref):
            # Seed the accumulator from the carried input so chained
            # calls stay data-dependent (no CSE across the outer loop).
            acc_ref[:] = seed_ref[:].astype(jnp.float32)

            def body(i, carry):
                base = jax.lax.rem(i * unroll, T)
                for d in range(unroll):
                    idx = jax.lax.rem(base + d, T)
                    acc_ref[:] += jnp.dot(
                        a_ref[idx], b_ref[idx],
                        preferred_element_type=jnp.float32,
                    )
                return carry

            jax.lax.fori_loop(0, N // unroll, body, 0)
            o_ref[:] = (acc_ref[:] * 1e-3).astype(dt)

        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), dt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
        )

        def makek(u):
            @jax.jit
            def run(seed, a, b):
                out = jax.lax.fori_loop(
                    0, u, lambda _, s: call(s, a, b), seed
                )
                return jnp.sum(out.astype(jnp.float32) ** 2)

            return run

        return makek

    rng = __import__("numpy").random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(T, m, k)) * 0.01, dt)
    b = jnp.asarray(rng.normal(size=(T, k, n)) * 0.01, dt)
    seed = jnp.zeros((m, n), dt)
    flops = 2 * m * k * n
    res = {}
    for unroll in (1, 2, 4, 8):
        per_call, _f = slope_time(make_run(unroll), (seed, a, b),
                                  units=(4, 16))
        per_dot = per_call / N
        res[unroll] = per_dot
        print(f"unroll={unroll}: {per_dot*1e9:7.1f} ns/dot "
              f"{flops/per_dot/1e12:6.1f} TFLOP/s", flush=True)
    if 1 in res and 8 in res:
        ov = (res[1] - res[8]) * 8 / 7
        print(f"=> per-fori-iteration overhead ~ {ov*1e9:.0f} ns",
              flush=True)


def main_bsrgroup(argv):
    """A/B the grouped-row BSR kernel (G block-rows per grid step, one
    slab DMA) against the per-block pipeline — VERDICT round-4
    next-step #5: the ~246 ns/block fixed cost is hypothesized to be
    per-grid-step bookkeeping amortizable over G rows.  Two graphs:
    the 50k RCM city graph (banded-format territory, BSR as fallback)
    and a 50k-node embedding-kNN SCATTERED graph (the RCV1-scale
    shape, lib/utils.py:162-218 — above the dense budget, so BSR is
    its production path).  Usage: bsrgroup [n_scatter] [side]."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnn_graph_tpu.data.synthetic import city_graph
    from cnn_graph_tpu.graphs import construction as gc
    from cnn_graph_tpu.ops import cheby_finals, device_laplacian
    from cnn_graph_tpu.utils.profiling import slope_time

    n_scatter = int(argv[0]) if argv else 50000
    side = int(argv[1]) if len(argv) > 1 else 224
    K, C, outer = 25, 512, 4
    rng = np.random.default_rng(0)

    def graphs():
        L, _ = city_graph(side, k=8, seed=0)
        yield "city50k", L
        z = rng.normal(size=(n_scatter, 8)).astype(np.float32)
        dist, idx = gc.knn(z, k=10, algorithm="auto")
        W = gc.adjacency(dist, idx)
        perm = gc.bandwidth_reducing_permutation(W)
        W = W[perm][:, perm].tocsr()
        yield "scatter50k", gc.laplacian(W, normalized=True)

    def make_chain(u):
        @jax.jit
        def chain(op, x):
            def body(_, carry):
                y = cheby_finals(op, carry, K)
                s = jax.lax.rsqrt(
                    jnp.mean(y.astype(jnp.float32) ** 2) + 1e-6
                )
                return (y * s).astype(x.dtype)

            out = jax.lax.fori_loop(0, u, body, x)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        return chain

    for name, L in graphs():
        ops_v = []
        cs = device_laplacian(L, fmt="bsr", block_size=128,
                              dtype=jnp.bfloat16, use_pallas=True,
                              col_stream=True)
        ops_v.append(("colstream", cs))
        gr = device_laplacian(L, fmt="bsr", block_size=128,
                              dtype=jnp.bfloat16, use_pallas=True,
                              col_stream=False)
        if gr.rows_per_step > 1:
            ops_v.append(("grouped", gr))
            ops_v.append(("per-block",
                          dataclasses.replace(gr, rows_per_step=1,
                                              group_max=0)))
        else:
            ops_v.append(("per-block", gr))
        nb = int(gr.block_cols.shape[0])
        ncols = int(cs.cs_gcols.shape[0])
        print(f"{name}: nodes={gr.m} nnz={gr.nnz} blocks={nb} "
              f"cs_G={cs.rows_per_step} distinct_cols={ncols} "
              f"x_reuse={nb / max(ncols, 1):.2f} "
              f"grouped_G={gr.rows_per_step} Lg={gr.group_max}",
              flush=True)
        for vname, o in ops_v:
            X = jnp.asarray(rng.normal(size=(o.m_padded, C)),
                            jnp.bfloat16)
            per_block, _f = slope_time(make_chain, (o, X),
                                       units=(outer, 4 * outer))
            dt = per_block / (K - 1)
            print(f"  {vname:9s} {dt*1e6:8.1f} us/spmm "
                  f"{o.nnz/dt/1e9:.4f} Gedges/s  "
                  f"{dt/nb*1e9:6.1f} ns/block", flush=True)

        # Int8 serving chain through the column-streamed kernel (the
        # RCV1-scale quantized path: int8 tiles + int32 taps).
        from cnn_graph_tpu.ops import quantize_block_sparse

        def make_chain_q(u):
            @jax.jit
            def chain_q(qop, x):
                xq = qop.quantize(x.astype(jnp.float32))
                out = jax.lax.fori_loop(
                    0, u, lambda _, q: cheby_finals(qop, q, K), xq
                )
                return jnp.mean(qop.dequantize(out) ** 2)

            return chain_q

        qcs = quantize_block_sparse(cs, sample_x=3.0)
        Xq = jnp.asarray(rng.normal(size=(cs.m_padded, C)), jnp.bfloat16)
        per_block, _f = slope_time(make_chain_q, (qcs, Xq),
                                   units=(outer, 4 * outer))
        dt = per_block / (K - 1)
        print(f"  {'cs_int8':9s} {dt*1e6:8.1f} us/spmm "
              f"{cs.nnz/dt/1e9:.4f} Gedges/s  "
              f"{dt/nb*1e9:6.1f} ns/block", flush=True)


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

    from cnn_graph_tpu.utils.profiling import slope_time

    def make_chain(u):
        @jax.jit
        def chain_q(qop, x):
            xq = qop.quantize(x.astype(jnp.float32))

            def body(_, carry):
                def hop(_, c):
                    p, q = c
                    return q, qop.cheby_hop_q(q, p)

                return jax.lax.fori_loop(0, K - 1, hop, carry)

            out = jax.lax.fori_loop(0, u, body, (xq, qop.spmm_q(xq)))[1]
            return jnp.mean(qop.dequantize(out) ** 2)

        return chain_q

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
        per_block, _f = slope_time(make_chain, (qop, X),
                                   units=(outer, 4 * outer))
        dt = per_block / (K - 1)
        blocks = (op.band.shape[0] if op.levels
                  else op.band.shape[0] * op.band.shape[1])
        print(f"{name:11s} G={G:2d} blocks={blocks:5d} "
              f"ring={op.ring_slots:3d} {dt*1e6:7.1f} us/spmm "
              f"{op.nnz/dt/1e9:.4f} Gedges/s", flush=True)


def main_dkw(argv):
    """A/B the deep-K window kernel (one wide [br, W*bc] dot per
    block-row, contiguous x window via mirrored ring slots) against the
    shipped tap-loop ragged kernel on the 50k donated chains — VERDICT
    round-4 next-step #1: the slope-fit mxu probe says the deep-K dot
    shape runs ~10% faster for int8 (311 vs 283.6 TOP/s) and the
    tap-loop per-dot issue overhead is the prime suspect for the
    in-kernel gap (189.3 measured vs 167 tap-bound us/spmm)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnn_graph_tpu.data.synthetic import city_graph
    from cnn_graph_tpu.ops import (
        cheby_finals,
        device_laplacian,
        quantize_banded,
    )
    from cnn_graph_tpu.ops.pallas_band import (
        banded_call_dkw,
        pack_dkw_from_ragged,
    )
    from cnn_graph_tpu.utils.profiling import slope_time

    side = int(argv[0]) if argv else 224
    G_override = int(argv[1]) if len(argv) > 1 else None
    K, C, outer = 25, 512, 4
    L, _ = city_graph(side, k=8, seed=0)
    op = device_laplacian(L, fmt="banded", dtype=jnp.bfloat16,
                          rows_per_step=G_override)
    qop = quantize_banded(op, sample_x=3.0)
    print(f"G={op.rows_per_step} levels={op.levels} "
          f"ring={op.ring_slots}", flush=True)
    int8_only = G_override is not None  # big-G bf16 can exceed VMEM
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(op.m_padded, C)), jnp.bfloat16)

    def dkw_parts(o):
        bands, sched = pack_dkw_from_ragged(
            np.asarray(jax.device_get(o.band)), o.sched, o.levels,
            o.rows_per_step, *o.block_shape,
        )
        return [jnp.asarray(b) for b in bands], jnp.asarray(sched)

    bands_q, sched_q = dkw_parts(qop)
    bands_f, sched_f = dkw_parts(op)

    def make_current_q(u):
        @jax.jit
        def chain(qop, x):
            xq = qop.quantize(x.astype(jnp.float32))
            out = jax.lax.fori_loop(
                0, u, lambda _, q: cheby_finals(qop, q, K), xq
            )
            return jnp.mean(qop.dequantize(out) ** 2)

        return chain

    def make_current_f(u):
        @jax.jit
        def chain(op, x):
            def body(_, carry):
                y = cheby_finals(op, carry, K)
                s = jax.lax.rsqrt(
                    jnp.mean(y.astype(jnp.float32) ** 2) + 1e-6
                )
                return (y * s).astype(x.dtype)

            out = jax.lax.fori_loop(0, u, body, x)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        return chain

    def dkw_finals(o, bands, sched, x, quant):
        """cheby_finals twin through the dkw kernel (donated hops)."""
        def hop(x1, x0):
            return banded_call_dkw(
                bands, o.base, sched, x1, x0, levels=o.levels,
                ring=o.ring_slots, G=o.rows_per_step,
                out_rows=o.m_padded,
                band_scale=(o.band_scale if quant else None),
                donate_x0=True,
            )

        def first(x1):
            return banded_call_dkw(
                bands, o.base, sched, x1, levels=o.levels,
                ring=o.ring_slots, G=o.rows_per_step,
                out_rows=o.m_padded,
                band_scale=(o.band_scale if quant else None),
            )

        p, q = x, first(x)
        n = K - 2

        def body(_, carry):
            pp, qq = carry
            r = hop(qq, pp)
            s = hop(r, qq)
            return r, s

        p, q = jax.lax.fori_loop(0, n // 2, body, (p, q))
        if n % 2:
            q = hop(q, p)
        return q

    def make_dkw_q(u):
        @jax.jit
        def chain(qop, bands, sched, x):
            xq = qop.quantize(x.astype(jnp.float32))
            out = jax.lax.fori_loop(
                0, u,
                lambda _, q: dkw_finals(qop, bands, sched, q, True), xq
            )
            return jnp.mean(qop.dequantize(out) ** 2)

        return chain

    def make_dkw_f(u):
        @jax.jit
        def chain(op, bands, sched, x):
            def body(_, carry):
                y = dkw_finals(op, bands, sched, carry, False)
                s = jax.lax.rsqrt(
                    jnp.mean(y.astype(jnp.float32) ** 2) + 1e-6
                )
                return (y * s).astype(x.dtype)

            out = jax.lax.fori_loop(0, u, body, x)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        return chain

    # Correctness on-chip first (scalar agreement over one K-chain).
    @jax.jit
    def agree(qop, bands, sched, x):
        xq = qop.quantize(x.astype(jnp.float32))
        a = cheby_finals(qop, xq, K)
        b = dkw_finals(qop, bands, sched, xq, True)
        return jnp.max(jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32)))

    d = int(jax.device_get(agree(qop, bands_q, sched_q, X)))
    print(f"int8 K={K} chain dkw-vs-tap maxdiff: {d} (bit-exact=0)",
          flush=True)

    variants = [
        ("tap_int8", make_current_q, (qop, X)),
        ("dkw_int8", make_dkw_q, (qop, bands_q, sched_q, X)),
    ]
    if not int8_only:
        variants += [
            ("tap_bf16", make_current_f, (op, X)),
            ("dkw_bf16", make_dkw_f, (op, bands_f, sched_f, X)),
        ]
    for name, mk, args in variants:
        per_block, _f = slope_time(mk, args, units=(outer, 4 * outer))
        dt = per_block / (K - 1)
        print(f"{name:9s} {dt*1e6:7.1f} us/spmm "
              f"{op.nnz/dt/1e9:.4f} Gedges/s", flush=True)


def main_pa(argv):
    """PREFETCH_AHEAD sweep on the int8 ragged K=25 chain (VERDICT
    round-3 next-step #1): a deeper band-slab pipeline (pa super-steps of
    DMA lookahead, pa+1 slab buffers in VMEM) can only help if the kernel
    is stalling on band DMA waits — DESIGN.md §11's probes say DMAs are
    hidden, so parity here localizes the ~70us gap to the in-kernel tap
    rate/epilogue instead.  Rings are re-sized host-side for each pa from
    the schedule's column high-water row."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnn_graph_tpu.data.synthetic import city_graph
    from cnn_graph_tpu.ops import device_laplacian, quantize_banded
    from cnn_graph_tpu.ops.pallas_band import banded_call_ragged

    side = int(argv[0]) if argv else 224
    pas = [int(a) for a in argv[1:]] or [1, 2, 3]
    K, C, outer = 25, 512, 4
    L, _ = city_graph(side, k=8, seed=0)
    op = device_laplacian(L, fmt="banded", dtype=jnp.bfloat16)
    qop = quantize_banded(op, sample_x=3.0)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(op.m_padded, C)), jnp.float32)

    base = np.asarray(qop.base, np.int64)
    hw = np.asarray(qop.sched[2], np.int64)
    nsb = len(hw)
    G = qop.rows_per_step
    sched = jnp.asarray(np.asarray(qop.sched, np.int32))

    from cnn_graph_tpu.utils.profiling import slope_time

    for pa in pas:
        started = hw[np.minimum(np.arange(nsb) + pa, nsb - 1)]
        ring = int((started - base[np.arange(nsb) * G]).max()) + 1

        def make_chain(u, pa=pa, ring=ring):
            @jax.jit
            def chain_q(qop, x):
                def hop(x1, x0):
                    return banded_call_ragged(
                        qop.band, qop.base, sched, x1, x0,
                        levels=qop.levels, ring=ring, G=G,
                        out_rows=qop.m_padded, band_scale=qop.band_scale,
                        prefetch_ahead=pa,
                    )

                xq = qop.quantize(x)

                def body(_, carry):
                    def step(_, c):
                        p, q = c
                        return q, hop(q, p)

                    return jax.lax.fori_loop(0, K - 1, step, carry)

                out = jax.lax.fori_loop(
                    0, u, body,
                    (xq, banded_call_ragged(
                        qop.band, qop.base, sched, xq, levels=qop.levels,
                        ring=ring, G=G, out_rows=qop.m_padded,
                        band_scale=qop.band_scale, prefetch_ahead=pa))
                )[1]
                return jnp.mean(qop.dequantize(out) ** 2)

            return chain_q

        # Slope fit over two outer counts (fixed dispatch cancelled;
        # DESIGN.md §16).
        per_block, _fixed = slope_time(make_chain, (qop, X),
                                       units=(outer, 4 * outer))
        dt = per_block / (K - 1)
        print(f"pa={pa} ring={ring:3d} {dt*1e6:7.1f} us/spmm "
              f"{op.nnz/dt/1e9:.4f} Gedges/s", flush=True)


def main_trace(argv):
    """Capture a jax.profiler trace of the int8 K=25 chain and print the
    per-op duration table parsed from the trace proto — the trace-backed
    attribution VERDICT round-3 asked for (utils.profiling.trace was
    built in round 1 but never used in a recorded analysis)."""
    import glob
    import gzip
    import json
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnn_graph_tpu.data.synthetic import city_graph
    from cnn_graph_tpu.ops import device_laplacian, quantize_banded
    from cnn_graph_tpu.utils.profiling import trace

    side = int(argv[0]) if argv else 224
    K, C, outer = 25, 512, 2
    L, _ = city_graph(side, k=8, seed=0)
    op = device_laplacian(L, fmt="banded", dtype=jnp.bfloat16)
    qop = quantize_banded(op, sample_x=3.0)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(op.m_padded, C)), jnp.float32)

    @jax.jit
    def chain_q(qop, x):
        xq = qop.quantize(x)

        def body(_, carry):
            def hop(_, c):
                p, q = c
                return q, qop.cheby_hop_q(q, p)

            return jax.lax.fori_loop(0, K - 1, hop, carry)

        out = jax.lax.fori_loop(0, outer, body, (xq, qop.spmm_q(xq)))[1]
        return jnp.mean(qop.dequantize(out) ** 2)

    # Warm (compile + device program load), then trace one steady call.
    print("warm:", float(jax.device_get(chain_q(qop, X))), flush=True)
    log_dir = argv[1] if len(argv) > 1 else "/tmp/cnn_graph_trace"
    with trace(log_dir):
        s = float(jax.device_get(chain_q(qop, X)))
    print("traced call scalar:", s, flush=True)

    _print_trace_table(log_dir)


def _print_trace_table(log_dir, top=18):
    """Parse the newest chrome-trace (trace.json.gz) under ``log_dir``
    and print device op durations aggregated by name."""
    import glob
    import gzip
    import json
    import os

    paths = sorted(glob.glob(
        os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True
    ), key=os.path.getmtime)
    if not paths:
        print("NO TRACE FILES under", log_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    durs = {}
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        key = (pname.split(" ")[0], e.get("name", "?"))
        d = durs.setdefault(key, [0.0, 0])
        d[0] += e.get("dur", 0.0)
        d[1] += 1
    total = sum(v[0] for v in durs.values())
    print(f"\ndevice rows: {len(durs)} ops, {total/1e3:.2f} ms total")
    for (pname, name), (dur, cnt) in sorted(
        durs.items(), key=lambda kv: -kv[1][0]
    )[:top]:
        print(f"{dur/1e3:9.3f} ms  x{cnt:4d}  {name[:80]}")
    print("\ntrace dir:", log_dir, "->", paths[-1])


def main_tracetrain(argv):
    """Trace ONE 50k NodeClassifier train step (fwd chain + streamed
    taps/dW + adam) and print the device-op table — the attribution
    behind DESIGN.md §18's train-step anatomy.  A second argument sets
    hidden widths (comma-separated, e.g. ``tracetrain 224 512``): every
    layer past the first pays the K-1-hop backward ADJOINT chain
    (band_cheby_hop_c), so the deep trace attributes adjoint-hop cost
    vs the forward hop (DESIGN.md §20)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from cnn_graph_tpu.data.synthetic import city_graph
    from cnn_graph_tpu.models import NodeClassifier
    from cnn_graph_tpu.ops import device_laplacian
    from cnn_graph_tpu.utils.profiling import trace

    side = int(argv[0]) if argv else 224
    hidden = ([int(v) for v in argv[1].split(",")]
              if len(argv) > 1 and argv[1] else [])
    K, C, n_classes = 25, 512, 16
    L, _ = city_graph(side, k=8, seed=0)
    op = device_laplacian(L, fmt="auto", dtype=jnp.bfloat16)
    rng = np.random.default_rng(2)
    m = op.m_padded
    model = NodeClassifier(op, input_features=C, num_classes=n_classes,
                           hidden=hidden, K=K)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    state = opt.init(params)
    feats = jnp.asarray(rng.normal(size=(m, C)), jnp.float32)
    y = jnp.asarray(rng.integers(0, n_classes, m), jnp.int32)
    mask = jnp.ones((m,), bool)

    @jax.jit
    def step(op, params, state, feats, y, mask):
        loss, g = jax.value_and_grad(model.loss)(params, feats, y, mask)
        up, state = opt.update(g, state, params)
        return optax.apply_updates(params, up), state, loss

    out = step(op, params, state, feats, y, mask)
    print(f"warm loss: {float(jax.device_get(out[2]))} "
          f"(hidden={hidden})", flush=True)
    log_dir = argv[2] if len(argv) > 2 else "/tmp/cnn_graph_trace_train"
    with trace(log_dir):
        s = float(jax.device_get(
            step(op, params, state, feats, y, mask)[2]
        ))
    print("traced loss:", s, flush=True)
    _print_trace_table(log_dir)


def _serve_model(side):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnn_graph_tpu.data.synthetic import city_graph
    from cnn_graph_tpu.models import NodeClassifier
    from cnn_graph_tpu.ops import device_laplacian

    K, C, n_classes = 25, 512, 16
    L, _ = city_graph(side, k=8, seed=0)
    op = device_laplacian(L, fmt="banded", dtype=jnp.bfloat16)
    model = NodeClassifier(op, input_features=C, num_classes=n_classes,
                           hidden=[], K=K)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(op.m_padded, C)), jnp.float32)
    return model, params, x, op


def _time_calls(fn, x, iters=5):
    import jax
    import numpy as np

    y = np.asarray(jax.device_get(fn(x)))  # load + warm
    assert np.all(np.isfinite(y))
    t0 = time.time()
    for _ in range(iters):
        y = jax.device_get(fn(x))
    return (time.time() - t0) / iters


def main_serve(argv):
    """Serving latency at the HEADLINE scale (VERDICT round-3 next-step
    #9): export the 50k int8 NodeClassifier artifact, time the
    in-process AOT handle, then time the loaded artifact — run
    ``serveload`` in a FRESH process afterwards for the no-model-code
    number (one TPU process at a time on this tunnel)."""
    import jax

    from cnn_graph_tpu import serve

    side = int(argv[0]) if argv else 224
    path = argv[1] if len(argv) > 1 else "/tmp/serve50k_artifact"
    model, params, x, op = _serve_model(side)
    print(f"model: {op.m} nodes, K=25 C=512 int8 banded", flush=True)

    t0 = time.time()
    cs = serve.compile_serving(model, params, x)
    print(f"compile_serving: {time.time()-t0:.1f}s", flush=True)
    dt = _time_calls(cs, x)
    print(f"in-process AOT handle: {dt*1e3:.1f} ms/call "
          f"(steady-state, through the tunnel)", flush=True)

    t0 = time.time()
    serve.export_serving(model, params, x, path)
    print(f"export_serving: {time.time()-t0:.1f}s -> {path}", flush=True)

    t0 = time.time()
    ls = serve.load_serving(path)
    load_s = time.time() - t0
    t0 = time.time()
    dt1 = _time_calls(ls, x, iters=1)  # includes the re-jit trace
    dt2 = _time_calls(ls, x)
    print(f"same-process load: {load_s:.1f}s; first-call "
          f"{dt1*1e3:.1f} ms (re-jit + program load), steady "
          f"{dt2*1e3:.1f} ms/call", flush=True)


def main_serveload(argv):
    """Fresh-process load of a main_serve artifact: the cross-process
    serving number (no model code, cold jit of exp.call)."""
    import numpy as np
    import jax.numpy as jnp

    from cnn_graph_tpu import serve

    path = argv[0] if argv else "/tmp/serve50k_artifact"
    t0 = time.time()
    ls = serve.load_serving(path)
    print(f"load_serving: {time.time()-t0:.1f}s", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=tuple(ls.meta["input_shape"])),
                    jnp.dtype(ls.meta["input_dtype"]))
    t0 = time.time()
    dt1 = _time_calls(ls, x, iters=1)
    dt2 = _time_calls(ls, x)
    print(f"fresh-process first-call {dt1*1e3:.1f} ms (cold jit of the "
          f"deserialized module + device program load), steady "
          f"{dt2*1e3:.1f} ms/call", flush=True)


def main_raggedshard(argv):
    """Exercise the ragged sharded band's PREFIX/INTERIOR/SUFFIX Pallas
    passes on the real chip (ADVICE round-4 #5): at nodes=1 the natural
    boundary split is empty, so `force_boundary` manufactures one —
    the three-region run must agree exactly with the unsplit pass
    (per-row arithmetic is split-independent), proving the sliced
    schedules (sched prefix, sched_int, sched_suf) drive the kernel
    correctly on hardware, not just through the CPU-mesh oracle."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnn_graph_tpu.data.synthetic import city_graph
    from cnn_graph_tpu.parallel import banded_halo_laplacian, make_mesh

    side = int(argv[0]) if argv else 96
    K = 8
    L, _ = city_graph(side, k=8, seed=0)
    mesh = make_mesh(data=1, nodes=1)
    plain = banded_halo_laplacian(L, mesh, dtype=jnp.bfloat16)
    forced = banded_halo_laplacian(
        L, mesh, dtype=jnp.bfloat16,
        force_boundary=2 * plain.rows_per_step,
    )
    print(f"nodes=1 side={side}: plain pre/suf="
          f"{plain.boundary_pre}/{plain.boundary_suf} forced="
          f"{forced.boundary_pre}/{forced.boundary_suf} "
          f"(G={forced.rows_per_step}, overlap={forced.overlap})",
          flush=True)
    assert forced.overlap and forced.boundary_pre > 0

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(plain.m_padded, 256)), jnp.bfloat16)

    @jax.jit
    def diff(a, b, x):
        ya = a.cheby_chain(x, K)
        yb = b.cheby_chain(x, K)
        return jnp.max(jnp.abs(ya.astype(jnp.float32)
                               - yb.astype(jnp.float32)))

    with mesh:
        d = float(jax.device_get(diff(plain, forced, X)))
    print(f"K={K} chain split-vs-unsplit maxdiff: {d} (expect 0.0)",
          flush=True)
    assert d == 0.0, d

    # Int8 bit-exactness of the SHARDED chain (deep-K window regions)
    # vs the single-chip quantized chain: identical integer arithmetic
    # per row regardless of layout/levels, so the comparison is exact.
    from cnn_graph_tpu.ops import device_laplacian, quantize_banded
    from cnn_graph_tpu.parallel import quantize_banded_halo

    sop = quantize_banded(
        device_laplacian(L, fmt="banded", dtype=jnp.bfloat16),
        sample_x=3.0,
    )
    qh = quantize_banded_halo(forced, sample_x=3.0)
    m = min(sop.m_padded, plain.m_padded)
    xq_np = np.random.default_rng(1).integers(
        -100, 100, (max(sop.m_padded, plain.m_padded), 256)
    ).astype(np.int8)

    @jax.jit
    def chain_single(q, x):
        b = [x, q.spmm_q(x)]
        for _ in range(2, K):
            b.append(q.cheby_hop_q(b[-1], b[-2]))
        return jnp.stack(b)

    @jax.jit
    def chain_shard(q, x):
        return q.cheby_chain_q(x, K)

    want = jax.device_get(chain_single(sop,
                                       jnp.asarray(xq_np[:sop.m_padded])))
    with mesh:
        got = jax.device_get(chain_shard(qh,
                                         jnp.asarray(xq_np[:plain.m_padded])))
    eq = np.array_equal(np.asarray(got)[:, :m], np.asarray(want)[:, :m])
    print(f"int8 sharded(dkw,split) vs single-chip chain bit-exact: {eq}",
          flush=True)
    assert eq


def main_filters10k(argv):
    """Every non-Chebyshev filter at the 10k-word text topology
    (VERDICT round-4 next-step #7): fourier is the reference's actual
    20NEWS variant (20news.ipynb cell 20, lib/filter.py:11-42), spline
    rides the same eigenbasis, lanczos is the device Krylov filter.
    Reports host basis-build cost + slope-fit per-conv device cost at
    the scale where these filters' O(M^2) basis actually bites."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnn_graph_tpu.data.text import synthetic_text_dataset
    from cnn_graph_tpu.graphs import construction as gc
    from cnn_graph_tpu.models.chebnet import bspline_basis
    from cnn_graph_tpu.ops import (
        cheby_conv,
        device_laplacian,
        fourier_conv,
        lanczos_conv,
    )
    from cnn_graph_tpu.utils.profiling import slope_time

    K, Fin, Fout, B = 5, 4, 4, 1
    n_words = int(argv[0]) if argv else 10000

    t0 = time.time()
    ds = synthetic_text_dataset(n_docs=4000, vocab_size=12000, seed=0)
    ds.clean_text()
    ds.vectorize()
    ds.remove_short_documents(nwords=5)
    ds.keep_top_words(n_words, Mprint=0)
    ds.embed(size=64, seed=0)
    dist, idx = gc.knn(ds.embeddings.astype(np.float32), k=16,
                       algorithm="auto")
    W = gc.adjacency(dist, idx)
    perm = gc.bandwidth_reducing_permutation(W)
    W = W[perm][:, perm].tocsr()
    L = gc.laplacian(W, normalized=True)
    m = L.shape[0]
    print(f"graph build: {m} words, {L.nnz} nnz, {time.time()-t0:.0f}s",
          flush=True)

    op = device_laplacian(L, fmt="auto", dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, m, Fin)), jnp.float32)

    # Host basis costs (the O(M^3) eigendecomposition dominates).
    t0 = time.time()
    lam, U = gc.fourier(L)
    t_eig = time.time() - t0
    print(f"fourier basis (host eigh {m}x{m}): {t_eig:.0f}s", flush=True)
    Uj = jnp.asarray(U, jnp.float32)
    Bmat = jnp.asarray(bspline_basis(K, lam, 3))

    w_cheb = jnp.asarray(rng.normal(size=(K, Fin, Fout)) * 0.1,
                         jnp.float32)
    w_four = jnp.asarray(rng.normal(size=(m, Fout, Fin)) * 0.1,
                         jnp.float32)
    w_spl = jnp.asarray(rng.normal(size=(K, Fout, Fin)) * 0.1,
                        jnp.float32)

    def chain(conv, *args):
        def make(u):
            @jax.jit
            def run(*a):
                def body(_, carry):
                    y = conv(carry, *a[1:])
                    s = jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)
                    # keep the carry shape: project y back onto Fin lanes
                    return (carry * 0.9 + 0.1 * s
                            * y[..., :Fin] if y.shape[-1] != Fin
                            else y * s)

                out = jax.lax.fori_loop(0, u, body, a[0])
                return jnp.mean(out ** 2)

            return run

        return slope_time(make, args, units=(2, 8))

    t0 = time.time()
    per, _ = chain(lambda v, w: cheby_conv(v, op, w), x, w_cheb)
    print(f"chebyshev  K={K}: {per*1e3:8.2f} ms/conv "
          f"(compile+warm {time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    per, _ = chain(lambda v, U, w: fourier_conv(v, U, w), x, Uj, w_four)
    print(f"fourier       : {per*1e3:8.2f} ms/conv "
          f"(compile+warm {time.time()-t0:.0f}s)", flush=True)

    def spline(v, U, Bm, w):
        w_freq = jnp.einsum("mk,kof->mof", Bm, w)
        return fourier_conv(v, U, w_freq)

    t0 = time.time()
    per, _ = chain(spline, x, Uj, Bmat, w_spl)
    print(f"spline     K={K}: {per*1e3:8.2f} ms/conv "
          f"(compile+warm {time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    per, _ = chain(lambda v, w: lanczos_conv(v, op, w), x, w_cheb)
    print(f"lanczos    K={K}: {per*1e3:8.2f} ms/conv "
          f"(compile+warm {time.time()-t0:.0f}s)", flush=True)


def main_scatter(argv):
    """Reference-realistic SCATTERED graph (VERDICT round-3 next-step
    #3): the 20NEWS GC32 topology — a 10k-word embedding kNN graph
    (lib/utils.py:127-150 embed -> knn; 20news.ipynb cell 22) — built
    from synthetic_text_dataset, RCM'd, and measured on-chip in every
    applicable format.  Host analysis first: band_stats W and what
    fmt='auto' picks; then the K-hop chain through BSR, dense, and (if
    it ever fits) banded.  Key host finding this mode records: at 128-
    tile granularity a 10k-node scattered kNN graph is ~half block-DENSE
    (measured 3359 of 6241 blocks occupied, W=60 after RCM), so the
    banded format is impossible and dense is a real contender."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnn_graph_tpu.data.text import synthetic_text_dataset
    from cnn_graph_tpu.graphs import construction as gc
    from cnn_graph_tpu.ops import device_laplacian
    from cnn_graph_tpu.ops.laplacian import band_stats

    K = int(argv[0]) if argv else 5  # GC32 uses K=5; pass 25 for stress
    C, outer = 512, 4

    ds = synthetic_text_dataset(n_docs=4000, vocab_size=12000, seed=0)
    ds.clean_text()
    ds.vectorize()
    ds.remove_short_documents(nwords=5)
    ds.keep_top_words(10000, Mprint=0)
    ds.embed(size=64, seed=0)
    dist, idx = gc.knn(ds.embeddings.astype(np.float32), k=16,
                       algorithm="auto")
    W = gc.adjacency(dist, idx)
    perm = gc.bandwidth_reducing_permutation(W)
    W = W[perm][:, perm].tocsr()
    L = gc.laplacian(W, normalized=True)
    base, Wb, nblocks, mp = band_stats(L)
    n_rb = len(base)
    print(f"graph: {L.shape[0]} words, {L.nnz} nnz; RCM band W={Wb} "
          f"blocks (cap 32), occupied {nblocks}/{n_rb * n_rb} "
          f"({nblocks / n_rb**2:.2f} block-dense)", flush=True)

    auto = device_laplacian(L, fmt="auto", dtype=jnp.bfloat16)
    print(f"fmt='auto' picks: {type(auto).__name__}", flush=True)

    from cnn_graph_tpu.ops import cheby_finals
    from cnn_graph_tpu.utils.profiling import slope_time

    rng = np.random.default_rng(0)

    def make_chain(u):
        @jax.jit
        def chain(op, x):
            def body(_, carry):
                y = cheby_finals(op, carry, K)
                s = jax.lax.rsqrt(
                    jnp.mean(y.astype(jnp.float32) ** 2) + 1e-6
                )
                return (y * s).astype(x.dtype)

            out = jax.lax.fori_loop(0, u, body, x)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        return chain

    for name, op in (("bsr", device_laplacian(L, fmt="bsr",
                                              dtype=jnp.bfloat16)),
                     ("dense", device_laplacian(L, fmt="dense",
                                                dtype=jnp.bfloat16))):
        X = jnp.asarray(rng.normal(size=(op.m_padded, C)), jnp.bfloat16)
        # Slope fit (fixed dispatch cancelled; DESIGN.md §16).  K=5 makes
        # a block only 4 SpMMs, so use more outer blocks per unit.
        per_block, _fixed = slope_time(make_chain, (op, X),
                                       units=(outer, 8 * outer))
        dt = per_block / (K - 1)
        print(f"{name:6s} {dt*1e6:8.1f} us/spmm "
              f"{op.nnz/dt/1e9:.4f} Gedges/s  ({type(op).__name__})",
              flush=True)


MODES = {"peak": main_peak, "mxu": main_mxu, "pred": main_pred,
         "bsr": main_bsr, "bsrgroup": main_bsrgroup, "band": main_band,
         "dkw": main_dkw, "pa": main_pa, "trace": main_trace,
         "tracetrain": main_tracetrain, "serve": main_serve,
         "serveload": main_serveload, "scatter": main_scatter,
         "filters10k": main_filters10k, "raggedshard": main_raggedshard,
         "loopcost": main_loopcost}

if __name__ == "__main__":
    if len(sys.argv) < 2 or sys.argv[1] not in MODES:
        print(__doc__)
        sys.exit(1)
    MODES[sys.argv[1]](sys.argv[2:])
