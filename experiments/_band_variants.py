"""Diagnostic: time banded-kernel variants to locate the bottleneck.

Variants monkeypatch the kernel body: full (baseline), taps1 (all DMAs,
one matmul tap), nodma (all taps, x ring never refreshed — wrong math,
timing only).  Not part of the bench.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

cache = "/tmp/jax_band_variants_cache"
os.environ["JAX_COMPILATION_CACHE_DIR"] = cache

import numpy as np  # noqa: E402


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import cnn_graph_tpu.ops.pallas_band as pb
    from cnn_graph_tpu.graphs import construction as gc
    from cnn_graph_tpu.ops import device_laplacian

    side, K, C, outer = 224, 25, 512, 4
    rng = np.random.default_rng(0)
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    z = np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float32)
    z += rng.normal(0, 0.3, z.shape).astype(np.float32)
    dist, idx = gc.knn(z, k=8, algorithm="auto")
    W = gc.adjacency(dist, idx)
    perm = gc.bandwidth_reducing_permutation(W)
    W = W[perm][:, perm].tocsr()
    L = gc.laplacian(W, normalized=True)
    op = device_laplacian(L, fmt="banded", dtype=jnp.bfloat16)
    X = jnp.asarray(rng.normal(size=(op.m_padded, C)), jnp.bfloat16)
    print(f"band={tuple(op.band.shape)} ring={op.ring_slots}", flush=True)

    orig_kernel = pb._kernel

    def make_variant(taps=None, skip_x_dma=False, skip_band_dma=False,
                     static_slots=False):
        def kern(base_ref, band_ref, x_ref, y_ref, bandbuf, xring, bsem,
                 xsem, *, W, br, bc, tc, R):
            i = pl.program_id(1)
            j = pl.program_id(0)
            nbr = pl.num_programs(1)
            PA = pb.PREFETCH_AHEAD
            NB = pb._NB

            def band_dma(row, slot):
                return pltpu.make_async_copy(
                    band_ref.at[row], bandbuf.at[slot], bsem.at[slot])

            def x_dma(col):
                return pltpu.make_async_copy(
                    x_ref.at[pl.ds(col * bc, bc), pl.ds(j * tc, tc)],
                    xring.at[jax.lax.rem(col, R)],
                    xsem.at[jax.lax.rem(col, R)])

            def start_cols(lo, hi):
                jax.lax.fori_loop(lo, hi,
                                  lambda c, _: (x_dma(c).start(), 0)[1], 0)

            def wait_cols(lo, hi):
                jax.lax.fori_loop(lo, hi,
                                  lambda c, _: (x_dma(c).wait(), 0)[1], 0)

            base_i = base_ref[i]
            last = nbr - 1
            if not skip_band_dma:
                @pl.when(i == 0)
                def _():
                    for r in range(PA):
                        @pl.when(r < nbr)
                        def _(r=r):
                            band_dma(r, r % NB).start()

                @pl.when(i + PA < nbr)
                def _():
                    band_dma(i + PA, jax.lax.rem(i + PA, NB)).start()
                band_dma(i, jax.lax.rem(i, NB)).wait()
            if not skip_x_dma:
                @pl.when(i == 0)
                def _():
                    start_cols(base_i,
                               base_ref[jnp.minimum(PA - 1, last)] + W)
                    wait_cols(base_i, base_i + W)
                start_cols(base_ref[jnp.minimum(i + PA - 1, last)] + W,
                           base_ref[jnp.minimum(i + PA, last)] + W)

                @pl.when(i > 0)
                def _():
                    wait_cols(base_ref[jnp.maximum(i - 1, 0)] + W,
                              base_i + W)

            slot = jax.lax.rem(i, NB)
            acc = jnp.zeros((br, tc), jnp.float32)
            for d in range(W if taps is None else taps):
                xi = (d % R) if static_slots else jax.lax.rem(base_i + d, R)
                bs = (0 if static_slots else slot)
                acc += jnp.dot(bandbuf[bs, d], xring[xi],
                               preferred_element_type=jnp.float32)
            y_ref[:] = acc.astype(y_ref.dtype)

        return kern

    def timed(name, kern):
        pb._kernel = kern

        @jax.jit
        def chain(op, x):
            def body(_, carry):
                x0, x1 = carry

                def hop(_, c):
                    a, b = c
                    return b, 2.0 * op.matmul(b) - a

                a, b = jax.lax.fori_loop(0, K - 1, hop, (x0, x1))
                scale = jax.lax.rsqrt(
                    jnp.mean(a.astype(jnp.float32) ** 2) + 1e-6)
                return (a * scale).astype(x.dtype), b

            out = jax.lax.fori_loop(0, outer, body, (x, op.matmul(x)))[1]
            return jnp.mean(out.astype(jnp.float32) ** 2)

        t0 = time.time()
        jax.device_get(chain(op, X))
        t_compile = time.time() - t0
        t0 = time.time()
        jax.device_get(chain(op, X))
        dt = (time.time() - t0) / (outer * (K - 1))
        print(f"{name}: {dt*1e6:.0f}us/spmm (compile+warm {t_compile:.1f}s)",
              flush=True)
        pb._kernel = orig_kernel

    timed("full", make_variant())
    timed("taps1", make_variant(taps=1))
    timed("nodma_x", make_variant(skip_x_dma=True))
    timed("nodma_band", make_variant(skip_band_dma=True))
    timed("static_slots", make_variant(static_slots=True))
    timed("taps1_nodma", make_variant(taps=1, skip_x_dma=True,
                                      skip_band_dma=True))


if __name__ == "__main__":
    main()
