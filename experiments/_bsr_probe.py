"""A/B: chunked row-slab DMA vs per-block pipeline in the BSR kernel.

Same graph, same kernel maths — only the block fetch strategy differs
(BlockSparseLaplacian.row_max toggles it).  K=25 recurrence timing via
the scalar-fetch chain, like bench.py's big section.
"""

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from experiments import _common  # noqa: E402,F401


def main():
    import jax
    import jax.numpy as jnp

    from cnn_graph_tpu.data.synthetic import city_graph
    from cnn_graph_tpu.ops import device_laplacian

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 224
    K, C, outer = 25, 512, 4
    L, _ = city_graph(side, k=8, seed=0)
    op = device_laplacian(L, fmt="bsr", block_size=128,
                          dtype=jnp.bfloat16, use_pallas=True,
                          chunked_rows=True)
    print(f"nodes={op.m} nnz={op.nnz} blocks={int(op.block_cols.shape[0])} "
          f"row_max={op.row_max}", flush=True)
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
        s = float(jax.device_get(chain(o, X)))
        assert np.isfinite(s)
        t0 = time.perf_counter()
        jax.device_get(chain(o, X))
        dt = (time.perf_counter() - t0) / (outer * (K - 1))
        print(f"{name:10s} {dt*1e6:7.1f} us/spmm "
              f"{op.nnz/dt/1e9:.3f} Gedges/s", flush=True)


if __name__ == "__main__":
    main()
