"""Compile/steady-state probe: big-graph Chebyshev chains per format.

Measures, per graph size: host precompute, trace+lower, compile, first
execute, steady-state — to pin down where the remote-compile time goes.
Not part of the bench; a diagnostic kept for regression hunting.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

cache = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_probe_cache"
os.environ["JAX_COMPILATION_CACHE_DIR"] = cache

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from cnn_graph_tpu.data.synthetic import city_graph
    from cnn_graph_tpu.ops import device_laplacian

    K, C, outer = 25, 512, 4
    fmts = (sys.argv[3] if len(sys.argv) > 3 else "bsr,banded").split(",")

    for side in [int(s) for s in (sys.argv[2] if len(sys.argv) > 2
                                  else "224,316").split(",")]:
        t0 = time.time()
        rng = np.random.default_rng(0)
        L, _ = city_graph(side, k=8, seed=0)
        t_host = time.time() - t0
        print(f"side={side} host={t_host:.1f}s", flush=True)
        for f in fmts:
            # "banded:256x128[:G]" probes a banded block shape / row batch.
            parts = f.split(":")
            name = parts[0]
            block = (tuple(int(v) for v in parts[1].split("x"))
                     if len(parts) > 1 and parts[1] else "auto")
            G = int(parts[2]) if len(parts) > 2 else None
            op = device_laplacian(L, fmt=name, block_size=block,
                                  use_pallas=True, dtype=jnp.bfloat16,
                                  rows_per_step=G)
            extra = (f"nblocks={op.blocks.shape[0]}" if name == "bsr" else
                     f"band={tuple(op.band.shape)} ring={op.ring_slots} "
                     f"G={op.rows_per_step}")
            print(f"  fmt={f} nodes={op.m} nnz={op.nnz} {extra}", flush=True)
            probe_fmt(op, K, C, outer, rng)


def probe_fmt(op, K, C, outer, rng):
    import jax
    import jax.numpy as jnp

    X = jnp.asarray(rng.normal(size=(op.m_padded, C)), jnp.bfloat16)

    def chain(op, x):
        def body(_, carry):
            x0, x1 = carry

            def hop(_, c):
                a, b = c
                return b, op.cheby_hop(b, a)

            a, b = jax.lax.fori_loop(0, K - 1, hop, (x0, x1))
            scale = jax.lax.rsqrt(
                jnp.mean(a.astype(jnp.float32) ** 2) + 1e-6)
            return (a * scale).astype(x.dtype), b

        out = jax.lax.fori_loop(0, outer, body, (x, op.matmul(x)))[1]
        # Scalar output: completion is observed with a tiny host fetch
        # (block_until_ready alone returns early on the tunnel).
        return jnp.mean(out.astype(jnp.float32) ** 2)

    t0 = time.time()
    lowered = jax.jit(chain).lower(op, X)
    t_lower = time.time() - t0
    hlo_bytes = len(lowered.as_text())
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    # Force completion with a host fetch of a scalar: on the tunneled
    # platform block_until_ready alone has returned before the remote
    # execution finished.
    t0 = time.time()
    s = jax.device_get(compiled(op, X))
    t_first = time.time() - t0
    t0 = time.time()
    s = jax.device_get(compiled(op, X))
    t_steady = time.time() - t0
    per_spmm = t_steady / (outer * (K - 1)) * 1e6
    print(f"    lower={t_lower:.2f}s hlo={hlo_bytes/1e3:.0f}KB "
          f"compile={t_compile:.1f}s first={t_first:.2f}s "
          f"steady={t_steady:.3f}s ({per_spmm:.0f}us/spmm, "
          f"{op.nnz/(t_steady/(outer*(K-1)))/1e9:.2f} Gedge/s) "
          f"probe={float(s):.3f}",
          flush=True)


if __name__ == "__main__":
    main()
