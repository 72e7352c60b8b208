"""Device peak probe: XLA's own matmul rate (bf16, f32, int8).

Pallas microbenchmarks (probes 1-3) never exceeded ~71 TFLOP/s bf16 —
36% of the v5e datasheet's 197.  This probe measures the ceiling with
XLA's maximally-tuned path: a chained fori_loop of big square matmuls.
Whatever this reports is the honest ``flops_per_s`` for the roofline
model (utils/profiling.py), and the reference point for "% of peak"
claims in DESIGN.md.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from experiments import _common  # noqa: E402,F401


def probe(name, size, dtype, iters, acc_dtype=None):
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
        a = (jnp.ones((size, size), dt) * 0.03)
        w = (jnp.eye(size, dtype=dt) * 1.0003)

        @jax.jit
        def run(a, w):
            def body(i, z):
                zz = jax.lax.dot(z, w, preferred_element_type=acc)
                return zz.astype(dt)

            out = jax.lax.fori_loop(0, iters, body, a)
            return jnp.mean(out.astype(jnp.float32) ** 2)

    s = jax.device_get(run(a, w))
    t0 = time.perf_counter()
    s = jax.device_get(run(a, w))
    dt_s = time.perf_counter() - t0
    flops = 2 * size**3 * iters
    print(f"{name:14s} {dt_s*1e3:8.1f} ms  {flops/dt_s/1e12:6.1f} "
          f"T{'OP' if dtype=='int8' else 'FLOP'}/s  probe={float(s):.3e}",
          flush=True)


def main():
    import jax.numpy as jnp

    it = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    probe("bf16_2048", 2048, "bfloat16", it * 8)
    probe("bf16_4096", 4096, "bfloat16", it)
    probe("bf16_8192", 8192, "bfloat16", max(it // 8, 4))
    probe("f32_4096", 4096, "float32", max(it // 4, 4))
    probe("bf16_4096_f32acc", 4096, "bfloat16", it, acc_dtype=jnp.float32)
    probe("int8_4096", 4096, "int8", it)


if __name__ == "__main__":
    main()
