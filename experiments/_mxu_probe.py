"""MXU shape probe: what matmul geometry reaches peak on v5e?

The banded kernel (ops/pallas_band.py) computes one ``[br,bc]@[bc,tc]``
MXU tap per band block.  At br=bc=128, tc=512 it measures ~224ns/tap —
38% of the nominal bf16 peak.  Hypothesis: the MXU's stationary operand
reload dominates when the streamed dimension is only 128 rows; a
column-major formulation that streams W*128 rows through one stationary
``[128, tc]`` operand should approach peak.

Each variant runs a self-contained Pallas kernel with all operands
VMEM-resident and ``iters`` dependent iterations inside the kernel, so
DMA and dispatch are out of the timed path; a scalar fetch observes
completion (block_until_ready returns early on the tunnel).

Variants (equal per-iteration FLOPs unless noted):
  tap9     9 x dot([128,128],[128,512])  — current kernel's shape
  col      1 x dot([1152,128],[128,512]) — column-major band slab
  col_n128 1 x dot([1152,128],[128,128]) — narrow-tc control (1/4 FLOPs)
  tap_n2048 1 x dot([128,128],[128,2048])— wide-tc control (4/9 FLOPs)
  tap9dyn  tap9 with dynamically indexed RHS ring reads (kernel realism)
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from experiments import _common  # noqa: E402,F401  (cache + CPU hatch)


def probe(name, taps, m, k, n, iters, dyn=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref, *, taps, m, k, n, iters, dyn):
        def body(i, carry):
            acc = jnp.zeros((m, n), jnp.float32)
            for d in range(taps):
                if dyn:
                    # Ring-style dynamic RHS read, as the banded kernel's
                    # xring[rem(base+d, R)] does.
                    bb = b_ref[jax.lax.rem(i + d, taps)] + carry
                else:
                    bb = b_ref[d] + carry
                acc += jnp.dot(a_ref[d], bb,
                               preferred_element_type=jnp.float32)
            return (acc[:k, :] * 1e-6).astype(b_ref.dtype)

        out = jax.lax.fori_loop(
            0, iters, body, jnp.zeros((k, n), b_ref.dtype)
        )
        o_ref[:] = out

    a = jnp.ones((taps, m, k), jnp.bfloat16) * 0.01
    b = jnp.ones((taps, k, n), jnp.bfloat16) * 0.01

    @jax.jit
    def run(a, b):
        o = pl.pallas_call(
            functools.partial(kernel, taps=taps, m=m, k=k, n=n,
                              iters=iters, dyn=dyn),
            out_shape=jax.ShapeDtypeStruct((k, n), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
        return jnp.mean(o.astype(jnp.float32) ** 2)

    s = jax.device_get(run(a, b))  # compile + warm
    t0 = time.perf_counter()
    s = jax.device_get(run(a, b))
    dt = time.perf_counter() - t0
    flops = 2 * taps * m * k * n * iters
    tflops = flops / dt / 1e12
    print(f"{name:10s} {dt*1e3:8.2f} ms  {tflops:6.1f} TFLOP/s "
          f"({tflops/197*100:4.1f}% of bf16 peak)  probe={float(s):.2e}",
          flush=True)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    probe("tap9", taps=9, m=128, k=128, n=512, iters=iters)
    probe("col", taps=1, m=1152, k=128, n=512, iters=iters)
    probe("col_n128", taps=1, m=1152, k=128, n=128, iters=iters)
    probe("tap_n2048", taps=1, m=128, k=128, n=2048, iters=iters)
    probe("tap9dyn", taps=9, m=128, k=128, n=512, iters=iters, dyn=True)


if __name__ == "__main__":
    main()
