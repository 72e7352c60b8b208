"""MXU probe round 3: clean streaming rate per dot shape.

Probe 2 was contaminated: its [1, n] carry broadcast-add is a slow VPU
sublane broadcast that dominated every variant.  Here the per-iteration
dependency is an 8-row f32 slice folded into the carry (negligible VPU
work), and the dot inputs are made loop-variant by dynamic slot
indexing (measured free in probe 1) so Mosaic cannot hoist them.  The
dots are independent across iterations — this measures the hardware's
streaming ceiling per shape.

``chain=True`` additionally accumulates the taps serially into one
accumulator (the banded kernel's per-row pattern).
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from experiments import _common  # noqa: E402,F401


def probe(name, m, k, n, iters, taps=1, slots=4, chain=True):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref, *, taps, m, k, n, iters, chain):
        def body(i, carry):
            if chain:
                acc = jnp.zeros((m, n), jnp.float32)
                for d in range(taps):
                    acc += jnp.dot(a_ref[d],
                                   b_ref[jax.lax.rem(i + d, slots)],
                                   preferred_element_type=jnp.float32)
            else:
                accs = [
                    jnp.dot(a_ref[d], b_ref[jax.lax.rem(i + d, slots)],
                            preferred_element_type=jnp.float32)
                    for d in range(taps)
                ]
                acc = functools.reduce(lambda p, q: p + q, accs)
            return carry * 0.5 + acc[:8, :] * 1e-6

        out = jax.lax.fori_loop(
            0, iters, body, jnp.zeros((8, n), jnp.float32)
        )
        o_ref[:] = out.astype(o_ref.dtype)

    a = jnp.ones((taps, m, k), jnp.bfloat16) * 0.01
    b = jnp.ones((slots, k, n), jnp.bfloat16) * 0.01

    @jax.jit
    def run(a, b):
        o = pl.pallas_call(
            functools.partial(kernel, taps=taps, m=m, k=k, n=n,
                              iters=iters, chain=chain),
            out_shape=jax.ShapeDtypeStruct((8, n), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
        return jnp.mean(o.astype(jnp.float32) ** 2)

    s = jax.device_get(run(a, b))
    t0 = time.perf_counter()
    s = jax.device_get(run(a, b))
    dt = time.perf_counter() - t0
    flops = 2 * taps * m * k * n * iters
    tflops = flops / dt / 1e12
    us_it = dt / iters * 1e6
    print(f"{name:14s} {dt*1e3:8.2f} ms  {us_it:6.2f} us/iter "
          f"{tflops:6.1f} TFLOP/s ({tflops/197*100:4.1f}% of bf16 peak)",
          flush=True)


def main():
    it = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    probe("tap9_k128", m=128, k=128, n=512, iters=it, taps=9)
    probe("tap9_k128_sep", m=128, k=128, n=512, iters=it, taps=9,
          chain=False)
    probe("one_k128", m=128, k=128, n=512, iters=it * 4)
    probe("one_k256", m=128, k=256, n=512, iters=it * 2)
    probe("one_k512", m=128, k=512, n=512, iters=it)
    probe("tap3_k512", m=128, k=512, n=512, iters=it, taps=3)
    probe("col_m1152", m=1152, k=128, n=512, iters=it)
    probe("sq512", m=512, k=512, n=512, iters=it // 2, slots=2)
    probe("sq1024", m=1024, k=1024, n=1024, iters=it // 8, slots=2)
    probe("m1152_k512", m=1152, k=512, n=512, iters=it // 4, slots=2)


if __name__ == "__main__":
    main()
