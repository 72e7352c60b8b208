"""MXU probe round 2: find a shape that exceeds ~70 TFLOP/s bf16.

Probe 1 (_mxu_probe.py) showed every [*,128]@[128,*] geometry caps at
~35% of the 197 TFLOP/s nominal peak — independent of M (128 vs 1152),
N (512 vs 2048 is worse), and dynamic indexing.  Fitting probe-1 numbers
gives ~0.85us loop-iteration overhead + ~0.143us per [128,128]@[128,512]
dot (60% of peak).  This round scans the contraction depth K and the
canonical square shapes; the carry dependency is a [1, n] broadcast so
all K variants share one code path.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from experiments import _common  # noqa: E402,F401


def probe(name, m, k, n, iters, taps=1, indep=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref, *, taps, m, k, n, iters, indep):
        def body(i, carry):
            if indep:
                accs = [
                    jnp.dot(a_ref[d], b_ref[d] + (carry if d == 0 else 0.0),
                            preferred_element_type=jnp.float32)
                    for d in range(taps)
                ]
                acc = functools.reduce(lambda p, q: p + q, accs)
            else:
                acc = jnp.zeros((m, n), jnp.float32)
                for d in range(taps):
                    acc += jnp.dot(a_ref[d], b_ref[d] + carry,
                                   preferred_element_type=jnp.float32)
            return (acc[:1, :n] * 1e-6).astype(b_ref.dtype)

        out = jax.lax.fori_loop(
            0, iters, body, jnp.zeros((1, n), b_ref.dtype)
        )
        o_ref[:] = out

    a = jnp.ones((taps, m, k), jnp.bfloat16) * 0.01
    b = jnp.ones((taps, k, n), jnp.bfloat16) * 0.01

    @jax.jit
    def run(a, b):
        o = pl.pallas_call(
            functools.partial(kernel, taps=taps, m=m, k=k, n=n,
                              iters=iters, indep=indep),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.bfloat16),
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
    print(f"{name:12s} {dt*1e3:8.2f} ms  {us_it:6.2f} us/iter "
          f"{tflops:6.1f} TFLOP/s ({tflops/197*100:4.1f}% of bf16 peak)",
          flush=True)


def main():
    it = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    probe("k128", m=128, k=128, n=512, iters=it * 4)
    probe("k256", m=128, k=256, n=512, iters=it * 4)
    probe("k512", m=128, k=512, n=512, iters=it * 2)
    probe("k1024", m=128, k=1024, n=512, iters=it)
    probe("sq512", m=512, k=512, n=512, iters=it)
    probe("sq1024", m=1024, k=1024, n=1024, iters=max(it // 4, 100))
    probe("m512k512n128", m=512, k=512, n=128, iters=it * 2)
    probe("tap3_k512", m=128, k=512, n=512, iters=it * 2, taps=3)
    probe("tap9_indep", m=128, k=128, n=512, iters=it * 2, taps=9,
          indep=True)
    probe("tap32", m=128, k=128, n=512, iters=it // 2, taps=32)


if __name__ == "__main__":
    main()
