"""MXU probe round 6: does per-tap predication skip MXU work?

The banded kernel's rows have average span 7.02 of W=9 stored diagonals
(50k city graph) — 22% of the taps multiply structural zeros.  Skipping
them needs a branch around each tap.  This probe measures the tap9 loop
with each tap wrapped in ``lax.cond(d < w_r, ...)`` where the per-row
width w_r cycles through a prefetched pattern:

  cond_w9   widths all 9  (pure predication overhead vs tap9 baseline)
  cond_w7   widths cycle 5..9, mean 7  (expected ~22% faster if real)
  base9     unpredicated tap9 (calibration)
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from experiments import _common  # noqa: E402,F401


def probe(name, widths, iters, m=128, k0=128, n=512, taps=9, cond=True):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.bfloat16
    w_arr = jnp.asarray(np.asarray(widths, np.int32))
    nw = len(widths)

    def kernel(w_ref, a_ref, b_ref, o_ref, *, iters):
        def body(i, carry):
            acc = jnp.dot(a_ref[0], carry, preferred_element_type=jnp.float32)
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
            functools.partial(kernel, iters=iters),
            out_shape=jax.ShapeDtypeStruct((k0, n), dt),
            grid_spec=grid_spec,
        )(w, a, b)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    s = jax.device_get(run(w_arr, a, b))
    t0 = time.perf_counter()
    s = jax.device_get(run(w_arr, a, b))
    dt_s = time.perf_counter() - t0
    import numpy as np
    mean_w = float(np.mean(widths))
    flops = 2 * m * k0 * n * (mean_w + 1) * iters  # +1 injection tap
    tflops = flops / dt_s / 1e12
    print(f"{name:10s} {dt_s/iters*1e6:6.2f} us/iter  mean_w={mean_w:.1f}  "
          f"{tflops:5.1f} TFLOP/s useful", flush=True)


def main():
    it = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    probe("base9", [9], it, cond=False)
    probe("cond_w9", [9], it)
    probe("cond_w7", [5, 6, 7, 8, 9, 9, 7, 5, 6, 8], it)
    probe("cond_w5", [5], it)


if __name__ == "__main__":
    main()
