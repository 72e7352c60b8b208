"""MXU probe round 7: int8 taps with the quantized kernel's epilogue.

The quantized banded kernel accumulates int32 tap results into an f32
accumulator scaled per tap by the column block's activation scale:

    acc_f32 += (B_i8 @ x_i8)_i32 * s_x[col]

plus an emission epilogue per row block: hop update, max-reduce,
rescale, round back to int8.  This probes whether that VPU work rides
along free with the int8 MXU taps (expected: yes — ~131K VPU ops per
0.174us MXU tap) or costs real time, before committing to the design.

  i8_plain     9 int8 taps, pure i32 accumulate (probe-4 replica, 96 TOP)
  i8_scaled    9 int8 taps, per-tap f32 scale-FMA accumulate
  i8_epilogue  i8_scaled + per-iter max/rescale/round-to-int8 emission
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from experiments import _common  # noqa: E402,F401


def probe(name, iters, mode, m=128, k0=128, n=512, taps=9):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, s_ref, o_ref, *, iters):
        def body(i, carry):
            inj = jnp.dot(a_ref[0][:, :m], carry,
                          preferred_element_type=jnp.int32)
            if mode == "plain":
                acc = inj
                for d in range(taps):
                    acc += jnp.dot(a_ref[d], b_ref[d],
                                   preferred_element_type=jnp.int32)
                return (acc >> 12).astype(jnp.int8)
            acc = inj.astype(jnp.float32) * s_ref[0, 0]
            for d in range(taps):
                acc += jnp.dot(a_ref[d], b_ref[d],
                               preferred_element_type=jnp.int32
                               ).astype(jnp.float32) * s_ref[d, 0]
            if mode == "scaled":
                return (acc * 1e-6).astype(jnp.int8)
            # epilogue: hop-style update + per-block requantization
            y = 2.0 * acc * s_ref[0, 1] - carry.astype(jnp.float32)
            mx = jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return jnp.round(y * (127.0 / mx)).astype(jnp.int8)

        out = jax.lax.fori_loop(
            0, iters, body, jnp.zeros((m, n), jnp.int8)
        )
        o_ref[:] = out

    a = jnp.ones((taps, m, k0), jnp.int8)
    b = jnp.ones((taps, k0, n), jnp.int8)
    s = jnp.full((taps, 128), 1e-3, jnp.float32)

    @jax.jit
    def run(a, b, s):
        o = pl.pallas_call(
            functools.partial(kernel, iters=iters),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b, s)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    sres = jax.device_get(run(a, b, s))
    t0 = time.perf_counter()
    sres = jax.device_get(run(a, b, s))
    dt_s = time.perf_counter() - t0
    ops = 2 * m * k0 * n * (taps + 1) * iters
    tops = ops / dt_s / 1e12
    print(f"{name:12s} {dt_s/iters*1e6:6.2f} us/iter {tops:6.1f} TOP/s "
          f"({tops/153*100:4.1f}% of device peak)", flush=True)


def main():
    it = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    probe("i8_plain", it, "plain")
    probe("i8_scaled", it, "scaled")
    probe("i8_epilogue", it, "epilogue")


if __name__ == "__main__":
    main()
