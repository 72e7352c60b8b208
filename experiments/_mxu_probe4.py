"""MXU probe round 4: deep-K row dots and int8, probe-1 methodology.

Probe 1's scheme (carry of shape [k-or-so, n] folded into the RHS once
per iteration, static operand indexing) measured tap9 at 70.8 TFLOP/s
and was the only self-consistent harness (probes 2/3 were contaminated
by sublane broadcasts / dynamic big-slab indexing).  Probe here:

  tap9_bf16   9 x dot([128,128],[128,512]) bf16, f32 acc  (baseline)
  deepk_bf16  1 x dot([128,1152],[1152,512]) bf16         (same FLOPs)
  deepk_m256  1 x dot([256,1152],[1152,512]) bf16         (2x FLOPs)
  tap9_int8   9 x dot([128,128],[128,512]) int8, i32 acc
  deepk_int8  1 x dot([128,1152],[1152,512]) int8, i32 acc

The banded kernel currently runs 9 K=128 taps per block-row with an
f32 [128,512] accumulator updated per tap; one K=1152 dot writes the
accumulator once — if accumulator traffic is the cap, deepk approaches
the XLA peak (114 TF bf16 / 153 TOP int8 measured by _peak_probe.py).
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from experiments import _common  # noqa: E402,F401


def probe(name, m, k, n, iters, taps=1, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    int8 = dtype == "int8"
    dt = jnp.dtype(dtype)
    acc_dt = jnp.int32 if int8 else jnp.float32

    def kernel(a_ref, b_ref, o_ref, *, taps, m, k, n, iters):
        def body(i, carry):
            if taps > 1:
                # probe-1 scheme: fold the carry into each RHS slab
                # (slab rows == carry rows == 128).
                acc = jnp.zeros((m, n), acc_dt)
                for d in range(taps):
                    bb = b_ref[d] + carry
                    acc += jnp.dot(a_ref[d], bb,
                                   preferred_element_type=acc_dt)
            else:
                # deep-K: inject the dependency as one extra small tap
                # (its FLOPs are counted in the total below).
                acc = jnp.dot(a_ref[0], b_ref[0],
                              preferred_element_type=acc_dt)
                acc += jnp.dot(a_ref[0][:, :128], carry,
                               preferred_element_type=acc_dt)
            if int8:
                return (acc[:128, :] >> 12).astype(dt)
            return (acc[:128, :] * 1e-6).astype(dt)

        out = jax.lax.fori_loop(0, iters, body, jnp.zeros((128, n), dt))
        o_ref[:] = out

    # carry is [k/taps, n]: for tap9 it adds to each [128, n] RHS slab;
    # for deepk the RHS is [1152, n] and the carry broadcasts over the
    # leading 128 rows via tile — keep it simple: pad to full k rows.
    a = jnp.ones((taps, m, k // taps), dt)
    b = jnp.ones((taps, k // taps, n), dt)

    @jax.jit
    def run(a, b):
        o = pl.pallas_call(
            functools.partial(kernel, taps=taps, m=m, k=k, n=n,
                              iters=iters),
            out_shape=jax.ShapeDtypeStruct((128, n), dt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    s = jax.device_get(run(a, b))
    t0 = time.perf_counter()
    s = jax.device_get(run(a, b))
    dt_s = time.perf_counter() - t0
    flops = 2 * m * (k + (128 if taps == 1 else 0)) * n * iters
    tflops = flops / dt_s / 1e12
    unit = "TOP/s " if int8 else "TFLOP/s"
    peak = 153 if int8 else 114
    print(f"{name:12s} {dt_s*1e3:8.2f} ms  {dt_s/iters*1e6:6.2f} us/iter "
          f"{tflops:6.1f} {unit} ({tflops/peak*100:4.1f}% of measured "
          f"device peak)", flush=True)


def main():
    it = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    probe("tap9_bf16", m=128, k=1152, n=512, iters=it, taps=9)
    probe("deepk_bf16", m=128, k=1152, n=512, iters=it)
    probe("deepk_m256", m=256, k=1152, n=512, iters=it // 2)
    probe("tap9_int8", m=128, k=1152, n=512, iters=it, taps=9,
          dtype="int8")
    probe("deepk_int8", m=128, k=1152, n=512, iters=it, dtype="int8")




def main_sq():
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
    probe("sq1024", m=1024, k=1024, n=1024, iters=it)
    probe("m1024_n512", m=1024, k=1024, n=512, iters=it * 2)
    probe("i8_sq1024", m=1024, k=1024, n=1024, iters=it, dtype="int8")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sq":
        main_sq()
    else:
        main()
