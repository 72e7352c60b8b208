"""MXU probe round 5: M-scaling at deep K, transposed layout, int8.

Probe 4: tap9 73.8 / deepk(K=1152) 77.7 / deepk_m256 81.1 TFLOP/s — the
Pallas in-kernel ceiling is ~74-81 TF vs XLA's measured 114.  The last
big FLOP lever for the banded kernel is NARROW ROW-BLOCKS: with (32,128)
blocks the 50k city band (462-node bandwidth) needs K~640 instead of
K~1152 per row — a ~2x FLOP cut — if the MXU rate survives small M.

Dependency scheme (works for every dtype incl. int8, where Mosaic lacks
elementwise i8 adds): one extra injection dot
``acc += a[:, :mc] @ carry`` with mc = min(m, 128); its FLOPs are
counted in the reported rate.
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
    mc = min(m, 128)
    ks = k // taps

    def kernel(a_ref, b_ref, o_ref, *, iters):
        def body(i, carry):
            acc = jnp.dot(a_ref[0][:, :mc], carry,
                          preferred_element_type=acc_dt)
            for d in range(taps):
                acc += jnp.dot(a_ref[d], b_ref[d],
                               preferred_element_type=acc_dt)
            if int8:
                return (acc[:mc, :] >> 12).astype(dt)
            return (acc[:mc, :] * 1e-6).astype(dt)

        out = jax.lax.fori_loop(0, iters, body, jnp.zeros((mc, n), dt))
        o_ref[:] = out

    a = jnp.ones((taps, m, ks), dt)
    b = jnp.ones((taps, ks, n), dt)

    @jax.jit
    def run(a, b):
        o = pl.pallas_call(
            functools.partial(kernel, iters=iters),
            out_shape=jax.ShapeDtypeStruct((mc, n), dt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    s = jax.device_get(run(a, b))
    t0 = time.perf_counter()
    s = jax.device_get(run(a, b))
    dt_s = time.perf_counter() - t0
    flops = 2 * m * (k + mc) * n * iters
    tflops = flops / dt_s / 1e12
    unit = "TOP/s " if int8 else "TFLOP/s"
    peak = 153 if int8 else 114
    # us per iteration excluding nothing — and the effective us per
    # k-column-block of 128 at this m (what the banded kernel pays).
    print(f"{name:18s} {dt_s/iters*1e6:7.2f} us/iter {tflops:6.1f} {unit}"
          f" ({tflops/peak*100:4.1f}% of device peak)", flush=True)


def main():
    it = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    probe("tap9_m128", m=128, k=1152, n=512, iters=it, taps=9)
    probe("deepk_m128", m=128, k=1152, n=512, iters=it)
    probe("deepk_m64_k768", m=64, k=768, n=512, iters=it * 2)
    probe("deepk_m32_k640", m=32, k=640, n=512, iters=it * 2)
    probe("deepk_m16_k640", m=16, k=640, n=512, iters=it * 2)
    probe("deepk_m8_k640", m=8, k=640, n=512, iters=it * 2)
    probe("xt_m512_n128", m=512, k=1152, n=128, iters=it)
    probe("i8_tap9_m128", m=128, k=1152, n=512, iters=it, taps=9,
          dtype="int8")
    probe("i8_deepk_m128", m=128, k=1152, n=512, iters=it, dtype="int8")
    probe("i8_deepk_m64", m=64, k=768, n=512, iters=it * 2, dtype="int8")


if __name__ == "__main__":
    main()
