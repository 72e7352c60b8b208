"""Profiling helpers: step timers and JAX trace capture.

The reference only wall-clocks around fit/evaluate
(lib/graph_model.py:110-125, utils.py:313-316); here we add a proper step
timer plus ``jax.profiler`` trace capture for per-kernel inspection.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["StepTimer", "trace", "spmm_roofline", "slope_time"]


def slope_time(make_fn, args=(), units=(2, 16), reps: int = 3):
    """Fixed-overhead-free device timing by slope fit.

    On the tunneled TPU platform a dispatched program pays a large fixed
    host round-trip (MEASURED 25.6 ms/call via this method — DESIGN.md
    §16), so wall-clocking one call of an N-unit chain overstates the
    per-unit time by overhead/N.  ``slope_time`` times the SAME program
    at two chain lengths and differences them, cancelling every
    per-call constant exactly:

        per_unit = (wall(u1) - wall(u0)) / (u1 - u0)

    ``make_fn(u)`` must return a jitted callable whose device work
    scales linearly in ``u`` and which returns a SCALAR (fetched via
    ``jax.device_get`` — ``block_until_ready`` alone can return before
    the remote execution finishes on this platform).  Each length is
    compiled+warmed once and timed ``reps`` times (min taken).  Returns
    ``(per_unit_seconds, fixed_overhead_seconds)``.
    """
    import numpy as np

    walls = []
    for u in units:
        fn = make_fn(u)
        s = jax.device_get(fn(*args))  # compile + warm (device load)
        assert np.all(np.isfinite(s)), s
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(fn(*args))
            best = min(best, time.perf_counter() - t0)
        walls.append(best)
    per_unit = (walls[-1] - walls[0]) / (units[-1] - units[0])
    fixed = walls[0] - units[0] * per_unit
    return per_unit, fixed


class StepTimer:
    """Wall-clock timer that syncs the device before each reading so queued
    async work is attributed to the step that launched it."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean_ms(self) -> float:
        return 1000.0 * sum(self.times) / max(len(self.times), 1)

    @property
    def min_ms(self) -> float:
        return 1000.0 * min(self.times) if self.times else 0.0


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# TPU v5e single-chip peaks.  MEASURED on this device with XLA's own
# tuned matmul chain (experiments/_probe.py peak, SLOPE-FIT over two
# chain lengths, chained 4096^2 dots): bf16 193 TFLOP/s (98% of the
# datasheet 197T), int8 370 TOP/s (94% of 394T).  The 'float32' entry
# is the DEFAULT-PRECISION rate for f32-typed matmuls: XLA's TPU
# default lowers them to single-pass bf16 compute with f32
# accumulation (measured 140-153 TFLOP/s across sessions) — which is
# exactly what every f32-operand matmul in this library runs, so it is
# the honest roofline for those kernels.  Faithful fp32 precision
# (precision=HIGHEST, multi-pass bf16 emulation) runs far slower —
# measured 30.1 TFLOP/s (`_probe.py peak` f32_hi row, 2026-08-21); no
# shipped kernel requests it.
# The round-1 'measured peaks' (bf16 114T / int8 153T) were single-call
# wall-clock numbers that silently folded the tunnel's fixed ~25.6 ms
# per-dispatch host round-trip into the rate — slope-fit timing
# (``slope_time``) cancels it and recovers the datasheet-class rates
# (DESIGN.md §16).
V5E_HBM_BYTES_PER_S = 819e9
V5E_FLOPS = {
    "bfloat16": 193e12,
    "float32": 140e12,  # default-precision (bf16-compute) f32 matmul
    "int8": 370e12,
}
V5E_FLOPS_DATASHEET = {"bfloat16": 197e12, "float32": 49e12,
                       "int8": 394e12}


def spmm_roofline(op, seconds_per_spmm: float, feature_width: int,
                  hbm_bw: float = V5E_HBM_BYTES_PER_S,
                  flops_per_s: dict = V5E_FLOPS) -> dict:
    """Roofline report for one Laplacian SpMM through ``op``.

    Computes the kernel's minimum HBM traffic (operator storage + one
    activation read + one write at ``feature_width`` columns) and its
    MXU work (including zero-block padding for tiled formats), and
    reports the achieved fraction of whichever bound is tighter —
    the per-kernel "speed-of-light" check SURVEY.md §5 calls for.
    """
    import numpy as np

    e = np.dtype(op.compute_dtype).itemsize
    C = feature_width
    mp = op.m_padded

    if hasattr(op, "band") and getattr(op, "levels", ()):  # ragged banded
        total, br, bc = op.band.shape
        op_bytes = op.band.size * e
        flops = 2 * total * br * bc * C
    elif hasattr(op, "band") and op.band.ndim == 4:  # banded, single chip
        nbr, W, br, bc = op.band.shape
        op_bytes = op.band.size * e
        flops = 2 * nbr * W * br * bc * C
    elif hasattr(op, "blocks") and op.blocks.ndim == 3:  # block-sparse
        nb = int(op.block_cols.shape[0])  # excl. chunked-DMA zero pad
        _, br, bc = op.blocks.shape
        op_bytes = nb * br * bc * e
        # BSR re-reads one x tile per block.
        flops = 2 * nb * br * bc * C
    elif hasattr(op, "mat"):  # dense
        op_bytes = op.mat.size * e
        flops = 2 * mp * mp * C
    else:
        raise ValueError(
            f"no roofline model for {type(op).__name__} "
            "(sharded operators: model each shard)"
        )

    act_bytes = 2 * mp * C * e  # x read + y write
    bytes_total = op_bytes + act_bytes
    key = str(np.dtype(op.compute_dtype))
    t_hbm = bytes_total / hbm_bw
    t_mxu = flops / flops_per_s.get(key, flops_per_s["float32"])
    t_mxu_ds = flops / V5E_FLOPS_DATASHEET.get(
        key, V5E_FLOPS_DATASHEET["float32"]
    )
    bound = "hbm" if t_hbm >= t_mxu else "mxu"
    t_sol = max(t_hbm, t_mxu)
    return {
        "bytes": int(bytes_total),
        "flops": int(flops),
        "t_hbm_us": round(t_hbm * 1e6, 1),
        "t_mxu_us": round(t_mxu * 1e6, 1),
        "bound": bound,
        "sol_us": round(t_sol * 1e6, 1),
        "achieved_frac_of_sol": round(t_sol / seconds_per_spmm, 3),
        "achieved_frac_of_datasheet_sol": round(
            max(t_hbm, t_mxu_ds) / seconds_per_spmm, 3
        ),
        "useful_edge_flops_frac": round(
            2 * op.nnz * C / flops, 3
        ),
    }
