"""Seasonal-trend decomposition for flow normalization.

The reference normalizes flow series with ``stldecompose.decompose``
(nips2016/humantraffic.py:15, 415-474).  That package (and statsmodels)
isn't available here, so this implements the same classical decomposition
additively: trend = centered moving average over one period, seasonal =
period-position means of the detrended series (de-meaned), resid =
x - trend - seasonal.

Deviation band vs LOESS STL: on a trend+seasonal+noise(sigma) series the
residual this estimator returns differs from the true noise by
~ sigma*sqrt(1/period + 1/n_periods) RMS in the interior (edges use
nearest-trend extension); tests/test_data.py asserts a 3x bound on a
20-period daily series.  LOESS's advantage is a slowly-varying seasonal
component; the humanflow normalizers only consume the residual, where the
two agree within that band.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["decompose", "Decomposition"]


@dataclasses.dataclass
class Decomposition:
    observed: np.ndarray
    trend: np.ndarray
    seasonal: np.ndarray
    resid: np.ndarray


def decompose(x: np.ndarray, period: int) -> Decomposition:
    """Additive seasonal decomposition of a 1-D series."""
    x = np.asarray(x, np.float64)
    n = len(x)
    assert n >= 2 * period, "need at least two periods"

    # Centered moving average; even periods use the standard 2x(period) MA.
    if period % 2 == 0:
        kernel = np.ones(period + 1) / period
        kernel[0] = kernel[-1] = 0.5 / period
    else:
        kernel = np.ones(period) / period
    trend = np.convolve(x, kernel, mode="same")
    # Edges: extend with the nearest valid trend value.
    half = len(kernel) // 2
    trend[:half] = trend[half]
    trend[-half:] = trend[-half - 1]

    detrended = x - trend
    seasonal_means = np.array(
        [detrended[i::period].mean() for i in range(period)]
    )
    seasonal_means -= seasonal_means.mean()
    seasonal = np.tile(seasonal_means, n // period + 1)[:n]

    resid = x - trend - seasonal
    return Decomposition(observed=x, trend=trend, seasonal=seasonal, resid=resid)
