"""Utilities: metrics, experiment harness, profiling."""

from cnn_graph_tpu.utils.harness import ModelPerf, baseline, grid_search
from cnn_graph_tpu.utils.logging import MetricsLogger
from cnn_graph_tpu.utils.metrics import (
    accuracy,
    count_params,
    mape,
    rmse,
    weighted_f1,
)
from cnn_graph_tpu.utils.notify import send_notification
from cnn_graph_tpu.utils.plots import plot_spectrum

__all__ = [
    "ModelPerf",
    "baseline",
    "grid_search",
    "MetricsLogger",
    "accuracy",
    "count_params",
    "mape",
    "rmse",
    "weighted_f1",
    "send_notification",
    "plot_spectrum",
]
