"""Utilities: metrics, experiment harness, profiling."""

from cnn_graph_tpu.utils.harness import ModelPerf, baseline, grid_search
from cnn_graph_tpu.utils.metrics import accuracy, mape, rmse, weighted_f1

__all__ = [
    "ModelPerf",
    "baseline",
    "grid_search",
    "accuracy",
    "mape",
    "rmse",
    "weighted_f1",
]
