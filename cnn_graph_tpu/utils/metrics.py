"""Evaluation metrics for classification and flow forecasting."""

from __future__ import annotations

import numpy as np

__all__ = ["rmse", "mape", "accuracy", "weighted_f1", "count_params"]


def rmse(targets: np.ndarray, predictions: np.ndarray) -> float:
    """Root mean squared error over every output element — the humanflow
    headline metric, computed after reverse-normalization
    (nips2016/humanflow.py:183-184)."""
    return float(np.sqrt(np.sum((targets - predictions) ** 2) / targets.size))


def mape(
    targets: np.ndarray, predictions: np.ndarray, threshold: float = 20.0
) -> float:
    """Mean absolute percentage error over targets above ``threshold``
    (small flows are excluded, nips2016/gconvTest.py:178-183)."""
    mask = targets > threshold
    if not np.any(mask):
        return float("nan")
    return float(
        np.mean(np.abs(targets[mask] - predictions[mask]) / targets[mask])
    )


def accuracy(labels: np.ndarray, predictions: np.ndarray) -> float:
    return 100.0 * float(np.mean(labels == predictions))


def weighted_f1(labels: np.ndarray, predictions: np.ndarray) -> float:
    """Support-weighted mean of per-class F1 scores (sklearn 'weighted')."""
    classes, counts = np.unique(labels, return_counts=True)
    f1s = []
    for c in classes:
        tp = np.sum((predictions == c) & (labels == c))
        fp = np.sum((predictions == c) & (labels != c))
        fn = np.sum((predictions != c) & (labels == c))
        denom = 2 * tp + fp + fn
        f1s.append(2 * tp / denom if denom else 0.0)
    return 100.0 * float(np.sum(np.asarray(f1s) * counts) / counts.sum())


def count_params(params) -> int:
    """Total parameter count of a pytree (the working replacement for the
    fork's missing ``utils.show_all_variables``, gconvRNN.py import)."""
    import jax

    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
