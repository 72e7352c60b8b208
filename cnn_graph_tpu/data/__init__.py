"""Data pipelines: synthetic generators, flow datasets, text corpora."""

from cnn_graph_tpu.data.synthetic import community_classification, synthetic_flow

__all__ = ["community_classification", "synthetic_flow"]
