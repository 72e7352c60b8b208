"""Training runtime: trainer, config, checkpointing, experiment harness."""

from cnn_graph_tpu.train.trainer import TrainConfig, Trainer

__all__ = ["TrainConfig", "Trainer"]
