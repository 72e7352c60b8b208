"""Model zoo: ChebNet classifier, ResGNN regressor, gLSTM forecasters."""

from cnn_graph_tpu.models.chebnet import ChebNet, bspline_basis
from cnn_graph_tpu.models.forecasting import FORECAST_VARIANTS, GConvForecaster
from cnn_graph_tpu.models.gconv_lstm import (
    GConvLSTMCell,
    glstm_stack_apply,
    glstm_stack_init,
)
from cnn_graph_tpu.models.gconv_rnn import GConvRNN
from cnn_graph_tpu.models.node_classifier import NodeClassifier
from cnn_graph_tpu.models.node_lstm import PerNodeLSTM, stack_lstm_collection
from cnn_graph_tpu.models.resgnn import ResGNN

__all__ = [
    "ChebNet",
    "bspline_basis",
    "FORECAST_VARIANTS",
    "GConvForecaster",
    "GConvLSTMCell",
    "GConvRNN",
    "NodeClassifier",
    "PerNodeLSTM",
    "glstm_stack_apply",
    "glstm_stack_init",
    "ResGNN",
    "stack_lstm_collection",
]
