"""GConvRNN: sequence-labeling graph-conv LSTM (per-timestep outputs).

The reference ships a second, self-contained gconvLSTM stack in
lib/gconvRNN.py (GCRN-style): same Chebyshev-gated cells, but with
per-timestep output projections (gconvRNN.py:306-317), a cross-entropy
loss over every step's logits (:326-345), and the repo's only working
summaries / gradient clipping / numerics checking (:342, :381-417).

Here the cell is shared with models/gconv_lstm.py (one implementation,
not two copies); this module adds the sequence head.  Clipping and
rmsprop/sgd/adam live in train.TrainConfig; numerics guarding is
TrainConfig.check_numerics; summaries are utils.logging.MetricsLogger.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cnn_graph_tpu.models import common
from cnn_graph_tpu.models.gconv_lstm import GConvLSTMCell, glstm_stack_init
from cnn_graph_tpu.ops import cheby_conv

__all__ = ["GConvRNN"]


class GConvRNN:
    """Graph-conv LSTM over T steps with a per-step classification head.

    ``x``: [B, M, Fin, T] -> per-step logits [B, T, M, C] (``apply``).
    Labels for ``loss``: int class ids [B, T, M] (node classification per
    step) — the sequence analogue of gconvRNN's flattened per-step
    cross-entropy (gconvRNN.py:326-345).
    """

    def __init__(
        self,
        operator,
        num_units: int,
        feat_in: int,
        num_classes: int,
        K: int = 2,
        num_layers: int = 1,
        output_keep_prob: float = 1.0,
    ):
        self.op = operator
        self.H = num_units
        self.feat_in = feat_in
        self.C = num_classes
        self.K = K
        self.num_layers = num_layers
        self.keep = output_keep_prob

    def _cells(self):
        cells = [GConvLSTMCell(self.op, self.H, self.feat_in, K=self.K)]
        cells += [
            GConvLSTMCell(self.op, self.H, self.H, K=self.K)
            for _ in range(self.num_layers - 1)
        ]
        return cells

    def init(self, key: jax.Array):
        key, lk, hk = jax.random.split(key, 3)
        return {
            "lstm": glstm_stack_init(lk, self._cells()),
            "head": common.trunc_normal(hk, (self.K, self.H, self.C)),
            "head_b": jnp.zeros((self.C,), jnp.float32),
        }

    def apply(self, params, x: jax.Array, *, train: bool = False, rng=None):
        B, M, Fin, T = x.shape
        x_seq = jnp.moveaxis(x, 3, 0)  # [T, B, M, Fin]
        cells = self._cells()

        seq = x_seq
        for cell, cell_params in zip(cells, params["lstm"]):
            def scan_fn(carry, xt, cell=cell, cp=cell_params):
                return cell.step(cp, carry, xt)

            _, seq = jax.lax.scan(scan_fn, cell.zero_state(B), seq)
            if train and self.keep < 1.0:
                rng, dk = jax.random.split(rng)
                seq = common.dropout(dk, seq, self.keep, train)

        # Per-step output projection: one gconv applied to every step
        # (vmapped over T — the reference loops per-timestep Python-side,
        # gconvRNN.py:306-317).
        def head(ht):
            return cheby_conv(ht, self.op, params["head"]) + params["head_b"]

        logits = jax.vmap(head)(seq)  # [T, B, M, C]
        return jnp.moveaxis(logits, 0, 1)  # [B, T, M, C]

    def loss(self, params, x, labels, *, train: bool = False, rng=None):
        """Mean softmax cross-entropy over all (batch, step, node) slots."""
        logits = self.apply(params, x, train=train, rng=rng)
        logp = jax.nn.log_softmax(logits)
        picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)
        return -jnp.mean(picked)

    def predict_classes(self, params, x):
        return jnp.argmax(self.apply(params, x), axis=-1)
