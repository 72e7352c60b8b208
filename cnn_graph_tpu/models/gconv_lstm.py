"""Graph-convolutional LSTM: an LSTM whose dense matmuls are replaced by
spectral graph convolutions.

Functional redesign of the reference's ``GConvLSTMCell``
(lib/gconv_lstm.py:29-221): four gates (z, i, f, o), each computed as
``filter(x, W*x) + filter(h, W*h) + b`` with a pluggable spectral filter —
Chebyshev (``[K, Fin, H]`` weights) or Fourier (``[M, H, Fin]``
per-node weights), gconv_lstm.py:98-133.  The time dimension runs under
``jax.lax.scan`` instead of ``tf.nn.static_rnn`` unrolling
(gconv_lstm.py:626), and multi-layer stacks apply output dropout
(keep 0.8) per layer like the reference's DropoutWrapper
(gconv_lstm.py:616-623).

Deliberate bug-fixes vs the fork (SURVEY.md §7 hard-part (e)):
* gate ``z`` uses tanh — the fork calls ``tf.tan`` (gconv_lstm.py:188), a
  typo; its own earlier copy uses tanh (models.py:621);
* gate ``o`` uses sigmoid — the fork's tanh output gate
  (gconv_lstm.py:209) breaks the standard LSTM form its other copy keeps
  (models.py:642).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cnn_graph_tpu.models import common
from cnn_graph_tpu.ops import cheby_conv, fourier_conv

__all__ = ["GConvLSTMCell", "glstm_stack_init", "glstm_stack_apply"]

_GATES = ("z", "i", "f", "o")


class GConvLSTMCell:
    """One graph-conv LSTM cell over ``[B, M, F]`` node signals.

    ``filter_type``: ``cheby_conv`` or ``fourier_conv`` (the reference's
    string dispatch into filter.py, gconv_lstm.py:59).  For the Fourier
    filter pass ``fourier_u`` (the ``[M, M]`` eigenbasis).
    """

    def __init__(
        self,
        operator,
        num_units: int,
        feat_in: int,
        K: int = 2,
        filter_type: str = "cheby_conv",
        fourier_u=None,
        forget_bias: float = 1.0,
    ):
        self.op = operator
        self.num_units = num_units
        self.feat_in = feat_in
        self.K = K
        self.filter_type = filter_type
        self.fourier_u = fourier_u
        self.forget_bias = forget_bias
        if filter_type == "fourier_conv":
            assert fourier_u is not None

    def init(self, key: jax.Array):
        h, fin, m = self.num_units, self.feat_in, self.op.m
        params = {}
        keys = jax.random.split(key, 8)
        for i, g in enumerate(_GATES):
            if self.filter_type == "cheby_conv":
                wx = common.uniform_init(keys[i], (self.K, fin, h))
                wh = common.uniform_init(keys[i + 4], (self.K, h, h))
            else:
                wx = common.uniform_init(keys[i], (m, h, fin))
                wh = common.uniform_init(keys[i + 4], (m, h, h))
            params[f"W{g}x"] = wx
            params[f"W{g}h"] = wh
            params[f"b{g}"] = jnp.zeros((h,), jnp.float32)
        return params

    def zero_state(self, batch_size: int, dtype=jnp.float32):
        shape = (batch_size, self.op.m, self.num_units)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)

    def _filter(self, x, w):
        if self.filter_type == "cheby_conv":
            return cheby_conv(x, self.op, w)
        return fourier_conv(x, self.fourier_u, w)

    def step(self, params, carry, x):
        """One timestep: ``carry = (c, h)``, ``x``: [B, M, feat_in].

        The four gates are computed by ONE wide filter pass per operand
        (weights concatenated along the output-feature axis at trace
        time): the graph filter's Chebyshev basis — the expensive part —
        is built once for ``x`` and once for ``h`` instead of four times
        each, and the program is 8 convs -> 2 (the reference runs 8
        separate filters per step, gconv_lstm.py:185-207).  Parameters
        stay per-gate, so checkpoints and init are unchanged.
        """
        c, h = carry
        H = self.num_units
        fout_axis = -1 if self.filter_type == "cheby_conv" else 1
        wx = jnp.concatenate([params[f"W{g}x"] for g in _GATES], fout_axis)
        wh = jnp.concatenate([params[f"W{g}h"] for g in _GATES], fout_axis)
        b = jnp.concatenate([params[f"b{g}"] for g in _GATES], -1)

        pre = self._filter(x, wx) + self._filter(h, wh) + b
        z = jnp.tanh(pre[..., :H])
        i = jax.nn.sigmoid(pre[..., H:2 * H])
        # forget bias folded pre-activation (standard LSTM form)
        f = jax.nn.sigmoid(pre[..., 2 * H:3 * H] + self.forget_bias)
        o = jax.nn.sigmoid(pre[..., 3 * H:])

        new_c = f * c + i * z
        new_h = o * jnp.tanh(new_c)
        return (new_c, new_h), new_h


def glstm_stack_init(key, cells: list[GConvLSTMCell]):
    keys = jax.random.split(key, len(cells))
    return [cell.init(k) for cell, k in zip(cells, keys)]


def glstm_stack_apply(
    params,
    cells: list[GConvLSTMCell],
    x_seq: jax.Array,
    *,
    train: bool = False,
    rng=None,
    output_keep_prob: float = 0.8,
):
    """Run a multi-layer gLSTM over time with ``lax.scan``.

    ``x_seq``: [T, B, M, Fin] time-major  ->  [T, B, M, H] outputs of the
    top layer.  Output dropout (keep 0.8) applies to every layer's outputs
    during training, like the reference's DropoutWrapper around each cell
    (gconv_lstm.py:616-623).
    """
    T, B = x_seq.shape[0], x_seq.shape[1]
    seq = x_seq
    for li, (cell, cell_params) in enumerate(zip(cells, params)):
        init_carry = cell.zero_state(B)

        def scan_fn(carry, x, cell=cell, cell_params=cell_params):
            return cell.step(cell_params, carry, x)

        _, seq = jax.lax.scan(scan_fn, init_carry, seq)
        if train and output_keep_prob < 1.0:
            rng, dk = jax.random.split(rng)
            seq = common.dropout(dk, seq, output_keep_prob, train)
    return seq
