"""ResGNN: deep residual spectral graph ConvNet for node-level regression.

The fork's working flow-prediction model (``GraphConv`` in
lib/graph_conv.py:12-330): an init conv lifts the input channels to
``nfilter`` features, ``nres_layer_count`` residual blocks (two convs each
with an identity skip) refine them, and a final conv projects to the
2-channel in/out-flow output.  With ``stack_splits`` the input channels are
split into parallel towers whose outputs are merged with learned per-node
weights (graph_conv.py:276-300; the fork hardcodes the 12/16 split).

Activations are the fork's plain relu/tanh (graph_conv.py:228-232) — no
biases, matching the working code path.  The MSE loss and the ReLU
prediction head live in the Trainer (task="regression").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cnn_graph_tpu.models import common
from cnn_graph_tpu.ops import cheby_conv, fourier_conv

__all__ = ["ResGNN"]

_ACTS = {"relu": jax.nn.relu, "tanh": jnp.tanh}


class ResGNN:
    def __init__(
        self,
        operator,
        input_features: int,
        K: int = 2,
        nfilter: int = 64,
        nres_layer_count: int = 4,
        out_features: int = 2,
        activation: str = "relu",
        residual: bool = True,
        stack_splits: list[tuple[int, int]] | None = None,
        filter: str = "chebyshev",
        fourier_u=None,
    ):
        """``operator``: device Laplacian; ``stack_splits``: optional list of
        ``(start, end)`` channel ranges, one tower per range (None = single
        tower over all channels, the ``stack_num == 1`` path).  ``filter``:
        ``chebyshev`` or ``fourier`` (the fork's flow experiments run the
        residual net with the Fourier filter too,
        nips2016/humanflow-ln-period-shortlong.py ``params['filter']``);
        the Fourier path needs ``fourier_u`` (the [M, M] eigenbasis)."""
        self.op = operator
        self.input_features = input_features
        self.K = K
        self.nfilter = nfilter
        self.nres = nres_layer_count
        self.out_features = out_features
        self.act = _ACTS[activation]
        self.residual = residual  # model_name == 'ResGNN' flag, graph_conv.py:235
        self.stack_splits = stack_splits
        self.filter = filter
        self.fourier_u = fourier_u
        if filter == "fourier":
            assert fourier_u is not None, "fourier filter needs fourier_u"
        if stack_splits:
            assert all(e > s for s, e in stack_splits)

    def _conv_init(self, key, fin, fout):
        if self.filter == "chebyshev":
            return common.trunc_normal(key, (self.K, fin, fout))
        return common.trunc_normal(key, (self.op.m, fout, fin))

    def _conv(self, w, x):
        if self.filter == "chebyshev":
            return cheby_conv(x, self.op, w)
        return fourier_conv(x, self.fourier_u, w)

    # ---- parameters ----

    def _tower_init(self, key, fin: int):
        keys = jax.random.split(key, 2 + 2 * self.nres)
        tower = {
            "conv_init": self._conv_init(keys[0], fin, self.nfilter),
            "res": [
                {
                    "w1": self._conv_init(
                        keys[1 + 2 * i], self.nfilter, self.nfilter
                    ),
                    "w2": self._conv_init(
                        keys[2 + 2 * i], self.nfilter, self.nfilter
                    ),
                }
                for i in range(self.nres)
            ],
            "conv_out": self._conv_init(
                keys[-1], self.nfilter, self.out_features
            ),
        }
        return tower

    def init(self, key: jax.Array):
        if not self.stack_splits:
            return {"tower": self._tower_init(key, self.input_features)}
        params = {"towers": [], "merge_w": []}
        m = self.op.m
        for s, e in self.stack_splits:
            key, tk, mk = jax.random.split(key, 3)
            params["towers"].append(self._tower_init(tk, e - s))
            params["merge_w"].append(
                common.trunc_normal(mk, (m, self.out_features))
            )
        return params

    # ---- forward ----

    def _residual_network(self, tower, x):
        """conv_init -> n x residual block -> conv_out
        (graph_conv.py:305-330)."""
        x = self.act(self._conv(tower["conv_init"], x))
        for blk in tower["res"]:
            identity = x
            x = self.act(self._conv(blk["w1"], x))
            x = self._conv(blk["w2"], x)
            if self.residual:
                x = x + identity  # merge before activation, graph_conv.py:247-250
            x = self.act(x)
        return self._conv(tower["conv_out"], x)

    def apply(self, params, x: jax.Array, *, train: bool = False, rng=None):
        """``x``: [B, M, C] -> [B, M, out_features] (raw outputs; the ReLU
        prediction head is applied by the Trainer at predict time)."""
        if not self.stack_splits:
            return self._residual_network(params["tower"], x)
        # Parallel towers over channel slices, merged with learned
        # per-node weights (graph_conv.py:286-300).
        out = None
        for (s, e), tower, w in zip(
            self.stack_splits, params["towers"], params["merge_w"]
        ):
            y = jax.nn.relu(self._residual_network(tower, x[:, :, s:e]))
            y = y * w  # [B, M, F] * [M, F]
            out = y if out is None else out + y
        return out

    def loss(self, params, x, y, *, train: bool = False, rng=None):
        """Mean squared error (graph_model.py:253-259)."""
        pred = self.apply(params, x, train=train, rng=rng)
        return jnp.mean((y - pred) ** 2)
