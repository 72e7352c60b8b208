"""Spatiotemporal forecasting model zoo: gLSTM / gconv architectures with
multi-timescale (closeness / period / trend) branch fusion.

Functional re-design of the reference's ``GconvModel``
(lib/gconv_lstm.py:224-671), whose 12 ``inference_*`` variants are
compositions of four building blocks — a gLSTM stack over a channel-window,
a residual gconv stack, a single-gconv projection head, and a learned
per-node weighted merge of branches.  Here each block is a helper and the
variants are declarative compositions, rather than 12 copied methods.

Variant names match the reference's ``infer_func`` strings:

    glstm, glstm_period_no_expand, gconv, gconv_period_no_expand,
    gconv_period_expand, glstm_gconv, glstm_gconv_no_expand,
    glstm_gconv_split, glstm_period_expand, glstm_period_expand_gconv1,
    glstm_period_expand_gconv2, glstm_period_expand_gconv3

Deviations from the fork (documented per SURVEY.md §7(e)):
* ``glstm_period_no_expand`` returns the fc head's output — the fork
  computes the head then returns the *pre-head* tensor
  (gconv_lstm.py:294-295), which only type-checks when hidden == output.
* ``glstm_period_expand_gconv2``'s stray input transpose
  (gconv_lstm.py:554) is dropped; all variants use the same
  ``[B, M, Fin, T]`` window layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cnn_graph_tpu.models import common
from cnn_graph_tpu.models.gconv_lstm import (
    GConvLSTMCell,
    glstm_stack_apply,
    glstm_stack_init,
)
from cnn_graph_tpu.ops import cheby_conv, fourier_conv

__all__ = ["GConvForecaster", "FORECAST_VARIANTS"]

FORECAST_VARIANTS = (
    "glstm",
    "glstm_period_no_expand",
    "gconv",
    "gconv_period_no_expand",
    "gconv_period_expand",
    "glstm_gconv",
    "glstm_gconv_no_expand",
    "glstm_gconv_split",
    "glstm_period_expand",
    "glstm_period_expand_gconv1",
    "glstm_period_expand_gconv2",
    "glstm_period_expand_gconv3",
)


class GConvForecaster:
    """Next-step flow forecaster over a region graph.

    ``x``: [B, M, C] with C = 2*(seq_closeness + seq_period + seq_trend)
    channels laid out [in-window, out-window] per timescale (the
    HumanTraffic sample layout, nips2016/humantraffic.py:56-61);
    output: [B, M, out_features].
    """

    def __init__(
        self,
        operator,
        seq_closeness: int,
        seq_period: int = 0,
        seq_trend: int = 0,
        variant: str = "glstm",
        filter: str = "cheby_conv",
        fourier_u=None,
        num_hidden: int = 64,
        num_hidden_conv: int = 32,
        conv_layer_num: int = 4,
        lstm_layer_count: int = 1,
        K: int = 2,
        in_features: int = 2,
        out_features: int = 2,
        lstm_keep_prob: float = 0.8,
    ):
        assert variant in FORECAST_VARIANTS, variant
        # Validate the window layout up front (otherwise mismatches only
        # surface as reshape errors deep inside apply): the full-window
        # gLSTM variants fold ALL channels over Tc steps, the split
        # variant needs exactly two closeness-sized windows, and the
        # period-expand variants need all three timescales present.
        assert seq_closeness >= 1, "seq_closeness must be >= 1"
        c_all = 2 * (seq_closeness + seq_period + seq_trend)
        if variant in ("glstm", "glstm_period_no_expand", "glstm_gconv",
                       "glstm_gconv_no_expand"):
            assert c_all % seq_closeness == 0, (
                f"variant {variant!r} folds all {c_all} channels over "
                f"seq_closeness={seq_closeness} steps; the total window "
                "must be divisible by it"
            )
        if variant == "glstm_gconv_split":
            assert c_all == 4 * seq_closeness, (
                f"variant 'glstm_gconv_split' needs two closeness-sized "
                f"windows (4*seq_closeness={4 * seq_closeness} channels), "
                f"got {c_all}"
            )
        if "period_expand" in variant:
            assert seq_period > 0 and seq_trend > 0, (
                f"variant {variant!r} fuses closeness/period/trend "
                "branches; seq_period and seq_trend must be > 0"
            )
        self.op = operator
        self.Tc, self.Tp, self.Tt = seq_closeness, seq_period, seq_trend
        self.variant = variant
        self.filter = filter
        self.fourier_u = fourier_u
        self.H = num_hidden
        self.Hc = num_hidden_conv
        self.n_conv = conv_layer_num
        self.n_lstm = lstm_layer_count
        self.K = K
        self.Fin = in_features
        self.Fout = out_features
        self.keep = lstm_keep_prob

    def to_string(self) -> str:
        """Pipe-delimited hyperparameter log line (gconv_lstm.py:261-263)."""
        return (
            f"|{self.Tc}|{self.Tp}|{self.Tt}|{self.Fin}|{self.H}|{self.K}"
            f"|{self.filter}|{self.n_conv}|{self.n_lstm}|{self.variant}|{self.Hc}"
        )

    # ---- building blocks ----

    def _gconv_init(self, key, fin, fout):
        if self.filter == "cheby_conv":
            return common.trunc_normal(key, (self.K, fin, fout))
        return common.trunc_normal(key, (self.op.m, fout, fin))

    def _gconv(self, w, x):
        if self.filter == "cheby_conv":
            return cheby_conv(x, self.op, w)
        return fourier_conv(x, self.fourier_u, w)

    def _cells(self, fin):
        cells = [
            GConvLSTMCell(
                self.op, self.H, fin, K=self.K, filter_type=self.filter,
                fourier_u=self.fourier_u,
            )
        ]
        for _ in range(self.n_lstm - 1):
            cells.append(
                GConvLSTMCell(
                    self.op, self.H, self.H, K=self.K, filter_type=self.filter,
                    fourier_u=self.fourier_u,
                )
            )
        return cells

    def _glstm_branch_init(self, key, fin):
        return glstm_stack_init(key, self._cells(fin))

    def _glstm_branch(self, params, x_window, T, *, train, rng):
        """x_window: [B, M, Fin*T] channels -> last gLSTM output [B, M, H].

        Window layout: channels reshape to (Fin, T) — the in/out series as
        feature rows over T steps (gconv_lstm.py:273-275).
        """
        B, M, C = x_window.shape
        fin = C // T
        x = x_window.reshape(B, M, fin, T)
        x_seq = jnp.moveaxis(x, 3, 0)  # [T, B, M, Fin]
        out_seq = glstm_stack_apply(
            params, self._cells(fin), x_seq, train=train, rng=rng,
            output_keep_prob=self.keep,
        )
        return out_seq[-1]

    def _conv_stack_init(self, key, fin, hidden):
        keys = jax.random.split(key, 1 + 2 * self.n_conv)
        return {
            "init": self._gconv_init(keys[0], fin, hidden),
            "res": [
                {
                    "w1": self._gconv_init(keys[1 + 2 * i], hidden, hidden),
                    "w2": self._gconv_init(keys[2 + 2 * i], hidden, hidden),
                }
                for i in range(self.n_conv)
            ],
        }

    def _conv_stack(self, params, x, init_act, res_act):
        """init conv + residual gconv layers (gconv_lstm.py:642-658)."""
        acts = {"relu": jax.nn.relu, "tanh": jnp.tanh}
        x = acts[init_act](self._gconv(params["init"], x))
        act = acts[res_act]
        for blk in params["res"]:
            identity = x
            x = act(self._gconv(blk["w1"], x))
            x = self._gconv(blk["w2"], x)
            x = act(x + identity)
        return x

    def _splits(self):
        """Channel ranges of the closeness / period / trend windows."""
        c = 2 * self.Tc
        p = c + 2 * self.Tp
        t = p + 2 * self.Tt
        return [(0, c), (c, p), (p, t)]

    # ---- init / apply ----

    def init(self, key: jax.Array):
        v = self.variant
        p: dict = {}
        k = iter(jax.random.split(key, 16))
        C_all = 2 * (self.Tc + self.Tp + self.Tt)

        if v in ("glstm", "glstm_period_no_expand"):
            fin = C_all // self.Tc
            p["lstm"] = self._glstm_branch_init(next(k), fin)
            p["head"] = self._gconv_init(next(k), self.H, self.Fout)
        elif v in ("gconv", "gconv_period_no_expand"):
            p["stack"] = self._conv_stack_init(next(k), C_all, self.H)
            p["head"] = self._gconv_init(next(k), self.H, self.Fout)
        elif v == "gconv_period_expand":
            p["branches"] = [
                self._conv_stack_init(next(k), e - s, self.H)
                for s, e in self._splits()
            ]
            p["branch_heads"] = [
                self._gconv_init(next(k), self.H, self.Fout) for _ in range(3)
            ]
            p["merge"] = self._gconv_init(next(k), 3 * self.Fout, self.Fout)
        elif v in ("glstm_gconv", "glstm_gconv_no_expand"):
            fin = C_all // self.Tc
            p["lstm"] = self._glstm_branch_init(next(k), fin)
            p["stack"] = self._conv_stack_init(next(k), self.H, self.Hc)
            p["head"] = self._gconv_init(next(k), self.Hc, self.Fout)
        elif v == "glstm_gconv_split":
            # Two closeness-sized windows (gconv_lstm.py:436-439).
            p["lstms"] = [
                self._glstm_branch_init(next(k), 2) for _ in range(2)
            ]
            p["stack"] = self._conv_stack_init(next(k), 2 * self.H, self.H)
            p["head"] = self._gconv_init(next(k), self.H, self.Fout)
        elif v in ("glstm_period_expand", "glstm_period_expand_gconv1"):
            p["lstms"] = [self._glstm_branch_init(next(k), 2) for _ in range(3)]
            p["branch_heads"] = [
                self._gconv_init(next(k), self.H, self.Fout) for _ in range(3)
            ]
            p["merge_w"] = [
                common.trunc_normal(next(k), (self.op.m, self.Fout))
                for _ in range(3)
            ]
        elif v == "glstm_period_expand_gconv2":
            p["lstms"] = [self._glstm_branch_init(next(k), 2) for _ in range(3)]
            p["branch_heads"] = [
                self._gconv_init(next(k), self.H, self.Fout) for _ in range(3)
            ]
            p["merge"] = self._gconv_init(next(k), 3 * self.Fout, self.Fout)
        elif v == "glstm_period_expand_gconv3":
            p["lstms"] = [self._glstm_branch_init(next(k), 2) for _ in range(3)]
            p["stack"] = self._conv_stack_init(next(k), 3 * self.H, self.H)
            p["head"] = self._gconv_init(next(k), self.H, self.Fout)
        return p

    def apply(self, params, x: jax.Array, *, train: bool = False, rng=None):
        v = self.variant
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rngs = iter(jax.random.split(rng, 8))

        if v in ("glstm", "glstm_period_no_expand"):
            h = self._glstm_branch(
                params["lstm"], x, self.Tc, train=train, rng=next(rngs)
            )
            return self._gconv(params["head"], h)

        if v in ("gconv", "gconv_period_no_expand"):
            act = "tanh" if v == "gconv" else "relu"
            h = self._conv_stack(params["stack"], x, act, act)
            return self._gconv(params["head"], h)

        if v == "gconv_period_expand":
            outs = []
            for (s, e), stack, head in zip(
                self._splits(), params["branches"], params["branch_heads"]
            ):
                h = self._conv_stack(stack, x[:, :, s:e], "tanh", "relu")
                outs.append(jax.nn.relu(self._gconv(head, h)))
            merged = jnp.concatenate(outs, axis=2)
            return self._gconv(params["merge"], merged)

        if v in ("glstm_gconv", "glstm_gconv_no_expand"):
            h = self._glstm_branch(
                params["lstm"], x, self.Tc, train=train, rng=next(rngs)
            )
            h = self._conv_stack(params["stack"], h, "relu", "relu")
            return self._gconv(params["head"], h)

        if v == "glstm_gconv_split":
            w = 2 * self.Tc
            outs = [
                self._glstm_branch(
                    params["lstms"][i], x[:, :, i * w : (i + 1) * w], self.Tc,
                    train=train, rng=next(rngs),
                )
                for i in range(2)
            ]
            h = jnp.concatenate(outs, axis=2)
            h = self._conv_stack(params["stack"], h, "relu", "relu")
            return self._gconv(params["head"], h)

        if v in ("glstm_period_expand", "glstm_period_expand_gconv1"):
            out = None
            for (s, e), T, lstm, head, w in zip(
                self._splits(),
                (self.Tc, self.Tp, self.Tt),
                params["lstms"],
                params["branch_heads"],
                params["merge_w"],
            ):
                h = self._glstm_branch(
                    lstm, x[:, :, s:e], T, train=train, rng=next(rngs)
                )
                y = self._gconv(head, h) * w  # learned per-node weights
                out = y if out is None else out + y
            return out

        if v == "glstm_period_expand_gconv2":
            outs = []
            for (s, e), T, lstm, head in zip(
                self._splits(), (self.Tc, self.Tp, self.Tt),
                params["lstms"], params["branch_heads"],
            ):
                h = self._glstm_branch(
                    lstm, x[:, :, s:e], T, train=train, rng=next(rngs)
                )
                outs.append(self._gconv(head, h))
            return self._gconv(params["merge"], jnp.concatenate(outs, axis=2))

        if v == "glstm_period_expand_gconv3":
            outs = [
                self._glstm_branch(
                    lstm, x[:, :, s:e], T, train=train, rng=next(rngs)
                )
                for (s, e), T, lstm in zip(
                    self._splits(), (self.Tc, self.Tp, self.Tt), params["lstms"]
                )
            ]
            h = jnp.concatenate(outs, axis=2)
            h = self._conv_stack(params["stack"], h, "relu", "relu")
            return self._gconv(params["head"], h)

        raise ValueError(f"unknown variant {v!r}")

    def loss(self, params, x, y, *, train: bool = False, rng=None):
        pred = self.apply(params, x, train=train, rng=rng)
        return jnp.mean((y - pred) ** 2)
