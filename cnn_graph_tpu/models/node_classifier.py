"""Transductive node classification at large-graph scale.

The reference family covers graph-level classification (ChebNet) and
node-level regression (ResGNN); the driver's benchmark configs add
ogbn-style node classification (BASELINE.json config 5: papers100M,
multi-host edge-partitioned Chebyshev).  This model is that capability:
a Chebyshev conv stack producing per-node logits, trained with masked
cross-entropy over the labeled subset (the standard transductive split).

Scale path: pass a block-sparse single-chip operator for million-node
graphs, or a node-sharded operator (parallel/halo.py,
parallel/sparse_halo.py) to edge-partition the Laplacian across a mesh —
the model is operator-agnostic.

The whole graph is one "sample": activations are [1, M, F] internally so
the shared spectral ops apply unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cnn_graph_tpu.models import common
from cnn_graph_tpu.ops import cheby_conv

__all__ = ["NodeClassifier"]


class NodeClassifier:
    """Per-node softmax classifier over a Chebyshev conv stack.

    ``features``: [M, Fin] node features; output logits [M, C].
    ``hidden``: list of hidden widths, e.g. [64, 64]; ``K`` polynomial
    order per layer.

    ``input_grad`` (default False): by default layer 0 declares that no
    cotangent with respect to the INPUT features is consumed — correct
    for the shipped loop (raw features are leaves), and on banded
    operators it skips the K-1-hop backward adjoint chain (~half the
    50k train step; ops/filters.py cheby_conv_banded).  The contract:
    with the default, ``jax.grad`` of any function of the logits with
    respect to ``features`` returns EXACT ZEROS on banded operators —
    silently.  Pass ``input_grad=True`` for saliency maps, adversarial
    input perturbations, or any differentiable front-end feeding the
    features.
    """

    def __init__(
        self,
        operator,
        input_features: int,
        num_classes: int,
        hidden=(64,),
        K: int = 3,
        dropout: float = 1.0,
        residual: bool = False,
        input_grad: bool = False,
    ):
        self.op = operator
        self.Fin = input_features
        self.C = num_classes
        self.hidden = list(hidden)
        self.K = K
        self.dropout = dropout
        self.residual = residual
        self.input_grad = input_grad

    def init(self, key: jax.Array):
        widths = [self.Fin] + self.hidden + [self.C]
        params = {"convs": []}
        for fin, fout in zip(widths[:-1], widths[1:]):
            key, wk = jax.random.split(key)
            params["convs"].append(
                {
                    "w": common.trunc_normal(wk, (self.K, fin, fout)),
                    "b": jnp.zeros((fout,), jnp.float32),
                }
            )
        return params

    def apply(self, params, features: jax.Array, *, train: bool = False,
              rng=None):
        """``features``: [M, Fin] -> logits [M, C]."""
        x = features[None]  # [1, M, Fin]
        n = len(params["convs"])
        for i, layer in enumerate(params["convs"]):
            # Layer 0 convolves RAW features — unless the model was built
            # with input_grad=True, no input cotangent is consumed and the
            # banded backward skips its adjoint chain (~half the 50k
            # train step; see the class docstring for the zero-dx
            # contract and ops/filters.py cheby_conv_banded).
            h = cheby_conv(x, self.op, layer["w"],
                           input_grad=(i > 0 or self.input_grad)) + layer["b"]
            last = i == n - 1
            if not last:
                h = jax.nn.relu(h)
                if self.residual and h.shape[-1] == x.shape[-1]:
                    h = h + x
                if train and self.dropout < 1.0:
                    rng, dk = jax.random.split(rng)
                    h = common.dropout(dk, h, self.dropout, train)
            x = h
        return x[0]

    def loss(self, params, features, labels, mask=None, *,
             train: bool = False, rng=None):
        """Masked mean cross-entropy: ``labels`` [M] int, ``mask`` [M] bool
        selects the labeled (train) nodes; None = all nodes."""
        logits = self.apply(params, features, train=train, rng=rng)
        logp = jax.nn.log_softmax(logits)
        picked = jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        if mask is None:
            return -jnp.mean(picked)
        mask = mask.astype(picked.dtype)
        return -jnp.sum(picked * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def accuracy(self, params, features, labels, mask=None):
        pred = jnp.argmax(self.apply(params, features), axis=1)
        correct = (pred == labels).astype(jnp.float32)
        if mask is None:
            return jnp.mean(correct)
        mask = mask.astype(jnp.float32)
        return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)
