"""ChebNet: spectral graph-CNN classifier (conv -> pool stacks + fc head).

The classification model family of the reference — the ``cgcnn`` API
described in lib/models.py:21-59 and driven by usage.ipynb /
nips2016/mnist.ipynb / 20news.ipynb: per-layer Chebyshev (or Fourier /
spline) filters over coarsened Laplacians, bias+ReLU, binary-tree pooling,
then fully-connected layers with dropout and a softmax cross-entropy head.

Note the fork's ``cgcnn`` is broken (its ``base_model`` parent was deleted,
models.py:20) and the ``spline`` filter the notebooks request was removed;
this implementation restores the intended upstream capability surface —
including spline filters — as a clean functional JAX model.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cnn_graph_tpu.models import common
from cnn_graph_tpu.ops import (
    avg_pool,
    cheby_conv,
    fourier_conv,
    lanczos_conv,
    max_pool,
)
from cnn_graph_tpu.graphs import construction as gc

__all__ = ["ChebNet", "bspline_basis"]


def bspline_basis(K: int, x: np.ndarray, degree: int = 3) -> np.ndarray:
    """Cox-de Boor B-spline basis: K basis functions of the given degree
    evaluated at points ``x`` (here: Laplacian eigenvalues), open uniform
    knot vector over [x.min(), x.max()].  Restores the upstream ``spline``
    filter deleted by the fork (requested by nips2016/mnist.ipynb cell 12
    and humanflow.py:504)."""
    x = np.asarray(x, np.float64)
    lo, hi = float(x.min()), float(x.max())
    # Open uniform knots: degree+1 repeats at each end.
    n_inner = K - degree + 1
    inner = np.linspace(lo, hi, max(n_inner, 2))
    knots = np.concatenate([[lo] * degree, inner, [hi] * degree])

    # Cox-de Boor recursion, degree 0 base case.
    B = np.zeros((len(x), len(knots) - 1))
    for j in range(len(knots) - 1):
        B[:, j] = (x >= knots[j]) & (x < knots[j + 1])
    B[x == hi, np.searchsorted(knots, hi, "left") - 1] = 1.0
    for d in range(1, degree + 1):
        nb = len(knots) - 1 - d
        Bn = np.zeros((len(x), nb))
        for j in range(nb):
            left_den = knots[j + d] - knots[j]
            right_den = knots[j + d + 1] - knots[j + 1]
            left = (x - knots[j]) / left_den * B[:, j] if left_den > 0 else 0.0
            right = (
                (knots[j + d + 1] - x) / right_den * B[:, j + 1]
                if right_den > 0
                else 0.0
            )
            Bn[:, j] = left + right
        B = Bn
    assert B.shape[1] == K, (B.shape, K)
    return B.astype(np.float32)


class ChebNet:
    """Graph CNN classifier.

    Hyper-parameters mirror the reference config surface (models.py:21-59):

    * ``operators`` — per-coarsening-level Laplacian device operators
      (from ``ops.device_laplacian``); one per level, finest first.
    * ``F``, ``K``, ``p`` — per-gconv-layer filter counts, polynomial
      orders, pooling sizes (powers of two).
    * ``M`` — fully-connected layer widths; ``M[-1]`` is the class count.
    * ``laplacians`` — the host-side scipy Laplacians (needed for the
      Fourier/spline filters' eigenbases; optional for Chebyshev/Lanczos).
    * ``filter`` — ``chebyshev`` | ``fourier`` | ``spline`` | ``lanczos``
      (the last resolves the reference's named-but-dormant ``lanczos2``
      option, lib/models.py:40 / lib/graph.py:184-229: a per-signal
      K-step Krylov basis computed on device, taps like Chebyshev).
    * ``brelu`` — ``b1relu`` | ``b2relu`` | ``b1tanh``.
    * ``pool`` — ``max`` | ``average`` (mpool1/apool1 in the reference).
    * ``dropout`` — keep probability for fc-layer dropout.
    * ``input_grad`` (default False) — by default the first Chebyshev
      conv declares that no cotangent with respect to the model INPUT is
      consumed (raw pixels/features are leaves in the shipped training
      loops), which on banded operators skips the backward adjoint chain
      for layer 0.  The contract: with the default, ``jax.grad`` with
      respect to ``x`` through a banded layer 0 returns EXACT ZEROS —
      silently.  Pass ``input_grad=True`` for saliency/adversarial-input
      work or any differentiable front-end feeding ``x``.
    """

    def __init__(
        self,
        operators,
        F,
        K,
        p,
        M,
        input_features: int = 1,
        laplacians=None,
        filter: str = "chebyshev",
        brelu: str = "b1relu",
        pool: str = "max",
        dropout: float = 1.0,
        regularization: float = 0.0,
        spline_degree: int = 3,
        input_grad: bool = False,
    ):
        self.input_grad = input_grad
        assert len(operators) >= len(F) == len(K) == len(p)
        p_arr = np.asarray(p)
        assert np.all(p_arr >= 1)
        p_log2 = np.where(p_arr > 1, np.log2(p_arr), 0)
        assert np.all(np.mod(p_log2, 1) == 0), "pool sizes must be powers of 2"
        assert len(operators) >= 1 + int(np.sum(p_log2)), "not enough coarsening levels"

        # Keep only the Laplacians actually used, one per gconv layer
        # (graph_conv.py:32-39): layer i uses level sum(log2 p[:i]).
        levels = np.concatenate([[0], np.cumsum(p_log2[:-1])]).astype(int)
        self.operators = [operators[j] for j in levels]
        self.F, self.K, self.p, self.M = list(F), list(K), list(p), list(M)
        self.input_features = input_features
        self.filter = filter
        self.brelu = brelu
        self.pool_fn = {"max": max_pool, "average": avg_pool}[pool]
        self.dropout = dropout
        self.regularization = regularization

        if filter in ("fourier", "spline"):
            assert laplacians is not None, f"{filter} filter needs host Laplacians"
            self._bases = []
            for j, klayer in zip(levels, K):
                lam, U = gc.fourier(laplacians[j])
                U = jnp.asarray(U, jnp.float32)
                if filter == "spline":
                    Bmat = jnp.asarray(bspline_basis(klayer, lam, spline_degree))
                    self._bases.append((U, Bmat))
                else:
                    self._bases.append((U, None))

        # Flattened size entering the fc head.
        m_last = self.operators[-1].m if F else None
        self._fc_in = (
            m_last * F[-1] // p[-1] if F else operators[0].m * input_features
        )

    # ---- parameters ----

    def init(self, key: jax.Array):
        params = {"gconv": [], "fc": []}
        fin = self.input_features
        for i, (fout, klayer) in enumerate(zip(self.F, self.K)):
            key, wk = jax.random.split(key)
            m_i = self.operators[i].m
            if self.filter in ("chebyshev", "lanczos"):
                w = common.trunc_normal(wk, (klayer, fin, fout))
            elif self.filter == "fourier":
                w = common.trunc_normal(wk, (m_i, fout, fin))
            else:  # spline: K control points per (fin, fout) pair
                w = common.trunc_normal(wk, (klayer, fout, fin))
            layer = {"w": w}
            layer.update(common.bias_act_init(self.brelu, m_i, fout))
            params["gconv"].append(layer)
            fin = fout

        m_in = self._fc_in
        for m_out in self.M:
            key, fk = jax.random.split(key)
            params["fc"].append(common.fc_init(fk, m_in, m_out))
            m_in = m_out
        return params

    # ---- forward ----

    def _filter(self, i, x, w):
        if self.filter == "chebyshev":
            # Layer 0 convolves the RAW input signal: unless the model
            # was built with input_grad=True its cotangent is never
            # consumed, so the banded backward skips the adjoint chain
            # (zero-dx contract — see the class docstring and
            # ops/filters.py cheby_conv_banded).
            return cheby_conv(x, self.operators[i], w,
                              input_grad=(i > 0 or self.input_grad))
        if self.filter == "lanczos":
            return lanczos_conv(x, self.operators[i], w)
        U, Bmat = self._bases[i]
        if self.filter == "fourier":
            return fourier_conv(x, U, w)
        # spline: per-frequency weights are a B-spline interpolation of K
        # control points -> [M, Fout, Fin].
        w_freq = jnp.einsum("mk,kof->mof", Bmat, w)
        return fourier_conv(x, U, w_freq)

    def apply(self, params, x: jax.Array, *, train: bool = False, rng=None):
        """Forward pass: ``x`` is [B, M0] or [B, M0, Fin] -> logits [B, C]."""
        if x.ndim == 2:
            x = x[:, :, None]
        # Per layer: filter -> bias+activation -> pool (upstream cgcnn order).
        for i, layer in enumerate(params["gconv"]):
            x = self._filter(i, x, layer["w"])
            x = common.bias_act(layer, x, self.brelu)
            x = self.pool_fn(x, self.p[i])

        B = x.shape[0]
        x = x.reshape(B, -1)
        n_fc = len(params["fc"])
        for j, layer in enumerate(params["fc"]):
            last = j == n_fc - 1
            x = common.fc_apply(layer, x, relu=not last)
            if not last and train and self.dropout < 1.0:
                rng, dk = jax.random.split(rng)
                x = common.dropout(dk, x, self.dropout, train)
        return x

    # ---- objective ----

    def loss(self, params, x, labels, *, train: bool = False, rng=None):
        """Mean softmax cross-entropy + L2 regularization of the fc layers
        (filters are unregularized, matching graph_conv.py:174 vs :223)."""
        logits = self.apply(params, x, train=train, rng=rng)
        ce = jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(labels.shape[0]), labels]
        )
        if self.regularization:
            reg = sum(
                0.5 * jnp.sum(l["w"] ** 2) + 0.5 * jnp.sum(l["b"] ** 2)
                for l in params["fc"]
            )
            ce = ce + self.regularization * reg
        return ce

    def predict_classes(self, params, x):
        return jnp.argmax(self.apply(params, x), axis=1)
