"""Graph layers from the reference's model toolbox.

Reference analogs: ``torchreid/models/layers.py:7-53`` (dense
``GraphAttentionLayer``), ``torchreid/models/ieee3modalPart.py:83-100``
(``GAT``) and ``:103-131`` (``GraphConvolution``), plus the GCN adjacency
helpers ``torchreid/models/util.py:291-308`` (``gen_A``/``gen_adj``).

These are imported-but-unused by the reference's IEEE forward; they're
provided for API completeness (a Torchreid user migrating experiments that
DO use them finds them here), kept TPU-friendly: dense masked attention
(the reference's sparse ``SpGraphAttentionLayer`` custom-autograd path is a
CPU/GPU scatter workaround — on the MXU the dense masked formulation IS the
fast path for the N<=a-few-thousand graphs these are used with).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["GraphAttentionLayer", "GAT", "GraphConvolution", "gen_A",
           "gen_adj"]


class GraphAttentionLayer(nn.Module):
    """Dense GAT layer (reference ``layers.py:7-53``).

    ``e_ij = LeakyReLU(a^T [Wh_i || Wh_j])`` factorized exactly as the
    reference does: ``e = Wh @ a[:F'] + (Wh @ a[F':])^T`` — one (N,N)
    broadcast add instead of materializing (N,N,2F') concat pairs.
    """

    in_features: int
    out_features: int
    dropout: float = 0.0
    alpha: float = 0.2  # LeakyReLU negative slope
    concat: bool = True  # True: ELU on the output (hidden layer)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, adj, *, train: bool = False):
        # xavier_uniform with gain 1.414 = the reference's init
        init = nn.initializers.variance_scaling(
            scale=1.414 ** 2, mode="fan_avg", distribution="uniform")
        W = self.param("W", init, (self.in_features, self.out_features),
                       jnp.float32)
        a = self.param("a", init, (2 * self.out_features, 1), jnp.float32)

        Wh = h.astype(self.dtype) @ W.astype(self.dtype)  # (N, F')
        e = (Wh @ a[: self.out_features].astype(self.dtype)
             + (Wh @ a[self.out_features:].astype(self.dtype)).T)
        e = nn.leaky_relu(e, negative_slope=self.alpha)
        attention = jnp.where(adj > 0, e, jnp.asarray(-9e15, e.dtype))
        attention = jax.nn.softmax(attention, axis=1)
        if train and self.dropout > 0:
            attention = nn.Dropout(rate=self.dropout, deterministic=False)(
                attention)
        h_prime = attention @ Wh
        return nn.elu(h_prime) if self.concat else h_prime


class GAT(nn.Module):
    """Multi-head dense GAT (reference ``ieee3modalPart.py:83-100``):
    nheads parallel hidden layers concatenated, then one output head,
    ELU at the end."""

    nfeat: int
    nhid: int
    nclass: int
    dropout: float = 0.0
    alpha: float = 0.2
    nheads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, adj, *, train: bool = False):
        if train and self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        heads = [
            GraphAttentionLayer(
                self.nfeat, self.nhid, dropout=self.dropout,
                alpha=self.alpha, concat=True, dtype=self.dtype,
                name=f"attention_{i}")(x, adj, train=train)
            for i in range(self.nheads)
        ]
        x = jnp.concatenate(heads, axis=1)
        if train and self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        x = GraphAttentionLayer(
            self.nhid * self.nheads, self.nclass, dropout=self.dropout,
            alpha=self.alpha, concat=False, dtype=self.dtype,
            name="out_att")(x, adj, train=train)
        return nn.elu(x)


class GraphConvolution(nn.Module):
    """Simple GCN layer (reference ``ieee3modalPart.py:103-131``):
    ``adj @ (input @ W) [+ bias]``."""

    in_features: int
    out_features: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, adj):
        stdv = 1.0 / float(np.sqrt(self.out_features))
        init = nn.initializers.uniform(scale=2 * stdv)

        def centered(key, shape, dtype):
            return init(key, shape, dtype) - stdv

        weight = self.param("weight", centered,
                            (self.in_features, self.out_features),
                            jnp.float32)
        support = inputs.astype(self.dtype) @ weight.astype(self.dtype)
        output = adj.astype(self.dtype) @ support
        if self.use_bias:
            bias = self.param("bias", centered, (1, 1, self.out_features),
                              jnp.float32)
            output = output + bias.astype(self.dtype)
        return output


def gen_A(num_classes: int, t: float, adj_file: str) -> np.ndarray:
    """Co-occurrence adjacency from a pickled {'adj','nums'} file
    (reference ``util.py:291-302``), including its int-identity add."""
    import pickle

    with open(adj_file, "rb") as f:
        result = pickle.load(f)
    _adj = np.asarray(result["adj"], np.float64)
    _nums = np.asarray(result["nums"], np.float64)[:, np.newaxis]
    _adj = _adj / _nums
    _adj = np.where(_adj < t, 0.0, 1.0)
    _adj = _adj * 0.25 / (_adj.sum(0, keepdims=True) + 1e-6)
    _adj = _adj + np.identity(num_classes)
    return _adj


def gen_adj(A):
    """Symmetric normalization ``(A D^-1/2)^T D^-1/2``
    (reference ``util.py:304-308``)."""
    A = jnp.asarray(A)
    D = jnp.power(A.sum(1), -0.5)
    D = jnp.diag(D)
    return (A @ D).T @ D
