"""Time-unrolled GIN baseline.

Re-implements the reference GIN (``gnn_ngraph.py:71-103``; ``models.py:51-84``):
``window`` stacked GIN convolutions, layer L -> prediction for time t = L+1.
Each conv is ``MLP((1+eps) x + sum_{j in N(i)} x_j)`` with eps = 0 (PyG
default) and MLP = Linear-ReLU-BatchNorm-Linear-ReLU-BatchNorm
(``gnn_ngraph.py:75-78``). Aggregation is the raw (unnormalized) sum SpMM.

Deviation note: BatchNorm here always normalizes with the statistics of the
current node batch (no running-average eval mode); the reference's train/eval
BN distinction is a torch stateful detail that does not change the learning
problem and keeps this model a pure function.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gn_ode_sir_tpu.models.common import dropout as _dropout
from gn_ode_sir_tpu.models.common import linear, linear_init


def _batch_norm(p, x, eps: float = 1e-5):
    # Normalize over all axes except features (node-batch statistics).
    axes = tuple(range(x.ndim - 1))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _mlp_init(key, d_in, d_hidden):
    k1, k2 = jax.random.split(key)
    return {
        "lin1": linear_init(k1, d_in, d_hidden),
        "bn1": {"scale": jnp.ones((d_hidden,)), "bias": jnp.zeros((d_hidden,))},
        "lin2": linear_init(k2, d_hidden, d_hidden),
        "bn2": {"scale": jnp.ones((d_hidden,)), "bias": jnp.zeros((d_hidden,))},
    }


def _mlp(p, x):
    x = _batch_norm(p["bn1"], jax.nn.relu(linear(p["lin1"], x)))
    x = _batch_norm(p["bn2"], jax.nn.relu(linear(p["lin2"], x)))
    return x


@dataclasses.dataclass(frozen=True)
class GIN:
    input_dim: int = 5
    hidden_dim: int = 8
    penultimate_dim: int = 4
    n_targets: int = 3
    dropout: float = 0.1
    window: int = 20
    eps: float = 0.0

    def init(self, key):
        keys = jax.random.split(key, self.window + 2)
        convs = [_mlp_init(keys[0], self.input_dim, self.hidden_dim)]
        for i in range(1, self.window):
            convs.append(_mlp_init(keys[i], self.hidden_dim, self.hidden_dim))
        return {
            "convs": convs,
            "fc1": linear_init(keys[-2], self.hidden_dim, self.penultimate_dim),
            "fc2": linear_init(keys[-1], self.penultimate_dim, self.n_targets),
        }

    def apply(self, params, adj, x, *, rng=None, train: bool = False):
        """x: [B, n, input_dim]; adj: RAW-sum adjacency pytree (no norm).

        Returns [window-1, B, n, 3] softmax probabilities for t = 1..window-1.
        """
        n_used = self.window - 1
        rngs = (
            jax.random.split(rng, n_used + 1) if rng is not None else [None] * (n_used + 1)
        )
        outs = []
        h = x
        for layer in range(n_used):
            agg = (1.0 + self.eps) * h + adj.matvec(h)
            h = jax.nn.relu(_mlp(params["convs"][layer], agg))
            h = _dropout(rngs[layer], h, self.dropout, train)
            outs.append(h)
        y = jnp.stack(outs)
        y = jax.nn.relu(linear(params["fc1"], y))
        y = _dropout(rngs[-1], y, self.dropout, train)
        y = linear(params["fc2"], y)
        return jax.nn.softmax(y, axis=-1)
