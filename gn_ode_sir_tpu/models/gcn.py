"""Time-unrolled GCN baseline.

Re-implements the reference GCN (``gnn_ngraph.py:32-68``; ``models.py:6-48``):
``window`` stacked GCN convolutions where layer L's output is the prediction
for label time t = L+1; per-time decode fc1 -> relu -> fc2 -> softmax over
(S, I, R). The PyG ``GCNConv`` is replaced by our normalized SpMM
(``ops.gcn_norm_edges``: D^-1/2 (A+I) D^-1/2) on the shared adjacency
pytrees; trial batching is a vmapped batch axis instead of PyG
disjoint-union batching.

Note the reference forward uses only layers 0..window-2 (window-1 outputs,
compared against labels at t>=1, ``gnn_ngraph.py:54-61,137``); we reproduce
that: ``apply`` returns [window-1, B, n, 3].
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gn_ode_sir_tpu.models.common import dropout as _dropout
from gn_ode_sir_tpu.models.common import linear, linear_init


@dataclasses.dataclass(frozen=True)
class GCN:
    input_dim: int = 5
    hidden_dim: int = 8
    penultimate_dim: int = 4
    n_targets: int = 3
    dropout: float = 0.1
    window: int = 20  # == maxTime

    def init(self, key):
        n_layers = self.window
        keys = jax.random.split(key, n_layers + 2)
        convs = [linear_init(keys[0], self.input_dim, self.hidden_dim)]
        for i in range(1, n_layers):
            convs.append(linear_init(keys[i], self.hidden_dim, self.hidden_dim))
        return {
            "convs": convs,
            "fc1": linear_init(keys[-2], self.hidden_dim, self.penultimate_dim),
            "fc2": linear_init(keys[-1], self.penultimate_dim, self.n_targets),
        }

    def apply(self, params, adj, x, *, rng=None, train: bool = False):
        """x: [B, n, input_dim]; adj: normalized adjacency pytree.

        Returns [window-1, B, n, 3] softmax probabilities for t = 1..window-1.
        """
        n_used = self.window - 1
        rngs = (
            jax.random.split(rng, n_used + 1) if rng is not None else [None] * (n_used + 1)
        )
        outs = []
        h = x
        for layer in range(n_used):
            p = params["convs"][layer]
            # GCNConv order: aggregate(X W) then add bias (PyG semantics).
            h = adj.matvec(h @ p["w"]) + p["b"]
            h = jax.nn.relu(h)
            h = _dropout(rngs[layer], h, self.dropout, train)
            outs.append(h)
        y = jnp.stack(outs)  # [window-1, B, n, hidden]
        y = jax.nn.relu(linear(params["fc1"], y))
        y = _dropout(rngs[-1], y, self.dropout, train)
        y = linear(params["fc2"], y)
        return jax.nn.softmax(y, axis=-1)
