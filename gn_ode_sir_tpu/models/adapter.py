"""Adapter giving the time-unrolled GNN baselines the shared SIR-trial
interface used by the training engine.

The GCN/GIN drivers feed per-node features [S0, I0, R0, beta, gamma]
(``gnn_ngraph.py:262-266``) and predict t = 1..window-1; the GN-ODE engine
speaks (s0, i0, r0, beta, gamma) -> [T, B, n, 3]. This adapter bridges the
two so ONE fit loop serves every trainable model family. The t=0 slice is
filled with the exact initial condition (it is excluded from the loss, which
starts at t >= 1, ``gnn_ngraph.py:137``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TimeUnrolledSIR:
    """Wraps a GCN/GIN into the (s0, i0, r0, beta, gamma) trial interface.

    ``with_rates=False`` gives the legacy 3-feature variant ([S0, I0, R0]
    only — the ``models.py:6-48`` input_dim=3 models used by the reference's
    transductive ``ode_nn.py`` path at ``:436-437``).
    """

    gnn: object  # GCN or GIN dataclass
    with_rates: bool = True

    @property
    def max_time(self) -> int:
        return self.gnn.window

    def init(self, key):
        return self.gnn.init(key)

    def predict(self, params, adj, s0, i0, r0, beta, gamma, *, rng=None, train=False):
        B, n = s0.shape
        feats = [s0[..., None], i0[..., None], r0[..., None]]
        if self.with_rates:
            feats += [
                jnp.broadcast_to(beta[:, None, None], (B, n, 1)),
                jnp.broadcast_to(gamma[:, None, None], (B, n, 1)),
            ]
        x = jnp.concatenate(feats, axis=-1)
        out = self.gnn.apply(params, adj, x, rng=rng, train=train)  # [T-1, B, n, 3]
        t0 = jnp.stack([s0, i0, r0], axis=-1)[None]  # exact initial condition
        return jnp.concatenate([t0, out], axis=0)  # [T, B, n, 3]
