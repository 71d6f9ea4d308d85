"""GN-ODE: continuous-time Graph-Network ODE for SIR dynamics (flagship).

TPU-native re-design of the reference's primary model family:

- C7, batched-trials single-graph (``ode_nn_ngraph_sim.py:37-188``):
  ``activation='sigmoid'``, ``method='euler'`` — the paper configuration.
- C8, multi-graph (``ode_nn_ngraphs.py:37-152``): identical math; here the
  per-sample adjacency is a padded :class:`~gn_ode_sir_tpu.ops.adjacency.CooAdj`
  instead of a host-rebuilt block-diagonal.
- C6, legacy dense single-trial (``ode_nn.py:263-362``):
  ``activation='relu'``, ``deriv_layernorm=True``, ``encode_r=False``,
  ``method='rk4'``.

Key deviations from the reference (deliberate, documented):
- beta/gamma are carried as per-trial side inputs, NOT smuggled into the
  state vector's last quarter (reference ``ode_nn_ngraph_sim.py:60,96``),
  so the ODE state is exactly (S, I, R) hidden embeddings.
- The batch of trials on a shared graph is a vmapped batch axis, not a
  block-diagonal adjacency rebuilt per function evaluation
  (``ode_nn_ngraph_sim.py:68-70``).

Forward math (faithful to the reference at its defaults):
  encode:  E_c = relu(W_enc c0 + b_enc),  c in {S, I, R}   (shared weights,
           ``ode_nn_ngraph_sim.py:151-156``)
  dy/dt:   Z_c = act(W_f E_c + b_f)                         (:62-63)
           AI  = A @ Z_I                                    (:73)
           dS  = -beta * AI .* Z_S                          (:75)
           dI  = -dS - gamma * Z_I                          (:76)
           dR  = gamma * Z_I                                (:77)
  decode:  p_c = W_d2 relu(W_d1 y_c + b_d1) + b_d2          (:172-182)
           (S, I, R) = softmax over the three channels      (:184-186)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gn_ode_sir_tpu.models.common import layer_norm, linear, linear_init
from gn_ode_sir_tpu.odeint import odeint_grid, resample_integer_times


def gnode_ode_func(t, y, args, *, activation: str, deriv_layernorm: bool):
    """The GN-ODE vector field. y = (S, I, R) embeddings, each [B, n, h].

    Dtype-polymorphic: with a bfloat16 state (``GNODE(compute_dtype='bf16')``)
    every op below stays bf16 (matmul accumulation in f32, result cast
    back), engaging the MXU's native bf16 rate; the casts are no-ops in the
    default f32 path."""
    params, beta, gamma, adj = args
    dt = y[0].dtype
    z = jnp.stack(y)  # [3, B, n, h]
    z = linear(params["func"], z)
    z = jax.nn.sigmoid(z) if activation == "sigmoid" else jax.nn.relu(z)
    zs, zi, zr = z[0], z[1], z[2]
    del zr  # recovered-channel embedding does not enter the derivative
    ai = adj.matvec(zi).astype(dt)
    b = beta.astype(dt)[:, None, None]
    g = gamma.astype(dt)[:, None, None]
    ds = -b * ai * zs
    di = -ds - g * zi
    dr = g * zi
    if deriv_layernorm:  # legacy dense variant, ode_nn.py:291-293
        ln = lambda u: layer_norm(params["ln_scale"], params["ln_bias"], u)
        ds, di, dr = ln(ds), ln(di), ln(dr)
    return (ds, di, dr)


# Cache the partial-ed vector fields so repeated model instances share one
# hashable callable (and therefore one XLA compilation).
_FUNC_CACHE: dict = {}


def _get_func(activation: str, deriv_layernorm: bool):
    key = (activation, deriv_layernorm)
    if key not in _FUNC_CACHE:
        _FUNC_CACHE[key] = partial(
            gnode_ode_func, activation=activation, deriv_layernorm=deriv_layernorm
        )
    return _FUNC_CACHE[key]


@dataclasses.dataclass(frozen=True)
class GNODE:
    """Config + init/apply for the GN-ODE model family."""

    hidden: int = 64
    max_time: int = 20
    delta_t: float = 0.5
    method: str = "euler"
    adjoint: str = "checkpoint"
    activation: str = "sigmoid"
    deriv_layernorm: bool = False
    encode_r: bool = True
    compute_dtype: str = "f32"  # 'bf16': ODE state + matmuls in bfloat16
    # (params/optimizer/decode stay f32 — the standard mixed-precision recipe)
    solver_unroll: int = 1  # lax.scan unroll factor for the time stepper
    solver_budget: int = 0  # dopri5_adaptive global attempt budget
    # (0 -> the solver default of 2*(T_grid-1) attempts)

    @property
    def ts(self) -> np.ndarray:
        return np.arange(0.0, self.max_time, self.delta_t, dtype=np.float32)

    def init(self, key):
        k_enc, k_f, k_d1, k_d2 = jax.random.split(key, 4)
        params = {
            "enc": linear_init(k_enc, 1, self.hidden),
            "func": linear_init(k_f, self.hidden, self.hidden),
            "dec1": linear_init(k_d1, self.hidden, 4),
            "dec2": linear_init(k_d2, 4, 1),
        }
        if self.deriv_layernorm:
            params["ln_scale"] = jnp.ones((self.hidden,))
            params["ln_bias"] = jnp.zeros((self.hidden,))
        return params

    def apply(self, params, adj, s0, i0, r0, beta, gamma, *, rng=None, train=False):
        """Full-grid forward.

        Args:
          adj: DenseAdj/CooAdj pytree.
          s0, i0, r0: [B, n] initial per-node state indicators.
          beta, gamma: [B] per-trial SIR rates.
          rng, train: accepted for a uniform model interface (GNODE itself is
            deterministic — the reference's dropout layers are dead code,
            ``ode_nn_ngraph_sim.py:51,64``).
        Returns probabilities [T_grid, B, n, 3] (softmax over SIR).
        """
        del rng, train
        enc = lambda c: jax.nn.relu(linear(params["enc"], c[..., None]))
        s = enc(s0)
        i = enc(i0)
        r = enc(r0) if self.encode_r else jnp.zeros_like(s)

        fparams = params
        if self.compute_dtype == "bf16":
            # bf16 state + bf16 field params: the whole solver scan runs at
            # the MXU's native bf16 rate; gradients flow back through the
            # casts to the f32 master params
            cast = lambda x: x.astype(jnp.bfloat16)
            s, i, r = cast(s), cast(i), cast(r)
            fparams = jax.tree_util.tree_map(cast, params)

        func = _get_func(self.activation, self.deriv_layernorm)
        ts = jnp.asarray(self.ts)
        if self.method == "dopri5_adaptive":
            from gn_ode_sir_tpu.odeint import odeint_grid_adaptive

            traj = odeint_grid_adaptive(
                func, (s, i, r), ts, (fparams, beta, gamma, adj),
                total_steps=self.solver_budget or None,
            )
        else:
            traj = odeint_grid(
                func,
                (s, i, r),
                ts,
                (fparams, beta, gamma, adj),
                method=self.method,
                adjoint=self.adjoint,
                unroll=self.solver_unroll,
                # backsolve: differentiate the field params and the rates,
                # NOT the adjacency — a dense [n, n] cotangent in the
                # reverse-scan carry would cost O(n^2) per step, and sparse
                # backends carry int32 index leaves that have no gradient
                diff_mask=(True, True, True, False),
            )  # tuple of [T, B, n, h]

        y = jnp.stack(traj, axis=-2).astype(jnp.float32)  # [T, B, n, 3, h]
        u = jax.nn.relu(linear(params["dec1"], y))
        v = linear(params["dec2"], u)[..., 0]  # [T, B, n, 3]
        return jax.nn.softmax(v, axis=-1)

    def predict(self, params, adj, s0, i0, r0, beta, gamma, *, rng=None, train=False):
        """Probabilities at integer label times: [max_time, B, n, 3]."""
        probs = self.apply(params, adj, s0, i0, r0, beta, gamma, rng=rng, train=train)
        return resample_integer_times(probs, self.max_time, self.delta_t)


def device_activation_budget(default: int = 2_000_000_000) -> int:
    """Activation-memory budget for the direct+unroll solver, derived from
    the device: 1/8 of ``memory_stats()['bytes_limit']`` (params, labels,
    optimizer state, fwd+bwd working set and XLA scratch share the HBM, and
    the bwd pass roughly doubles the live trajectory, so the full budget is
    never available to stored activations alone). On a 16 GB v5e this lands
    at ~2 GB — the empirically validated round-2 threshold (enron-scale
    batches fall back to the checkpointed scan) — and scales correctly on
    smaller/larger parts. Falls back to 2 GB where ``memory_stats`` is
    unavailable (CPU backend, some TPU tunnels)."""
    try:
        stats = jax.devices()[0].memory_stats()
        limit = (stats or {}).get("bytes_limit")
        if limit:
            return int(limit) // 8
    except Exception:
        pass
    return default


def solver_policy(n_nodes: int, hidden: int, batch_size: int, max_time: int,
                  delta_t: float, adjoint: str = "auto", unroll: int = 0,
                  budget_bytes: int | None = None):
    """Resolve (adjoint, solver_unroll) for a training run.

    Measured on TPU v5e (wiki-vote, batch 1, hidden 64): plain autodiff
    with the time scan FULLY unrolled lets XLA fuse across steps — epoch
    1.05 s vs 1.23 s for the per-step-rematerialized scan; partial unroll
    is WORSE than either (1.5-2.0 s at unroll=8). Full-trajectory
    activations cost T*3*B*n*h*4 bytes, so 'auto' picks direct+full-unroll
    only while that estimate stays under ``budget_bytes`` (default: derived
    from the device via :func:`device_activation_budget`; enron-scale
    batches fall back to the O(T)-memory checkpointed scan)."""
    n_steps = int(round(max_time / delta_t))
    if budget_bytes is None:
        budget_bytes = device_activation_budget()
    if adjoint == "auto":
        est = n_steps * 3 * batch_size * n_nodes * hidden * 4
        adjoint = "direct" if est < budget_bytes else "checkpoint"
    if unroll <= 0:
        unroll = (n_steps - 1) if adjoint == "direct" else 1
    return adjoint, max(1, unroll)


def legacy_dense_gnode(hidden: int = 32, max_time: int = 20, delta_t: float = 0.5) -> GNODE:
    """The C6 single-trial dense variant (``ode_nn.py:263-362``)."""
    return GNODE(
        hidden=hidden,
        max_time=max_time,
        delta_t=delta_t,
        method="rk4",
        activation="relu",
        deriv_layernorm=True,
        encode_r=False,
    )
