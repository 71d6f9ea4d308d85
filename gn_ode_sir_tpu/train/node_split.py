"""Legacy transductive protocol: node-index split on a single trial.

The reference's original entry point (``ode_nn.py:494-627``) trains on ONE
(seed set, beta, gamma) trial and splits the graph's NODES 60/20/20 — a
transductive protocol, unlike the trial split of the ngraph scripts; SURVEY
§3.5 requires both. Faithful details:

- the node permutation is ``np.random.RandomState(seed=42).permutation``
  (``ode_nn.py:418``), reproduced exactly;
- train and val losses come from the same forward pass each epoch
  (``ode_nn.py:426-464``), test runs when val improves (``:586-594``);
- the loss covers ALL label times including t=0 (``:441-444``) — unlike the
  t>=1 slice of the batched protocol.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax


def node_split_indices(n_nodes: int, ratios=(0.6, 0.2, 0.2), seed: int = 42):
    """The reference's seeded node permutation split (``ode_nn.py:416-420``)."""
    idx = np.random.RandomState(seed=seed).permutation(n_nodes)
    b1 = int(ratios[0] * n_nodes)
    b2 = int((ratios[0] + ratios[1]) * n_nodes)
    return idx[:b1], idx[b1:b2], idx[b2:]


@dataclasses.dataclass
class NodeSplitResult:
    params: Any
    best_epoch: int
    best_val_loss: float
    test_loss: float
    test_time: float
    history: list


def fit_node_split(
    model,
    optimizer,
    params,
    adj,
    s0,
    i0,
    r0,
    beta: float,
    gamma: float,
    labels,  # [T, n, 3] float
    *,
    idx_train,
    idx_val,
    idx_test,
    epochs: int = 100,
    verbose: bool = True,
    log_every: int = 10,
) -> NodeSplitResult:
    """Train on the node split of one trial's trajectories."""
    # everything array-valued rides as a jit ARGUMENT — closed-over device
    # arrays become HLO constants (CLAUDE.md: a dense adjacency baked into
    # program text blew a remote compile with HTTP 413; as an argument it
    # compiles 5.4x faster). `trial` is one pytree so the call sites stay
    # readable.
    trial = {
        "labels": jnp.asarray(labels, jnp.float32),
        "s0": jnp.asarray(s0)[None],
        "i0": jnp.asarray(i0)[None],
        "r0": jnp.asarray(r0)[None],
        "beta": jnp.asarray([beta], jnp.float32),
        "gamma": jnp.asarray([gamma], jnp.float32),
        "idx_train": jnp.asarray(np.asarray(idx_train), jnp.int32),
        "idx_val": jnp.asarray(np.asarray(idx_val), jnp.int32),
        "idx_test": jnp.asarray(np.asarray(idx_test), jnp.int32),
    }
    opt_state = optimizer.init(params)

    def node_loss(pred, labels, idx):
        # mean |.| per channel over (t, selected nodes), averaged over S/I/R
        # (ode_nn.py:441-444)
        d = jnp.abs(pred[:, idx, :] - labels[:, idx, :])
        return d.mean(axis=(0, 1)).mean()

    def _forward(p, adj, t):
        return model.predict(p, adj, t["s0"], t["i0"], t["r0"],
                             t["beta"], t["gamma"])[:, 0]

    @jax.jit
    def step(params, opt_state, adj, t):
        # train and val come from the same pre-update forward pass
        # (ode_nn.py:426-464); test is evaluated separately AFTER the
        # optimizer step, as the reference calls test() post-step (:586-594).
        def loss_fn(p):
            pred = _forward(p, adj, t)
            train = node_loss(pred, t["labels"], t["idx_train"])
            val = node_loss(pred, t["labels"], t["idx_val"])
            return train, val

        (train, val), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, train, val

    @jax.jit
    def test_eval(params, adj, t):
        return node_loss(_forward(params, adj, t), t["labels"], t["idx_test"])

    best_val = float("inf")
    best_epoch, test_loss, test_time = -1, float("nan"), 0.0
    history = []
    for epoch in range(epochs):
        t0 = time.perf_counter()
        params, opt_state, train, val = step(params, opt_state, adj, trial)
        train, val = float(train), float(val)
        history.append((epoch, train, val))
        if val <= best_val:  # reference uses <= here (ode_nn.py:586)
            best_val = val
            best_epoch = epoch
            test_loss = float(test_eval(params, adj, trial))  # post-update
            test_time = time.perf_counter() - t0
        if verbose and (epoch % log_every == 0 or epoch == epochs - 1):
            print(f"Epoch: {epoch:03d}, Train Loss: {train:.5f}, Val Loss: {val:.5f}")
    return NodeSplitResult(
        params=params,
        best_epoch=best_epoch,
        best_val_loss=best_val,
        test_loss=test_loss,
        test_time=test_time,
        history=history,
    )
