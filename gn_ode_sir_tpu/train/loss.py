"""L1 (MAE) loss on S/I/R probability trajectories.

The reference criterion is ``nn.L1Loss`` over predictions at t >= 1
(``ode_nn_ngraph_sim.py:234``: labels sliced ``[:, 1:, :]``), item-weighted
when aggregating across batches (``:248-249``). Here the same quantity with
optional per-trial weights (for padded batches) and per-node masks (for
padded multi-graph nodes).
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_l1(pred, target, weight=None, eps: float = 1e-12):
    """Mean |pred - target| where weight broadcasts over trailing axes."""
    err = jnp.abs(pred - target)
    if weight is None:
        return err.mean()
    w = jnp.broadcast_to(weight, err.shape)
    return (err * w).sum() / (w.sum() + eps)


def l1_sir_loss_sums(pred_tbnc, labels_btnc, trial_weight=None, node_mask=None):
    """Weighted |error| numerator and weight-sum denominator, unreduced.

    Same quantity as :func:`l1_sir_loss` split into (numerator, denominator)
    so distributed callers can ``psum`` each separately and divide — the
    global item-weighted mean is NOT the mean of per-shard means when trial
    weights/padding are uneven across shards.
    """
    pred = jnp.transpose(pred_tbnc, (1, 0, 2, 3))[:, 1:]
    target = labels_btnc[:, 1:]
    err = jnp.abs(pred - target)
    weight = None
    if trial_weight is not None:
        weight = trial_weight[:, None, None, None]
    if node_mask is not None:
        nm = node_mask[:, None, :, None]
        weight = nm if weight is None else weight * nm
    if weight is None:
        return err.sum(), jnp.asarray(err.size, err.dtype)
    w = jnp.broadcast_to(weight, err.shape)
    return (err * w).sum(), w.sum()


def l1_sir_loss(pred_tbnc, labels_btnc, trial_weight=None, node_mask=None):
    """MAE over t >= 1.

    Args:
      pred_tbnc: [T, B, n, 3] model probabilities (time-major model output).
      labels_btnc: [B, T, n, 3] MC labels (trial-major, the dataset layout).
      trial_weight: optional [B] (0 for padding trials in a padded batch).
      node_mask: optional [B, n] (0 for padding nodes in multi-graph batches).
    """
    num, den = l1_sir_loss_sums(pred_tbnc, labels_btnc,
                                trial_weight=trial_weight,
                                node_mask=node_mask)
    if trial_weight is None and node_mask is None:
        return num / den  # exact mean — no guard needed, size > 0
    return num / (den + 1e-12)  # masked_l1's zero-weight guard
