"""Continuous (backsolve) adjoint for the fixed-grid solvers.

Memory-parity equivalent of ``torchdiffeq.odeint_adjoint`` (imported by the
reference at ``ode_nn_ngraph_sim.py:16``): the reverse pass re-integrates the
state backwards in time alongside the adjoint variables, so no forward
trajectory is stored. Exactness caveat (documented in SURVEY.md §7 "hard
parts" #3): reconstructing y by reverse integration accumulates solver error;
the default 'checkpoint' adjoint in :mod:`solvers` is bit-exact instead.

Only *differentiated* ``args`` leaves ride the reverse scan. By default that
is every inexact-float leaf; integer leaves (COO/ELL/pallas index arrays)
get ``float0`` cotangents and are never carried — differentiating an index
array is meaningless and ``tree_map(jnp.negative, ...)`` over its ``float0``
cotangent used to crash. Callers can additionally exclude float leaves they
treat as constants via ``diff_mask`` (GNODE excludes the adjacency: a dense
[n, n] weight matrix in the augmented carry costs O(n^2) memory per reverse
step and negates the adjoint's O(1)-in-T selling point; excluded leaves get
zero cotangents).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gn_ode_sir_tpu.odeint.solvers import step_fn


def _leaf_flags(args, diff_mask):
    """Per-leaf True = differentiate. ``diff_mask`` may be a prefix pytree of
    bools over ``args`` (e.g. ``(True, True, True, False)`` for a 4-tuple);
    integer/bool leaves are always excluded regardless of the mask."""
    if diff_mask is None:
        expanded = jax.tree_util.tree_map(lambda _: True, args)
    else:
        expanded = jax.tree_util.tree_map(
            lambda m, sub: jax.tree_util.tree_map(lambda _: bool(m), sub),
            diff_mask, args,
            is_leaf=lambda x: isinstance(x, bool),
        )
    leaves = jax.tree_util.tree_leaves(args)
    mask_leaves = jax.tree_util.tree_leaves(expanded)
    return tuple(
        bool(m) and jnp.issubdtype(jnp.result_type(leaf), jnp.inexact)
        for leaf, m in zip(leaves, mask_leaves)
    )


def _split(args, flags):
    leaves, treedef = jax.tree_util.tree_flatten(args)
    diff = tuple(l for l, f in zip(leaves, flags) if f)
    static = tuple(l for l, f in zip(leaves, flags) if not f)
    return diff, static, treedef


def _merge(diff, static, treedef, flags):
    diff_it, static_it = iter(diff), iter(static)
    leaves = [next(diff_it) if f else next(static_it) for f in flags]
    return jax.tree_util.tree_unflatten(treedef, leaves)


@partial(jax.custom_vjp, nondiff_argnums=(0, 5, 6, 7))
def _odeint_backsolve(func, y0, ts, diff_leaves, static_leaves,
                      treedef, flags, method):
    return _forward(func, y0, ts, diff_leaves, static_leaves,
                    treedef, flags, method)


def _forward(func, y0, ts, diff_leaves, static_leaves, treedef, flags, method):
    step = step_fn(method)
    dt = ts[1] - ts[0]
    args = _merge(diff_leaves, static_leaves, treedef, flags)

    def body(y, t):
        y_next = step(func, t, y, dt, args)
        return y_next, y_next

    _, ys = jax.lax.scan(body, y0, ts[:-1])
    return jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a[None], b], axis=0), y0, ys
    )


def _fwd(func, y0, ts, diff_leaves, static_leaves, treedef, flags, method):
    ys = _forward(func, y0, ts, diff_leaves, static_leaves,
                  treedef, flags, method)
    y_final = jax.tree_util.tree_map(lambda a: a[-1], ys)
    return ys, (y_final, ts, diff_leaves, static_leaves)


def _zero_cotangent(leaf):
    """Zero cotangent with the dtype JAX expects: float0 for non-inexact."""
    if jnp.issubdtype(jnp.result_type(leaf), jnp.inexact):
        return jnp.zeros_like(leaf)
    return np.zeros(jnp.shape(leaf), dtype=jax.dtypes.float0)


def _bwd(func, treedef, flags, method, residuals, g):
    y_final, ts, diff_leaves, static_leaves = residuals
    step = step_fn(method)

    def aug_dynamics(t, aug, args_):
        # args_ carries the full merged args through step_fn; only the
        # diff leaves are differentiated (static leaves stay vjp constants)
        y, a, _ = aug
        dl, sl, _ = _split(args_, flags)
        f_val, vjp = jax.vjp(
            lambda y_, dl_: func(t, y_, _merge(dl_, sl, treedef, flags)),
            y, dl,
        )
        v_y, v_diff = vjp(a)
        neg = jax.tree_util.tree_map(jnp.negative, (v_y, v_diff))
        return (f_val, *neg)

    args = _merge(diff_leaves, static_leaves, treedef, flags)
    a0 = jax.tree_util.tree_map(jnp.zeros_like, y_final)
    a_diff0 = jax.tree_util.tree_map(jnp.zeros_like, diff_leaves)
    carry0 = (y_final, a0, a_diff0)

    # Walk grid points from t_{T-1} down to t_1: absorb the cotangent at t_i,
    # then integrate the augmented system backwards one interval.
    t_hi = ts[1:][::-1]
    t_lo = ts[:-1][::-1]
    g_hi = jax.tree_util.tree_map(lambda x: x[1:][::-1], g)

    def body(carry, xs):
        y, a, a_diff = carry
        t1, t0, gi = xs
        a = jax.tree_util.tree_map(jnp.add, a, gi)
        y, a, a_diff = step(aug_dynamics, t1, (y, a, a_diff), t0 - t1, args)
        return (y, a, a_diff), None

    (y0_rec, a, a_diff), _ = jax.lax.scan(body, carry0, (t_hi, t_lo, g_hi))
    del y0_rec
    g0 = jax.tree_util.tree_map(lambda x: x[0], g)
    grad_y0 = jax.tree_util.tree_map(jnp.add, a, g0)
    grad_ts = jnp.zeros_like(ts)  # time-grid gradients not supported
    grad_static = tuple(_zero_cotangent(l) for l in static_leaves)
    return grad_y0, grad_ts, a_diff, grad_static


_odeint_backsolve.defvjp(_fwd, _bwd)


def odeint_grid_backsolve(func, y0, ts, args=None, *, method: str = "euler",
                          diff_mask=None):
    """Dense-grid integration whose VJP is the continuous backsolve adjoint.

    ``diff_mask``: optional prefix pytree of bools over ``args`` marking
    which subtrees to differentiate (default: all float leaves). Excluded
    and integer leaves receive zero/float0 cotangents and stay out of the
    reverse-scan carry.
    """
    flags = _leaf_flags(args, diff_mask)
    diff_leaves, static_leaves, treedef = _split(args, flags)
    return _odeint_backsolve(func, y0, ts, diff_leaves, static_leaves,
                             treedef, flags, method)
