"""Continuous (backsolve) adjoint for the fixed-grid solvers.

Memory-parity equivalent of ``torchdiffeq.odeint_adjoint`` (imported by the
reference at ``ode_nn_ngraph_sim.py:16``): the reverse pass re-integrates the
state backwards in time alongside the adjoint variables, so no forward
trajectory is stored. Exactness caveat (documented in SURVEY.md §7 "hard
parts" #3): reconstructing y by reverse integration accumulates solver error;
the default 'checkpoint' adjoint in :mod:`solvers` is bit-exact instead.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gn_ode_sir_tpu.odeint.solvers import step_fn


@partial(jax.custom_vjp, nondiff_argnums=(0, 4))
def _odeint_backsolve(func, y0, ts, args, method):
    return _forward(func, y0, ts, args, method)


def _forward(func, y0, ts, args, method):
    step = step_fn(method)
    dt = ts[1] - ts[0]

    def body(y, t):
        y_next = step(func, t, y, dt, args)
        return y_next, y_next

    _, ys = jax.lax.scan(body, y0, ts[:-1])
    return jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a[None], b], axis=0), y0, ys
    )


def _fwd(func, y0, ts, args, method):
    ys = _forward(func, y0, ts, args, method)
    y_final = jax.tree_util.tree_map(lambda a: a[-1], ys)
    return ys, (y_final, ts, args)


def _bwd(func, method, residuals, g):
    y_final, ts, args = residuals
    step = step_fn(method)

    def aug_dynamics(t, aug, args_):
        y, a, _ = aug
        f_val, vjp = jax.vjp(lambda y_, args__: func(t, y_, args__), y, args_)
        v_y, v_args = vjp(a)
        neg = jax.tree_util.tree_map(jnp.negative, (v_y, v_args))
        return (f_val, *neg)

    a0 = jax.tree_util.tree_map(jnp.zeros_like, y_final)
    a_args0 = jax.tree_util.tree_map(jnp.zeros_like, args)
    carry0 = (y_final, a0, a_args0)

    # Walk grid points from t_{T-1} down to t_1: absorb the cotangent at t_i,
    # then integrate the augmented system backwards one interval.
    t_hi = ts[1:][::-1]
    t_lo = ts[:-1][::-1]
    g_hi = jax.tree_util.tree_map(lambda x: x[1:][::-1], g)

    def body(carry, xs):
        y, a, a_args = carry
        t1, t0, gi = xs
        a = jax.tree_util.tree_map(jnp.add, a, gi)
        y, a, a_args = step(aug_dynamics, t1, (y, a, a_args), t0 - t1, args)
        return (y, a, a_args), None

    (y0_rec, a, a_args), _ = jax.lax.scan(body, carry0, (t_hi, t_lo, g_hi))
    del y0_rec
    g0 = jax.tree_util.tree_map(lambda x: x[0], g)
    grad_y0 = jax.tree_util.tree_map(jnp.add, a, g0)
    grad_ts = jnp.zeros_like(ts)  # time-grid gradients not supported
    return grad_y0, grad_ts, a_args


_odeint_backsolve.defvjp(_fwd, _bwd)


def odeint_grid_backsolve(func, y0, ts, args=None, *, method: str = "euler"):
    """Dense-grid integration whose VJP is the continuous backsolve adjoint."""
    return _odeint_backsolve(func, y0, ts, args, method)
