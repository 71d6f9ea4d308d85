"""Budgeted adaptive Dormand-Prince 5(4) with dense output on a fixed grid.

Completes the torchdiffeq-parity solver set (the reference's dependency
supports adaptive dopri5 even though its models only use euler/rk4 —
``ode_nn_ngraph_sim.py:168``). Two XLA constraints shape the design:

1. Static control flow: a ``while_loop`` until convergence is neither
   compile-friendly nor reverse-differentiable. Instead ONE ``lax.scan``
   spends a fixed GLOBAL budget of ``total_steps`` embedded 5(4) attempts
   over the whole horizon — not a per-interval attempt loop (the round-2
   design burned 16 attempts on every output interval and cost 43x euler;
   smooth intervals now cost nothing because an accepted step strides
   across several of them).
2. Dense output by interpolation: grid values come from cubic-Hermite
   interpolation of the accepted step that covers each grid time
   (vectorized post-pass of one gather + axpys — no f-evals), so the step
   controller is free to take steps larger than the output spacing.

FSAL (first-same-as-last) reuse drops the cost to 6 f-evals per attempt.
A step rejected twice in a row is force-accepted (graceful accuracy
degradation instead of stalling the budget), and grid points past the
last accepted step extrapolate from it — both matter only when
``total_steps`` is set far too small for the requested tolerance.

Memory note: the scan emits (y, y_new, f, f_new) per attempt for the
interpolation pass — ~4*total_steps state copies. The adaptive solver is
an accuracy tool for stiff/beta-large regimes; the production training
configuration remains the fixed euler grid (RESULTS.md solver table).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Dormand-Prince 5(4) tableau
_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40)


def _axpy_many(y, ks, coeffs, dt):
    def upd(leaf, *kleaves):
        acc = leaf
        for c, kl in zip(coeffs, kleaves):
            if c != 0.0:
                acc = acc + dt * c * kl
        return acc

    return jax.tree_util.tree_map(upd, y, *ks)


def _dp_step_fsal(func, t, y, dt, args, f0):
    """One embedded 5(4) attempt reusing the FSAL derivative ``f0 = f(t, y)``.

    Returns (y5, err, f_last) where ``f_last = f(t+dt, y5)`` (stage 7) is
    the next attempt's ``f0`` on acceptance — 6 fresh f-evals per attempt.
    """
    ks = [f0]
    for ci, arow in zip(_C[1:], _A[1:]):
        yi = _axpy_many(y, ks, arow, dt)
        ks.append(func(t + ci * dt, yi, args))
    y5 = _axpy_many(y, ks, _B5, dt)
    y4 = _axpy_many(y, ks, _B4, dt)
    err = jax.tree_util.tree_map(lambda a, b: a - b, y5, y4)
    return y5, err, ks[6]


def _error_norm(err, y, y_new, rtol, atol):
    def leaf_norm(e, a, b):
        scale = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        return jnp.max(jnp.abs(e) / scale)

    norms = jax.tree_util.tree_map(leaf_norm, err, y, y_new)
    return jnp.max(jnp.stack(jax.tree_util.tree_leaves(norms)))


def _hermite(theta, dt, y0, y1, f0, f1):
    """Cubic Hermite dense output at fraction ``theta`` of an accepted step.

    ``theta`` is a [T] vector; leaves broadcast over trailing dims."""
    t2 = theta * theta
    t3 = t2 * theta
    h00, h10 = 2 * t3 - 3 * t2 + 1, t3 - 2 * t2 + theta
    h01, h11 = -2 * t3 + 3 * t2, t3 - t2

    def leaf(a, b, fa, fb):
        sh = (theta.shape[0],) + (1,) * (a.ndim - 1)
        r = lambda v: v.reshape(sh)
        hdt = r(h10 * dt), r(h11 * dt)
        return r(h00) * a + hdt[0] * fa + r(h01) * b + hdt[1] * fb

    return jax.tree_util.tree_map(leaf, y0, y1, f0, f1)


@partial(jax.jit, static_argnames=("func", "total_steps", "max_stride"))
def odeint_grid_adaptive(
    func,
    y0,
    ts,
    args=None,
    *,
    rtol: float = 1e-5,
    atol: float = 1e-6,
    total_steps: int | None = None,
    max_stride: int = 8,
):
    """Budgeted adaptive dopri5 with outputs at every grid point ``ts``.

    Returns the dense trajectory [T, ...] with ``ys[0] == y0``. The solve
    spends at most ``total_steps`` embedded attempts over the WHOLE horizon
    (default ``2 * (len(ts) - 1)``); once the controller reaches the end
    the remaining attempts are masked no-ops, so shapes and trip counts are
    static and ``jax.grad`` works through the solve. ``max_stride`` caps a
    single step at that many grid intervals (bounds extrapolation error in
    the dense output).
    """
    # The embedded error estimate y5-y4 is ~1e-6-scale truncation error; at
    # the TPU's default bf16 matmul precision the f-evals carry ~1e-2
    # relative noise, which swamps the estimate — every step rejects, the
    # budget starves, and the dense output extrapolates garbage (measured:
    # forward diverged 1.0 from euler on TPU while agreeing 1e-3 on CPU).
    # An adaptive controller REQUIRES trustworthy error estimates, so the
    # whole solve traces at f32 matmul precision (3-pass bf16 on the MXU,
    # ~3x matmul cost inside this solver only; no-op on CPU).
    with jax.default_matmul_precision("float32"):
        return _adaptive_impl(func, y0, ts, args, rtol, atol, total_steps,
                              max_stride)


def _adaptive_impl(func, y0, ts, args, rtol, atol, total_steps, max_stride):
    ts = jnp.asarray(ts, jnp.float32)
    T = ts.shape[0]
    if total_steps is None:
        total_steps = 2 * (T - 1)
    # Force-accept needs rejects >= 2, so with total_steps <= 2 every
    # attempt can reject and the Hermite fallback would gather attempt 0's
    # REJECTED endpoints (argmax of all-zero accept mask is 0) — the whole
    # trajectory would silently extrapolate from an unaccepted trial step.
    # Three attempts guarantee at least one acceptance.
    total_steps = max(int(total_steps), 3)
    dt0 = ts[1] - ts[0]
    t_end = ts[-1]
    f0 = func(ts[0], y0, args)

    # done-threshold must sit ABOVE f32 ulp at the horizon (ulp(20.0) is
    # ~1.9e-6): after the last full step t typically misses t_end by ~1 ulp,
    # and a below-ulp threshold lets the controller burn the remaining
    # budget on micro-steps where t + dt_try == t makes zero progress. A
    # sub-1e-6-of-dt0 remainder is far below the dense-output interpolation
    # error, so treating it as done is lossless.
    done_tol = jnp.maximum(
        4.0 * jnp.finfo(jnp.float32).eps * jnp.abs(t_end), 1e-6 * dt0
    )

    def attempt(carry, _):
        t, y, f, dt_next, rejects = carry
        remaining = t_end - t
        done = remaining <= done_tol
        dt_try = jnp.minimum(jnp.minimum(dt_next, remaining), max_stride * dt0)
        dt_try = jnp.where(done, dt0, dt_try)  # keep finite for the no-op step
        y_new, err, f_new = _dp_step_fsal(func, t, y, dt_try, args, f)
        ratio = _error_norm(err, y, y_new, rtol, atol)
        # force-accept after 2 consecutive rejections: the budget always
        # makes progress (accuracy degrades gracefully, never stalls)
        accept = jnp.logical_and(
            jnp.logical_not(done),
            jnp.logical_or(ratio <= 1.0, rejects >= 2),
        )
        factor = jnp.clip(0.9 * (ratio + 1e-16) ** (-0.2), 0.2, 5.0)
        dt_upd = jnp.where(done, dt_next, dt_try * factor)
        rejects = jnp.where(accept | done, 0, rejects + 1)
        sel = lambda a, b: jax.tree_util.tree_map(
            lambda u, v: jnp.where(accept, v, u), a, b
        )
        out = {
            "t": t, "dt": dt_try, "accept": accept,
            "y": y, "y_new": y_new, "f": f, "f_new": f_new,
        }
        t = jnp.where(accept, t + dt_try, t)
        y = sel(y, y_new)
        f = sel(f, f_new)
        return (t, y, f, dt_upd, rejects), out

    _, steps = jax.lax.scan(
        attempt, (ts[0], y0, f0, dt0, jnp.int32(0)), None, length=total_steps
    )

    # Dense output: each interior grid time is covered by exactly one
    # accepted step (t_start <= t_q < t_start + dt); gather that step's
    # endpoints + derivatives and Hermite-interpolate, vectorized over the
    # grid. Scalar index math is [S, T-1] — trivial next to one f-eval.
    s_idx = jnp.arange(total_steps)
    t_q = jnp.minimum(ts[1:], t_end - 1e-6)  # final point sits inside the last step
    starts = steps["t"][:, None]
    ends = (steps["t"] + steps["dt"])[:, None]
    acc = steps["accept"][:, None]
    ind = acc & (starts <= t_q[None, :]) & (t_q[None, :] < ends)
    covered = ind.any(0)
    i_cov = (ind * s_idx[:, None]).sum(0)
    # fallback for grid points past the last accepted step (budget exhausted
    # before t_end): extrapolate from the last accepted step
    last_acc = jnp.argmax(s_idx * steps["accept"])
    i_j = jnp.where(covered, i_cov, last_acc)

    take = lambda tree: jax.tree_util.tree_map(lambda a: a[i_j], tree)
    # clamp extrapolation (uncovered tail points under a starved budget) so
    # the cubic cannot blow up; covered points have theta in [0, 1)
    theta = jnp.clip(
        (ts[1:] - steps["t"][i_j]) / steps["dt"][i_j], 0.0, 2.0
    )
    interp = _hermite(
        theta, steps["dt"][i_j],
        take(steps["y"]), take(steps["y_new"]),
        take(steps["f"]), take(steps["f_new"]),
    )
    return jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a[None], b], axis=0), y0, interp
    )
