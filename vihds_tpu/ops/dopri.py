"""Adaptive embedded Runge-Kutta integrators (Dormand-Prince 5(4) and
DOP853 8(5,3)) under ``jit``.

Capability parity with torchdiffeq's ``dopri5`` / ``dopri8`` adaptive solvers
(selected at reference vihds/ode.py:80-81), TPU-re-designed: each observation
interval [t_i, t_{i+1}] is integrated by a ``lax.while_loop`` with a PI step
controller; all shapes are static, the step count is bounded, and the whole
trajectory is one ``lax.scan`` over intervals.  Error norms are RMS over the
full batched state, so the step sequence is shared across the batch — the
usual choice for batched adaptive integration on SIMD hardware.

DOP853 coefficients come from scipy (scipy.integrate._ivp.dop853_coefficients)
with scipy's 5th/3rd-order error combination.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# Dormand-Prince 5(4) tableau (classic DOPRI5)
# ---------------------------------------------------------------------------
_DP5_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP5_A = np.zeros((7, 7))
_DP5_A[1, 0] = 1 / 5
_DP5_A[2, :2] = [3 / 40, 9 / 40]
_DP5_A[3, :3] = [44 / 45, -56 / 15, 32 / 9]
_DP5_A[4, :4] = [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]
_DP5_A[5, :5] = [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]
_DP5_A[6, :6] = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]
_DP5_B = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_DP5_BHAT = np.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)
_DP5_E = _DP5_B - _DP5_BHAT  # error weights


def _rms_norm(x):
    return jnp.sqrt(jnp.mean(x ** 2))


def _stages(rhs, t, y, h, A, C, n_stages, f0=None):
    """Evaluate the RK stages; returns k stacked on axis 0."""

    def one_stage(i, ks):
        ti = t + C[i] * h
        yi = y + h * jnp.tensordot(A[i, :n_stages], ks, axes=1)
        return ks.at[i].set(rhs(ti, yi))

    ks = jnp.zeros((n_stages,) + y.shape, y.dtype)
    k0 = rhs(t, y) if f0 is None else f0
    ks = ks.at[0].set(k0)
    # unrolled python loop — n_stages is static and small
    for i in range(1, n_stages):
        ks = one_stage(i, ks)
    return ks


def _dopri5_step(rhs, t, y, h):
    ks = _stages(rhs, t, y, h, _DP5_A, _DP5_C, 7)
    y_new = y + h * jnp.tensordot(_DP5_B, ks, axes=1)
    err = h * jnp.tensordot(_DP5_E, ks, axes=1)
    return y_new, err, None


def _dop853_tables():
    from scipy.integrate._ivp import dop853_coefficients as d

    n = d.N_STAGES  # 12
    A = d.A[: n + 1, : n + 1].copy()
    C = d.C[: n + 1].copy()
    B = np.zeros(n + 1)
    B[:n] = d.B
    # scipy builds K with n+1 rows: the last row is f(t+h, y_new) used for
    # the error estimate and FSAL.
    return A, C, B, d.E3.copy(), d.E5.copy(), n + 1


_D853 = _dop853_tables()


def _dop853_step(rhs, t, y, h):
    A, C, B, E3, E5, n_rows = _D853
    ks = jnp.zeros((n_rows,) + y.shape, y.dtype)
    ks = ks.at[0].set(rhs(t, y))
    for i in range(1, n_rows - 1):
        ti = t + C[i] * h
        yi = y + h * jnp.tensordot(A[i, :n_rows], ks, axes=1)
        ks = ks.at[i].set(rhs(ti, yi))
    y_new = y + h * jnp.tensordot(B, ks, axes=1)
    ks = ks.at[n_rows - 1].set(rhs(t + h, y_new))
    err5 = h * jnp.tensordot(E5, ks, axes=1)
    err3 = h * jnp.tensordot(E3, ks, axes=1)
    # scipy's combined 5th/3rd-order error norm
    denom = jnp.hypot(jnp.abs(err5), 0.1 * jnp.abs(err3))
    correction = jnp.where(denom > 0, jnp.abs(err5) / jnp.maximum(denom, 1e-30), 1.0)
    err = err5 * correction
    return y_new, err, None


# ---------------------------------------------------------------------------
# Bogacki-Shampine 3(2) ("bosh3") and Heun-Euler 2(1) ("adaptive_heun") —
# the remaining adaptive embedded-RK methods torchdiffeq's passthrough
# accepts on the reference's solver string (vihds/ode.py:80-81).  Same
# machinery, different tableaus.
# ---------------------------------------------------------------------------
_BS3_C = np.array([0.0, 1 / 2, 3 / 4, 1.0])
_BS3_A = np.zeros((4, 4))
_BS3_A[1, 0] = 1 / 2
_BS3_A[2, :2] = [0.0, 3 / 4]
_BS3_A[3, :3] = [2 / 9, 1 / 3, 4 / 9]
_BS3_B = np.array([2 / 9, 1 / 3, 4 / 9, 0.0])
_BS3_E = _BS3_B - np.array([7 / 24, 1 / 4, 1 / 3, 1 / 8])

_HE2_C = np.array([0.0, 1.0])
_HE2_A = np.zeros((2, 2))
_HE2_A[1, 0] = 1.0
_HE2_B = np.array([1 / 2, 1 / 2])
_HE2_E = _HE2_B - np.array([1.0, 0.0])


def _erk_step(A, C, B, E, n_stages):
    def step(rhs, t, y, h):
        ks = _stages(rhs, t, y, h, A, C, n_stages)
        y_new = y + h * jnp.tensordot(B, ks, axes=1)
        err = h * jnp.tensordot(E, ks, axes=1)
        return y_new, err, None

    return step


_STEPPERS = {
    "dopri5": (_dopri5_step, 5),
    "dopri8": (_dop853_step, 8),
    "bosh3": (_erk_step(_BS3_A, _BS3_C, _BS3_B, _BS3_E, 4), 3),
    "adaptive_heun": (_erk_step(_HE2_A, _HE2_C, _HE2_B, _HE2_E, 2), 2),
}


def integrate_adaptive(
    rhs, y0, times, method="dopri5", rtol=1e-6, atol=1e-8, max_steps_per_interval=None
):
    """Integrate to each grid time exactly; returns [T, *y0.shape]."""
    stepper, order = _STEPPERS[method]
    inv_order = 1.0 / order
    if max_steps_per_interval is None:
        # the while_loop exits as soon as the interval is done, so the bound
        # only needs to be generous enough for the method's order at the
        # default tolerances (an order-2 method needs ~tol^(-1/2) more steps
        # than an order-5 one; a hit cap would silently truncate the solve)
        max_steps_per_interval = {2: 2048, 3: 512}.get(order, 64)
    safety, min_factor, max_factor = 0.9, 0.2, 10.0

    def error_norm(err, y, y_new):
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
        return _rms_norm(err / scale)

    def advance_interval(carry, t_pair):
        y, dt_guess = carry
        t_start, t_end = t_pair
        span = t_end - t_start

        def cond(state):
            t, y, dt, steps = state
            return jnp.logical_and(t < t_end - 1e-12, steps < max_steps_per_interval)

        def body(state):
            t, y, dt, steps = state
            h = jnp.minimum(dt, t_end - t)
            y_new, err, _ = stepper(rhs, t, y, h)
            en = error_norm(err, y, y_new)
            accept = en <= 1.0
            factor = jnp.clip(
                safety * jnp.power(jnp.maximum(en, 1e-10), -inv_order), min_factor, max_factor
            )
            dt_next = jnp.maximum(h * factor, span * 1e-4)
            t = jnp.where(accept, t + h, t)
            y = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, b, a), y, y_new)
            return (t, y, dt_next, steps + 1)

        t_fin, y_fin, dt_fin, _ = lax.while_loop(
            cond, body, (t_start, y, jnp.minimum(dt_guess, span), jnp.asarray(0))
        )
        return (y_fin, dt_fin), y_fin

    dt0 = (times[1] - times[0]) * 0.5
    (_, _), ys = lax.scan(advance_interval, (y0, dt0), (times[:-1], times[1:]))
    return jnp.concatenate([y0[None], ys], axis=0)
