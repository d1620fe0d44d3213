"""Differentiable ODE integrators as ``lax.scan`` programs.

Capability parity with the reference solver set (reference vihds/solvers.py
modified-Euler; torchdiffeq odeint fixed-grid euler/midpoint/rk4 and adaptive
dopri5/dopri8, selected at vihds/ode.py:75-82), rebuilt TPU-first:

  * fixed-grid methods are a single ``lax.scan`` over the time grid — the
    whole trajectory compiles into one fused XLA loop, no Python stepping;
  * ``checkpoint=True`` remats each step so the backward pass re-computes RHS
    evaluations instead of storing them (the scan output [T, ...] is still
    kept — that's the data the model observes);
  * adaptive Dormand-Prince (dopri5/dopri8) runs a ``lax.while_loop`` with a
    PI step controller entirely on device, writing dense-output interpolations
    onto the requested grid (see vihds_tpu/ops/dopri.py).

All methods integrate y'[...] = rhs(t, y) with y of any shape; time enters as
a scalar.  Output is [T, *y.shape] with the initial state at index 0, matching
the reference solution layout before its permute (vihds/ode.py:82).
"""

import jax
import jax.numpy as jnp
from jax import lax


def _step_modeuler(rhs, y, t1, t2, h):
    """Modified-Euler / Heun (parity: vihds/solvers.py:9-25)."""
    f1 = rhs(t1, y)
    f2 = rhs(t2, y + h * f1)
    return y + 0.5 * h * (f1 + f2)


def _step_midpoint(rhs, y, t1, t2, h):
    """Explicit midpoint, matching torchdiffeq's fixed-grid 'midpoint'."""
    f1 = rhs(t1, y)
    f2 = rhs(t1 + 0.5 * h, y + 0.5 * h * f1)
    return y + h * f2


def _step_euler(rhs, y, t1, t2, h):
    return y + h * rhs(t1, y)


def _step_rk4(rhs, y, t1, t2, h):
    """Classic RK4 (torchdiffeq 'rk4' uses 3/8 variant; classic is the same
    order and within the cross-solver consistency budget)."""
    k1 = rhs(t1, y)
    k2 = rhs(t1 + 0.5 * h, y + 0.5 * h * k1)
    k3 = rhs(t1 + 0.5 * h, y + 0.5 * h * k2)
    k4 = rhs(t2, y + h * k3)
    return y + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


FIXED_GRID_SOLVERS = {
    "modeuler": _step_modeuler,
    "modeulerwhile": _step_modeuler,  # reference's while-loop variant is the
    # same method (vihds/solvers.py:20-41)
    "midpoint": _step_midpoint,
    "euler": _step_euler,
    "rk4": _step_rk4,
}

ADAPTIVE_SOLVERS = ("dopri5", "dopri8", "bosh3", "adaptive_heun")


def integrate_fixed(rhs, y0, times, method="midpoint", checkpoint=False, unroll=4):
    """Scan the chosen one-step method over the (possibly non-uniform) grid.

    ``unroll`` trades a little compile time for fused multi-step loop bodies —
    at these state sizes the scan's per-iteration overhead is comparable to
    the step's compute, so fusing several steps per iteration is a real win.
    """
    step_fn = FIXED_GRID_SOLVERS[method]

    def step(y, ts):
        t1, t2 = ts
        y_new = step_fn(rhs, y, t1, t2, t2 - t1)
        return y_new, y_new

    if checkpoint:
        step = jax.checkpoint(step)
    _, ys = lax.scan(step, y0, (times[:-1], times[1:]), unroll=unroll)
    return jnp.concatenate([y0[None], ys], axis=0)


def integrate_fold(rhs, y0, times, fold, xs, method="midpoint", checkpoint=False, unroll=4):
    """Integrate WITHOUT materialising the trajectory: after every step the
    per-time contribution ``fold(y_t, xs_t)`` is summed into the scan carry
    (the t=0 term folds outside the scan).  ``xs`` is a pytree of per-time
    arrays with leading axis T, streamed through the scan as inputs — no
    dynamic indexing.  Returns ``(y_final, sum_t fold(y_t, xs_t))``.

    This is the training-objective formulation of the solve: the IWAE
    log-likelihood only needs ``sum_t log p(x_t | y_t)``, so accumulating it
    online removes the [T, B, K, S] trajectory buffer entirely — both the
    forward's dynamic-update-slice writes (~20% of device step time,
    reports/trainstep_profile/REPORT.md) and the backward's stacked
    cotangent stream.  Fixed-grid methods only.
    """
    step_fn = FIXED_GRID_SOLVERS[method]
    xs0 = jax.tree_util.tree_map(lambda a: a[0], xs)
    xs_rest = jax.tree_util.tree_map(lambda a: a[1:], xs)
    acc0 = fold(y0, xs0)

    def step(carry, inp):
        y, acc = carry
        t1, t2, x_t = inp
        y_new = step_fn(rhs, y, t1, t2, t2 - t1)
        return (y_new, acc + fold(y_new, x_t)), None

    if checkpoint:
        step = jax.checkpoint(step)
    (y_final, acc), _ = lax.scan(
        step, (y0, acc0), (times[:-1], times[1:], xs_rest), unroll=unroll
    )
    return y_final, acc


def integrate(rhs, y0, times, method="midpoint", checkpoint=False, adjoint=False, **opts):
    """Integrate and return [T, *y0.shape].

    ``adjoint=True`` differentiates with O(1) trajectory memory via a custom
    VJP that integrates the adjoint ODE backwards (capability parity with
    torchdiffeq.odeint_adjoint, reference vihds/ode.py:80).
    """
    if method in ADAPTIVE_SOLVERS:
        # Adaptive solvers always ride the continuous-adjoint custom VJP:
        # lax.while_loop is not reverse-differentiable, so the adjoint
        # backward (fixed RK4 substeps re-anchored at the stored grid states)
        # is the only — and O(1)-memory — gradient path.  Forward-only use is
        # unchanged (the custom_vjp primal IS the adaptive integrator).
        from vihds_tpu.ops.adjoint import integrate_adjoint

        return integrate_adjoint(rhs, y0, times, method=method, **opts)
    if method not in FIXED_GRID_SOLVERS:
        raise ValueError(
            "Unknown solver %r; supported: %s (fixed-grid) and %s (adaptive). "
            "torchdiffeq's Adams family and tsit5 are deliberately excluded — "
            "see PARITY.md's solver row." % (
                method, sorted(FIXED_GRID_SOLVERS), list(ADAPTIVE_SOLVERS),
            )
        )
    if adjoint:
        from vihds_tpu.ops.adjoint import integrate_adjoint

        return integrate_adjoint(rhs, y0, times, method=method)
    return integrate_fixed(rhs, y0, times, method=method, checkpoint=checkpoint)
