"""Pallas TPU kernel: fused ODE integration for the black-box family.

Unlike the mechanistic kernels (vihds_tpu/ops/pallas_ode.py — per-row
constants, pure VPU), the black-box RHS (reference models/dr_blackbox.py:
NeuralStates + NeuralPrecisions with hidden layers) is built from SHARED
weight matrices applied to every sample row:

    aug = [state, constants_row]                 # per row
    h   = relu(W_h^T aug)                        # [n_hidden, block] matmul
    dx  = sigmoid(W_p^T h) - sigmoid(W_d^T h) x
    pin = [t, state, constants_row]
    hp  = relu(Wp_h^T pin)
    dv  = sigmoid(Wp_p^T hp) - sigmoid(Wp_d^T hp) v

so each solver step is a handful of small matmuls over the [feature,
block] column layout — an MXU workload with the weights VMEM-resident for
the whole time loop.  The per-row constants (latents z/x/y + treatments +
device one-hot) ride a packed [NC, block] tile exactly like the
mechanistic kernels.

Differentiable: reverse mode rides an in-kernel backward sweep re-tracing
each step's VJP against the VMEM-resident trajectory.  Weight cotangents
are accumulated per grid cell into a [n_cells, ...] output and summed
host-side; per-row constant and y0 cotangents ride the usual blocked
outputs.

Covered configuration = the shipped specs/dr_blackbox_icml.yaml shape:
NeuralStates with one hidden relu layer and NeuralPrecisions(n_hidden>=1,
relu, non-inverse, 4 outputs).  Other shapes fall back to the XLA scan.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vihds_tpu.ops.pallas_ode import _one_step

N_PREC = 4
# fixed order of the weight operands (each [n_in, n_out] / [n_out], the
# vihds_tpu.nn.layers storage convention)
WEIGHT_LEAVES = (
    ("states", "hidden", "w"),
    ("states", "hidden", "b"),
    ("states", "prod", "w"),
    ("states", "prod", "b"),
    ("states", "degr", "w"),
    ("states", "degr", "b"),
    ("precisions", "hidden", "w"),
    ("precisions", "hidden", "b"),
    ("precisions", "prod", "w"),
    ("precisions", "prod", "b"),
    ("precisions", "degr", "w"),
    ("precisions", "degr", "b"),
)


def _affine_cols(w, b, x):
    """[n_in, n_out] weights applied to [n_in, block] columns -> [n_out,
    block]; ``b`` arrives pre-shaped [n_out, 1] (biases ride the kernel as
    2-D VMEM operands, same reason times do)."""
    return jax.lax.dot_general(w, x, (((0,), (0,)), ((), ()))) + b


def _bb_rhs_cols(wv, consts, n_states, t, y):
    """Black-box RHS on [S_tot, block] columns (S_tot = n_states + 4).
    Same math as models/dr_blackbox.py make_rhs: NeuralStates over
    [state, constants] and NeuralPrecisions over [t, state, constants]."""
    (sh_w, sh_b, sp_w, sp_b, sd_w, sd_b,
     ph_w, ph_b, pp_w, pp_b, pd_w, pd_b) = wv
    x = y[:n_states, :]
    aug = jnp.concatenate([x, consts], axis=0)
    h = jnp.maximum(_affine_cols(sh_w, sh_b, aug), 0.0)
    dx = jax.nn.sigmoid(_affine_cols(sp_w, sp_b, h)) - jax.nn.sigmoid(
        _affine_cols(sd_w, sd_b, h)
    ) * x
    tv = jnp.full((1, y.shape[1]), t, y.dtype)
    pin = jnp.concatenate([tv, x, consts], axis=0)
    hp = jnp.maximum(_affine_cols(ph_w, ph_b, pin), 0.0)
    dv = jax.nn.sigmoid(_affine_cols(pp_w, pp_b, hp)) - jax.nn.sigmoid(
        _affine_cols(pd_w, pd_b, hp)
    ) * y[n_states:, :]
    return jnp.concatenate([dx, dv], axis=0)


def _make_kernel(n_times, method, n_states):
    def kernel(*refs):
        wrefs = refs[: len(WEIGHT_LEAVES)]
        consts_ref, y0_ref, times_ref, out_ref = refs[len(WEIGHT_LEAVES):]
        wv = tuple(r[:] for r in wrefs)
        c = (wv, consts_ref[:])
        rhs = lambda c, t, y: _bb_rhs_cols(c[0], c[1], n_states, t, y)  # noqa: E731
        y = y0_ref[:]
        out_ref[0] = y

        def step(i, y):
            y = _one_step(c, times_ref[i, 0], times_ref[i + 1, 0], y, method, rhs)
            out_ref[i + 1] = y
            return y

        jax.lax.fori_loop(0, n_times - 1, step, y)

    return kernel


def _make_bwd_kernel(n_times, method, n_states):
    """Reverse sweep: per-step VJP against the VMEM-resident trajectory.
    Weight cotangents accumulate into per-grid-cell outputs (summed
    host-side); constants/y0 cotangents are blocked like the forward."""

    def kernel(*refs):
        nw = len(WEIGHT_LEAVES)
        wrefs = refs[:nw]
        consts_ref, times_ref, traj_ref, g_ref = refs[nw: nw + 4]
        dwrefs = refs[nw + 4: nw + 4 + nw]
        dc_ref, dy0_ref = refs[nw + 4 + nw:]
        wv = tuple(r[:] for r in wrefs)
        cvals = consts_ref[:]
        for r in dwrefs:
            r[0] = jnp.zeros_like(r[0])
        dc_ref[:] = jnp.zeros_like(dc_ref[:])

        def body(k, a):
            i = n_times - 2 - k
            y_i = traj_ref[i]
            t1 = times_ref[i, 0]
            t2 = times_ref[i + 1, 0]

            def step_fn(y, wv, cv):
                rhs = lambda c, t, yy: _bb_rhs_cols(c[0], c[1], n_states, t, yy)  # noqa: E731
                return _one_step((wv, cv), t1, t2, y, method, rhs)

            _, vjp_fn = jax.vjp(step_fn, y_i, wv, cvals)
            a_y, a_w, a_c = vjp_fn(a)
            for j, r in enumerate(dwrefs):
                r[0] += a_w[j]
            dc_ref[:] += a_c
            return a_y + g_ref[i]

        a0 = g_ref[n_times - 1]
        dy0_ref[:] = jax.lax.fori_loop(0, n_times - 1, body, a0)

    return kernel


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _integrate_padded(wv, packed, y0_flat, times2d, n_states, method, block, interpret):
    NC, Rp = packed.shape
    S = y0_flat.shape[0]
    T = times2d.shape[0]
    w_specs = [
        pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for w in wv
    ]
    return pl.pallas_call(
        _make_kernel(T, method, n_states),
        grid=(Rp // block,),
        in_specs=w_specs + [
            pl.BlockSpec((NC, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, S, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, S, Rp), y0_flat.dtype),
        interpret=interpret,
    )(*wv, packed, y0_flat, times2d)


def _integrate_padded_fwd(wv, packed, y0_flat, times2d, n_states, method, block, interpret):
    out = _integrate_padded(wv, packed, y0_flat, times2d, n_states, method, block, interpret)
    return out, (wv, packed, times2d, out)


def _integrate_padded_bwd(n_states, method, block, interpret, res, g):
    wv, packed, times2d, traj = res
    NC, Rp = packed.shape
    T, S = traj.shape[0], traj.shape[1]
    # backward runs at a smaller block than the tuned forward default (the
    # VJP retrace doubles the VMEM working set; see pallas_ode)
    block = min(block, 256) if Rp % 256 == 0 else block
    n_cells = Rp // block
    w_specs = [
        pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for w in wv
    ]
    dw_specs = [
        pl.BlockSpec((1,) + w.shape, lambda i, nd=w.ndim: (i,) + (0,) * nd, memory_space=pltpu.VMEM)
        for w in wv
    ]
    outs = pl.pallas_call(
        _make_bwd_kernel(T, method, n_states),
        grid=(n_cells,),
        in_specs=w_specs + [
            pl.BlockSpec((NC, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, S, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, S, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=dw_specs + [
            pl.BlockSpec((NC, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_cells,) + w.shape, w.dtype) for w in wv
        ] + [
            jax.ShapeDtypeStruct((NC, Rp), packed.dtype),
            jax.ShapeDtypeStruct((S, Rp), packed.dtype),
        ],
        interpret=interpret,
    )(*wv, packed, times2d, traj, g)
    dwv = tuple(o.sum(axis=0) for o in outs[: len(wv)])
    dc, dy0 = outs[len(wv)], outs[len(wv) + 1]
    return dwv, dc, dy0, jnp.zeros_like(times2d)


_integrate_padded.defvjp(_integrate_padded_fwd, _integrate_padded_bwd)


def supported(ode_model):
    """True when the shipped-shape kernel covers this DR_Blackbox instance:
    NeuralStates with a hidden layer, NeuralPrecisions(n_hidden>=1, relu,
    non-inverse, 4 outputs)."""
    p = ode_model.precisions
    return (
        ode_model.neural_states.n_hidden >= 1
        and p.n_hidden >= 1
        and not p.inverse
        and p.activation is jax.nn.relu
        and p.n_outputs == N_PREC
    )


def blackbox_simulate(params, constants, y0, times, n_states, method="midpoint",
                      block_rows=None, interpret=False):
    """Fused black-box integration.  ``params``: the DR_Blackbox param dict
    (keys 'states' and 'precisions', each with 'hidden'/'prod'/'degr'
    linear leaves); ``constants``: [B, K, NC] per-sample constant features;
    ``y0``: [B, K, S_tot]; returns [T, B, K, S_tot].
    """
    from vihds_tpu.ops.pallas_ode import _block_default

    B, Kn, S = y0.shape
    NC = constants.shape[-1]
    R = B * Kn
    block = min(_block_default(1024) if block_rows is None else block_rows, R)
    pad = (-R) % block
    Rp = R + pad

    wv = tuple(
        params[a][b][c] if params[a][b][c].ndim == 2 else params[a][b][c][:, None]
        for a, b, c in WEIGHT_LEAVES
    )
    packed = jnp.broadcast_to(constants, (B, Kn, NC)).reshape(R, NC).T  # [NC, R]
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
    y0_flat = y0.reshape(R, S).T  # [S, R]
    if pad:
        y0_flat = jnp.pad(y0_flat, ((0, 0), (0, pad)), constant_values=1e-3)
    times2d = times.reshape(times.shape[0], 1)

    out = _integrate_padded(wv, packed, y0_flat, times2d, n_states, method, block, interpret)
    return jnp.moveaxis(out[:, :, :R], 1, 2).reshape(times.shape[0], B, Kn, S)
