"""Pallas TPU kernel: fused ODE integration for the dr_constant family.

The whole 85-step time loop runs inside ONE kernel with the state and all
theta-derived constants resident in VMEM; HBM sees only the initial state,
the packed constants, and the trajectory writes.  This is the "fused RHS-eval
+ solver-step kernel" called out in SURVEY.md §2.3/§7 as the Pallas target
for this model class.

Measured context (BASELINE.md): XLA already fuses each scan step well — this
kernel exists to squeeze the remaining per-step loop overhead on the forward
/ evaluation path (training uses the differentiable lax.scan path; this
kernel is forward-only).

Layout: samples are flattened to rows R = B*K and blocked over a 1-D grid;
each grid cell integrates ``block_rows`` rows for all T steps.  Constants are
packed as one [NC, R] array so the kernel reads a single [NC, block] VMEM
tile.  All math is elementwise on [block]-shaped vectors (VPU).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Packed constant order for the dr_constant RHS (version 1)
DR_CONST_NAMES = (
    "r",
    "K",
    "tlag",
    "rc",
    "a530",
    "a480",
    "drfp",
    "dyfp",
    "dcfp",
    "dR",
    "dS",
    "e76",
    "e81",
    "aCFP",
    "aYFP",
    "KGR_76",
    "KGS_76",
    "KGR_81",
    "KGS_81",
    "aR",
    "aS",
    "fracLuxR",
    "fracLasR",
)
N_SPECIES = 8


def _dr_rhs_cols(c, t, y):
    """dr_constant RHS; ``y`` is [S, block] — species ride the sublane axis
    and sample rows fill the 128-lane axis, the natural VPU tiling (a
    [block, S] layout pads S=8 up to 128 lanes: 16x VMEM waste, observed as
    a compile-time VMEM OOM).  Same math as
    vihds_tpu/models/dr_constant.py:_dr_species_rhs."""
    x, rfp, yfp, cfp, f530, f480, luxR, lasR = [y[i, :] for i in range(N_SPECIES)]
    gr = c["r"] * jax.nn.sigmoid(4.0 * (t - c["tlag"]))
    gamma = gr * (1.0 - x / c["K"])
    boundLuxR = luxR * luxR * c["fracLuxR"]
    boundLasR = lasR * lasR * c["fracLasR"]
    denom76 = 1.0 + c["KGR_76"] * boundLuxR + c["KGS_76"] * boundLasR
    denom81 = 1.0 + c["KGR_81"] * boundLuxR + c["KGS_81"] * boundLasR
    P76 = (c["e76"] + c["KGR_76"] * boundLuxR + c["KGS_76"] * boundLasR) / denom76
    P81 = (c["e81"] + c["KGR_81"] * boundLuxR + c["KGS_81"] * boundLasR) / denom81
    return jnp.stack(
        [
            gamma * x,
            c["rc"] - (gamma + c["drfp"]) * rfp,
            c["rc"] * c["aYFP"] * P81 - (gamma + c["dyfp"]) * yfp,
            c["rc"] * c["aCFP"] * P76 - (gamma + c["dcfp"]) * cfp,
            c["rc"] * c["a530"] - gamma * f530,
            c["rc"] * c["a480"] - gamma * f480,
            c["rc"] * c["aR"] - (gamma + c["dR"]) * luxR,
            c["rc"] * c["aS"] - (gamma + c["dS"]) * lasR,
        ],
        axis=0,
    )


def _one_step(c, t1, t2, y, method):
    """One fixed-grid update on [S, block] columns (shared by the forward
    kernel and the backward kernel's per-step VJP)."""
    h = t2 - t1
    if method == "modeuler":
        f1 = _dr_rhs_cols(c, t1, y)
        f2 = _dr_rhs_cols(c, t2, y + h * f1)
        return y + 0.5 * h * (f1 + f2)
    if method == "midpoint":
        f1 = _dr_rhs_cols(c, t1, y)
        f2 = _dr_rhs_cols(c, t1 + 0.5 * h, y + 0.5 * h * f1)
        return y + h * f2
    if method == "rk4":
        k1 = _dr_rhs_cols(c, t1, y)
        k2 = _dr_rhs_cols(c, t1 + 0.5 * h, y + 0.5 * h * k1)
        k3 = _dr_rhs_cols(c, t1 + 0.5 * h, y + 0.5 * h * k2)
        k4 = _dr_rhs_cols(c, t2, y + h * k3)
        return y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    raise ValueError(method)


def _make_kernel(n_times, method):
    def kernel(consts_ref, y0_ref, times_ref, out_ref):
        c = {name: consts_ref[i, :] for i, name in enumerate(DR_CONST_NAMES)}
        y = y0_ref[:]
        out_ref[0] = y

        def step(i, y):
            y = _one_step(c, times_ref[i, 0], times_ref[i + 1, 0], y, method)
            out_ref[i + 1] = y
            return y

        jax.lax.fori_loop(0, n_times - 1, step, y)

    return kernel


def _make_bwd_kernel(n_times, method):
    """Reverse sweep: walk the stored trajectory backwards, re-tracing each
    step's VJP in-kernel (trajectory + cotangents stay VMEM-resident; HBM
    never sees solver residuals — the Pallas analogue of the lax.scan path's
    jax.checkpoint remat)."""
    n_const = len(DR_CONST_NAMES)

    def kernel(consts_ref, times_ref, traj_ref, g_ref, dc_ref, dy0_ref):
        cvals = tuple(consts_ref[i, :] for i in range(n_const))
        for j in range(n_const):
            dc_ref[j, :] = jnp.zeros_like(dc_ref[j, :])

        def body(k, a):
            i = n_times - 2 - k
            y_i = traj_ref[i]
            t1 = times_ref[i, 0]
            t2 = times_ref[i + 1, 0]

            def step_fn(y, cv):
                c = {name: cv[j] for j, name in enumerate(DR_CONST_NAMES)}
                return _one_step(c, t1, t2, y, method)

            _, vjp_fn = jax.vjp(step_fn, y_i, cvals)
            a_y, a_c = vjp_fn(a)
            for j in range(n_const):
                dc_ref[j, :] += a_c[j]
            return a_y + g_ref[i]

        a0 = g_ref[n_times - 1]
        dy0_ref[:] = jax.lax.fori_loop(0, n_times - 1, body, a0)

    return kernel


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _integrate_padded(packed, y0_flat, times2d, method, block, interpret):
    """Fused forward on padded [NC, Rp] constants / [S, Rp] state columns."""
    NC, Rp = packed.shape
    S = y0_flat.shape[0]
    T = times2d.shape[0]
    return pl.pallas_call(
        _make_kernel(T, method),
        grid=(Rp // block,),
        in_specs=[
            pl.BlockSpec((NC, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, S, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, S, Rp), y0_flat.dtype),
        interpret=interpret,
    )(packed, y0_flat, times2d)


def _integrate_padded_fwd(packed, y0_flat, times2d, method, block, interpret):
    out = _integrate_padded(packed, y0_flat, times2d, method, block, interpret)
    return out, (packed, times2d, out)


def _integrate_padded_bwd(method, block, interpret, res, g):
    packed, times2d, traj = res
    NC, Rp = packed.shape
    T, S = traj.shape[0], traj.shape[1]
    dc, dy0 = pl.pallas_call(
        _make_bwd_kernel(T, method),
        grid=(Rp // block,),
        in_specs=[
            pl.BlockSpec((NC, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, S, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, S, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NC, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NC, Rp), packed.dtype),
            jax.ShapeDtypeStruct((S, Rp), packed.dtype),
        ],
        interpret=interpret,
    )(packed, times2d, traj, g)
    return dc, dy0, jnp.zeros_like(times2d)


_integrate_padded.defvjp(_integrate_padded_fwd, _integrate_padded_bwd)


def dr_constant_simulate(constants, y0, times, method="midpoint", block_rows=512, interpret=False):
    """Fused integration.  ``constants``: dict name -> [B, K]-broadcastable;
    ``y0``: [B, K, 8]; returns [T, B, K, 8] (same layout as ops.solvers).

    Differentiable: reverse-mode rides the in-kernel backward sweep
    (_make_bwd_kernel); gradients flow to ``constants`` (and through them to
    theta) and to ``y0``.  The pack/pad/unpack around the kernel is plain
    XLA, so its VJP is automatic.
    """
    B, Kn, S = y0.shape
    assert S == N_SPECIES
    R = B * Kn
    block = min(block_rows, R)
    pad = (-R) % block
    Rp = R + pad

    packed = jnp.stack(
        [jnp.broadcast_to(constants[name], (B, Kn)).reshape(R) for name in DR_CONST_NAMES]
    )
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
    y0_flat = y0.reshape(R, S).T  # [S, R] — species on sublanes, rows on lanes
    if pad:
        y0_flat = jnp.pad(y0_flat, ((0, 0), (0, pad)), constant_values=1e-3)
    times2d = times.reshape(times.shape[0], 1)

    out = _integrate_padded(packed, y0_flat, times2d, method, block, interpret)
    return jnp.moveaxis(out[:, :, :R], 1, 2).reshape(times.shape[0], B, Kn, S)
