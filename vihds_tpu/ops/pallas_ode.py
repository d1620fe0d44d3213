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


def _make_kernel(n_times, method):
    def kernel(consts_ref, y0_ref, times_ref, out_ref):
        c = {name: consts_ref[i, :] for i, name in enumerate(DR_CONST_NAMES)}
        y = y0_ref[:]
        out_ref[0] = y

        def step(i, y):
            t1 = times_ref[i, 0]
            t2 = times_ref[i + 1, 0]
            h = t2 - t1
            if method == "modeuler":
                f1 = _dr_rhs_cols(c, t1, y)
                f2 = _dr_rhs_cols(c, t2, y + h * f1)
                y = y + 0.5 * h * (f1 + f2)
            elif method == "midpoint":
                f1 = _dr_rhs_cols(c, t1, y)
                f2 = _dr_rhs_cols(c, t1 + 0.5 * h, y + 0.5 * h * f1)
                y = y + h * f2
            elif method == "rk4":
                k1 = _dr_rhs_cols(c, t1, y)
                k2 = _dr_rhs_cols(c, t1 + 0.5 * h, y + 0.5 * h * k1)
                k3 = _dr_rhs_cols(c, t1 + 0.5 * h, y + 0.5 * h * k2)
                k4 = _dr_rhs_cols(c, t2, y + h * k3)
                y = y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            else:
                raise ValueError(method)
            out_ref[i + 1] = y
            return y

        jax.lax.fori_loop(0, n_times - 1, step, y)

    return kernel


def dr_constant_simulate(constants, y0, times, method="midpoint", block_rows=512, interpret=False):
    """Fused integration.  ``constants``: dict name -> [B, K]-broadcastable;
    ``y0``: [B, K, 8]; returns [T, B, K, 8] (same layout as ops.solvers)."""
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
    T = times.shape[0]
    times2d = times.reshape(T, 1)

    grid = (Rp // block,)
    out = pl.pallas_call(
        _make_kernel(T, method),
        grid=grid,
        in_specs=[
            pl.BlockSpec((len(DR_CONST_NAMES), block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, S, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, S, Rp), y0.dtype),
        interpret=interpret,
    )(packed, y0_flat, times2d)
    return jnp.moveaxis(out[:, :, :R], 1, 2).reshape(T, B, Kn, S)
