"""Pallas TPU kernel: fused ODE integration for the dr_constant family.

The whole 85-step time loop runs inside ONE kernel with the state and all
theta-derived constants resident in VMEM; HBM sees only the initial state,
the packed constants, and the trajectory writes.  This is the "fused RHS-eval
+ solver-step kernel" called out in SURVEY.md §2.3/§7 as the Pallas target
for this model class.

Measured context (BASELINE.md): XLA already fuses each scan step well — this
kernel exists to squeeze the remaining per-step loop overhead.  It is fully
differentiable: reverse mode rides an in-kernel backward sweep that re-traces
each step's VJP against the VMEM-resident trajectory, so solver residuals
never touch HBM.  Two variants: the plain 8-state dr_constant family ("dr")
and the 12-state *_precisions family ("dr_prec", learned-precision ODE states
with the n_hidden=0 NeuralPrecisions block in-kernel).

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

# Packed constant order for the dr_constant RHS (versions 1 and 2: the
# version difference lives entirely in fracLuxR/fracLasR, computed host-side)
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
N_PREC = 4  # learned-precision ODE states in the *_precisions variants
N_PREC_IN = N_SPECIES + 1  # precision-net input: [t, species...]


def _prec_weight_names():
    """Flattened NeuralPrecisions(n_hidden=0) weights as pseudo-constant
    names.  Each weight/bias rides the packed-constants array as one more
    [block]-broadcast row, so the backward kernel's per-constant cotangent
    accumulation yields weight gradients with no extra machinery (the
    host-side broadcast_to VJP then sums them over the sample rows)."""
    names = []
    for net in ("prod", "degr"):
        for j in range(N_PREC):
            names.append("b_%s_%d" % (net, j))
            for i in range(N_PREC_IN):
                names.append("w_%s_%d_%d" % (net, j, i))
    return tuple(names)


DR_PREC_CONST_NAMES = DR_CONST_NAMES + _prec_weight_names()


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


def _dr_prec_rhs_cols(c, t, y):
    """dr_constant_precisions RHS on [12, block] columns: 8 mechanistic
    species + 4 learned-precision states with
    dprec_j/dt = sigmoid(Wp_j . tanh([t, s]) + bp_j)
              - sigmoid(Wd_j . tanh([t, s]) + bd_j) * prec_j
    — the NeuralPrecisions(n_hidden=0, tanh, non-inverse) block
    (vihds_tpu/models/base.py:84-102; reference vihds/precisions.py:76-87).
    The tiny [9 -> 4] affine maps are unrolled into vector FMAs on the
    weight rows (MXU would waste a full tile on a 9x4 matmul).

    Numerical note (measured on v5e): the 8 mechanistic species are
    BIT-EXACT vs the XLA scan path; the 4 precision states agree to ~2e-2
    pointwise relative / ~7e-4 relative-to-range — Mosaic's tanh/sigmoid
    differ from XLA's by float32 ULPs, and prec states span ~1e6 with
    stiff xd*prec dynamics that amplify them over 85 steps.  Both paths
    are equally valid float32 integrations of the same ODE."""
    dX = _dr_rhs_cols(c, t, y)
    h = [jnp.tanh(t)] + [jnp.tanh(y[i, :]) for i in range(N_SPECIES)]
    gate = {}
    for net in ("prod", "degr"):
        for j in range(N_PREC):
            acc = c["b_%s_%d" % (net, j)]
            for i in range(N_PREC_IN):
                acc = acc + c["w_%s_%d_%d" % (net, j, i)] * h[i]
            gate[(net, j)] = jax.nn.sigmoid(acc)
    dV = jnp.stack(
        [
            gate[("prod", j)] - gate[("degr", j)] * y[N_SPECIES + j, :]
            for j in range(N_PREC)
        ],
        axis=0,
    )
    return jnp.concatenate([dX, dV], axis=0)


# kind -> (packed-constant order, state rows, column RHS)
KINDS = {
    "dr": (DR_CONST_NAMES, N_SPECIES, _dr_rhs_cols),
    "dr_prec": (DR_PREC_CONST_NAMES, N_SPECIES + N_PREC, _dr_prec_rhs_cols),
}


def _one_step(c, t1, t2, y, method, rhs):
    """One fixed-grid update on [S, block] columns (shared by the forward
    kernel and the backward kernel's per-step VJP)."""
    h = t2 - t1
    if method == "modeuler":
        f1 = rhs(c, t1, y)
        f2 = rhs(c, t2, y + h * f1)
        return y + 0.5 * h * (f1 + f2)
    if method == "midpoint":
        f1 = rhs(c, t1, y)
        f2 = rhs(c, t1 + 0.5 * h, y + 0.5 * h * f1)
        return y + h * f2
    if method == "rk4":
        k1 = rhs(c, t1, y)
        k2 = rhs(c, t1 + 0.5 * h, y + 0.5 * h * k1)
        k3 = rhs(c, t1 + 0.5 * h, y + 0.5 * h * k2)
        k4 = rhs(c, t2, y + h * k3)
        return y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    raise ValueError(method)


def _make_kernel(n_times, method, kind):
    names, _, rhs = KINDS[kind]

    def kernel(consts_ref, y0_ref, times_ref, out_ref):
        c = {name: consts_ref[i, :] for i, name in enumerate(names)}
        y = y0_ref[:]
        out_ref[0] = y

        def step(i, y):
            y = _one_step(c, times_ref[i, 0], times_ref[i + 1, 0], y, method, rhs)
            out_ref[i + 1] = y
            return y

        jax.lax.fori_loop(0, n_times - 1, step, y)

    return kernel


def _make_bwd_kernel(n_times, method, kind):
    """Reverse sweep: walk the stored trajectory backwards, re-tracing each
    step's VJP in-kernel (trajectory + cotangents stay VMEM-resident; HBM
    never sees solver residuals — the Pallas analogue of the lax.scan path's
    jax.checkpoint remat)."""
    names, _, rhs = KINDS[kind]
    n_const = len(names)

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
                c = {name: cv[j] for j, name in enumerate(names)}
                return _one_step(c, t1, t2, y, method, rhs)

            _, vjp_fn = jax.vjp(step_fn, y_i, cvals)
            a_y, a_c = vjp_fn(a)
            for j in range(n_const):
                dc_ref[j, :] += a_c[j]
            return a_y + g_ref[i]

        a0 = g_ref[n_times - 1]
        dy0_ref[:] = jax.lax.fori_loop(0, n_times - 1, body, a0)

    return kernel


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _integrate_padded(packed, y0_flat, times2d, kind, method, block, interpret):
    """Fused forward on padded [NC, Rp] constants / [S, Rp] state columns."""
    NC, Rp = packed.shape
    S = y0_flat.shape[0]
    T = times2d.shape[0]
    return pl.pallas_call(
        _make_kernel(T, method, kind),
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


def _integrate_padded_fwd(packed, y0_flat, times2d, kind, method, block, interpret):
    out = _integrate_padded(packed, y0_flat, times2d, kind, method, block, interpret)
    return out, (packed, times2d, out)


def _integrate_padded_bwd(kind, method, block, interpret, res, g):
    packed, times2d, traj = res
    NC, Rp = packed.shape
    T, S = traj.shape[0], traj.shape[1]
    dc, dy0 = pl.pallas_call(
        _make_bwd_kernel(T, method, kind),
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


def _simulate(kind, constants, y0, times, method, block_rows, interpret):
    names, S_expected, _ = KINDS[kind]
    B, Kn, S = y0.shape
    assert S == S_expected, (S, S_expected)
    R = B * Kn
    block = min(block_rows, R)
    pad = (-R) % block
    Rp = R + pad

    packed = jnp.stack(
        [jnp.broadcast_to(constants[name], (B, Kn)).reshape(R) for name in names]
    )
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
    y0_flat = y0.reshape(R, S).T  # [S, R] — species on sublanes, rows on lanes
    if pad:
        y0_flat = jnp.pad(y0_flat, ((0, 0), (0, pad)), constant_values=1e-3)
    times2d = times.reshape(times.shape[0], 1)

    out = _integrate_padded(packed, y0_flat, times2d, kind, method, block, interpret)
    return jnp.moveaxis(out[:, :, :R], 1, 2).reshape(times.shape[0], B, Kn, S)


def dr_constant_simulate(constants, y0, times, method="midpoint", block_rows=512, interpret=False):
    """Fused integration.  ``constants``: dict name -> [B, K]-broadcastable;
    ``y0``: [B, K, 8]; returns [T, B, K, 8] (same layout as ops.solvers).

    Differentiable: reverse-mode rides the in-kernel backward sweep
    (_make_bwd_kernel); gradients flow to ``constants`` (and through them to
    theta) and to ``y0``.  The pack/pad/unpack around the kernel is plain
    XLA, so its VJP is automatic.
    """
    return _simulate("dr", constants, y0, times, method, block_rows, interpret)


def dr_constant_precisions_simulate(
    constants, prec_params, y0, times, method="midpoint", block_rows=256, interpret=False
):
    """Fused integration of the dr_constant_precisions family (8 mechanistic
    + 4 learned-precision states; NeuralPrecisions with n_hidden=0, tanh
    activation, non-inverse — the shipped specs/dr_constant_precisions.yaml
    configuration).  ``prec_params``: {'prod': {'w': [9, 4], 'b': [4]},
    'degr': {...}}; ``y0``: [B, K, 12]; returns [T, B, K, 12].

    The weights join the packed constants as broadcast rows, so the backward
    kernel's constant-cotangent accumulation produces weight gradients and
    the host-side broadcast VJP reduces them over the sample rows.  Smaller
    default block than the plain kernel: 12 state rows x T trajectory +
    cotangents must stay VMEM-resident in the backward sweep.
    """
    c = dict(constants)
    for net in ("prod", "degr"):
        w, b = prec_params[net]["w"], prec_params[net]["b"]
        for j in range(N_PREC):
            c["b_%s_%d" % (net, j)] = b[j]
            for i in range(N_PREC_IN):
                c["w_%s_%d_%d" % (net, j, i)] = w[i, j]
    return _simulate("dr_prec", c, y0, times, method, block_rows, interpret)
