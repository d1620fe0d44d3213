"""Pallas TPU kernels: fused ODE integration for the mechanistic families.

The whole time loop runs inside ONE kernel with the state and all
theta-derived constants resident in VMEM; HBM sees only the initial state,
the packed constants, and the trajectory writes.  This is the "fused RHS-eval
+ solver-step kernel" called out in SURVEY.md §2.3/§7 for this model class.

Measured context (BASELINE.md): XLA already fuses each scan step well — this
kernel exists to squeeze the remaining per-step loop overhead.  It is fully
differentiable: reverse mode rides an in-kernel backward sweep that re-traces
each step's VJP against the VMEM-resident trajectory, so solver residuals
never touch HBM.  Covered families (every mechanistic per-row-constants RHS
in the zoo — reference models/dr_constant.py, models/relay_constant.py,
models/degrader_constant.py):

  kind            states  family
  "dr"            8       dr_constant v1/v2 (version lives in frac* host-side)
  "dr_prec"       12      dr_constant_precisions v1/v2
  "relay"         12      relay_constant
  "relay_prec"    16      relay_constant_precisions
  "degrader"      11      degrader_constant
  "degrader_prec" 15      degrader_constant_precisions

The *_prec variants carry the n_hidden=0 NeuralPrecisions block in-kernel
(4 learned-precision ODE states; the two nets' weights ride ONE small
[2*4, 1+n_in] matrix operand fed to the MXU each step).  The
black-box family (shared-weight hidden-layer matmuls, reference
models/dr_blackbox.py) is a different workload shape (MXU, not per-row
VPU) and has its own fused kernel: vihds_tpu/ops/pallas_blackbox.py.

Layout: samples are flattened to rows R = B*K and blocked over a 1-D grid;
each grid cell integrates ``block_rows`` rows for all T steps.  Constants are
packed as one [NC, R] array so the kernel reads a single [NC, block] VMEM
tile.  All math is elementwise on [block]-shaped vectors (VPU).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_default(v):
    """Family default block_rows, overridable via VIHDS_PALLAS_BLOCK (the
    tuning knob tools/pallas_tune.py sweeps; read at trace time)."""
    return int(os.environ.get("VIHDS_PALLAS_BLOCK", v))

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
N_SPECIES = 8  # dr_constant mechanistic states
N_PREC = 4  # learned-precision ODE states in the *_precisions variants
N_PREC_IN = N_SPECIES + 1  # dr precision-net input: [t, species...]

# relay_constant: + synthases LuxI/LasI and secreted C6/C12
# (reference models/relay_constant.py:60-120)
RELAY_CONST_NAMES = (
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
    "dluxI",
    "dlasI",
    "e76",
    "e81",
    "aCFP",
    "aYFP",
    "KGR_76",
    "KGS_76",
    "KGR_81",
    "KGS_81",
    "KC6",
    "KC12",
    "Klux",
    "Klas",
    "aR",
    "aS",
    "fracLuxR",
    "fracLasR",
)
RELAY_SPECIES = 12

# degrader_constant: + AiiA lactonase degrading C6/C12, PBAD arabinose input
# (reference models/degrader_constant.py:60-130; PBAD/rC6/rC12 precomputed
# host-side like frac*)
DEGRADER_CONST_NAMES = (
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
    "aI",
    "daiiA",
    "PBAD",
    "rC6",
    "rC12",
    "fracLuxR",
    "fracLasR",
)
DEGRADER_SPECIES = 11




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


def _relay_rhs_cols(c, t, y):
    """relay_constant RHS on [12, block] columns.  Same math as
    vihds_tpu/models/relay_constant.py:make_rhs (reference
    models/relay_constant.py:104-146): dr_constant's 8 species + synthases
    LuxI/LasI and secreted C6/C12 (the treatment columns become dynamic
    states; fracLuxR/fracLasR stay at the initial treatments, matching the
    scan path)."""
    x = y[0, :]
    luxR, lasR, luxI, lasI = y[6, :], y[7, :], y[8, :], y[9, :]
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
            c["rc"] - (gamma + c["drfp"]) * y[1, :],
            c["rc"] * c["aYFP"] * P81 - (gamma + c["dyfp"]) * y[2, :],
            c["rc"] * c["aCFP"] * P76 - (gamma + c["dcfp"]) * y[3, :],
            c["rc"] * c["a530"] - gamma * y[4, :],
            c["rc"] * c["a480"] - gamma * y[5, :],
            c["rc"] * c["aR"] - (gamma + c["dR"]) * luxR,
            c["rc"] * c["aS"] - (gamma + c["dS"]) * lasR,
            c["rc"] * P81 - (gamma + c["dluxI"]) * luxI,
            c["rc"] * P76 - (gamma + c["dlasI"]) * lasI,
            (c["KC6"] * c["rc"] * x * luxI) / (1.0 + luxI / c["Klux"]),
            (c["KC12"] * c["rc"] * x * lasI) / (1.0 + lasI / c["Klas"]),
        ],
        axis=0,
    )


def _degrader_rhs_cols(c, t, y):
    """degrader_constant RHS on [11, block] columns.  Same math as
    vihds_tpu/models/degrader_constant.py:make_rhs (reference
    models/degrader_constant.py:108-147): dr_constant's 8 species + AiiA
    (PBAD-driven lactonase) and degrading C6/C12 states."""
    x = y[0, :]
    luxR, lasR, aiiA = y[6, :], y[7, :], y[8, :]
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
            c["rc"] - (gamma + c["drfp"]) * y[1, :],
            c["rc"] * c["aYFP"] * P81 - (gamma + c["dyfp"]) * y[2, :],
            c["rc"] * c["aCFP"] * P76 - (gamma + c["dcfp"]) * y[3, :],
            c["rc"] * c["a530"] - gamma * y[4, :],
            c["rc"] * c["a480"] - gamma * y[5, :],
            c["rc"] * c["aR"] - (gamma + c["dR"]) * luxR,
            c["rc"] * c["aS"] - (gamma + c["dS"]) * lasR,
            c["rc"] * c["aI"] * c["PBAD"] - (c["daiiA"] + gamma * aiiA),
            x * c["rC6"] * aiiA,
            x * c["rC12"] * aiiA,
        ],
        axis=0,
    )


def _with_precisions(base_rhs, n_sp):
    """Wrap a mechanistic column RHS with the in-kernel
    NeuralPrecisions(n_hidden=0, tanh, non-inverse) block: 4 extra states
    dprec_j/dt = sigmoid(Wp_j . tanh([t, s]) + bp_j)
              - sigmoid(Wd_j . tanh([t, s]) + bd_j) * prec_j
    (vihds_tpu/models/base.py:90-108; reference vihds/precisions.py:76-87).
    The weights arrive as ONE [2*N_PREC, 1+n_in] matrix operand (bias in
    column 0), so both nets' eight affine maps are a single small MXU
    ``dot_general`` against the [1+n_in, block] tanh-feature columns —
    round 4 unrolled them into ~2*4*n_in serial vector FMAs per step (and
    ~as many per-constant cotangent accumulations per backward step), which
    measured SLOWER than the XLA scan on the relay/degrader variants; the
    matmul rides the otherwise-idle MXU.  ``c`` is ``(cdict, wmat)``.

    Numerical note (measured on v5e, dr family): the mechanistic species
    are BIT-EXACT vs the XLA scan path; the 4 precision states agree to
    ~2e-2 pointwise relative / ~7e-4 relative-to-range — Mosaic's
    tanh/sigmoid differ from XLA's by float32 ULPs, and prec states span
    ~1e6 with stiff xd*prec dynamics that amplify them over the time loop.
    Both paths are equally valid float32 integrations of the same ODE."""

    def rhs(c, t, y):
        cdict, wmat = c
        dX = base_rhs(cdict, t, y)
        blk = y.shape[1]
        tv = jnp.full((1, blk), t, y.dtype)
        feats = jnp.concatenate(
            [jnp.ones((1, blk), y.dtype), jnp.tanh(jnp.concatenate([tv, y[:n_sp]], axis=0))],
            axis=0,
        )  # [1+n_in, block]: bias row + tanh([t, species...])
        gates = jax.nn.sigmoid(
            jax.lax.dot_general(
                wmat, feats, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )  # [2*N_PREC, block]
        dV = gates[:N_PREC] - gates[N_PREC:] * y[n_sp: n_sp + N_PREC]
        return jnp.concatenate([dX, dV], axis=0)

    return rhs


_dr_prec_rhs_cols = _with_precisions(_dr_rhs_cols, N_SPECIES)

# kind -> (packed-constant order, state rows, column RHS); *_prec kinds
# additionally take the precision-net weight matrix operand (PREC_KINDS)
KINDS = {
    "dr": (DR_CONST_NAMES, N_SPECIES, _dr_rhs_cols),
    "dr_prec": (DR_CONST_NAMES, N_SPECIES + N_PREC, _dr_prec_rhs_cols),
    "relay": (RELAY_CONST_NAMES, RELAY_SPECIES, _relay_rhs_cols),
    "relay_prec": (
        RELAY_CONST_NAMES,
        RELAY_SPECIES + N_PREC,
        _with_precisions(_relay_rhs_cols, RELAY_SPECIES),
    ),
    "degrader": (DEGRADER_CONST_NAMES, DEGRADER_SPECIES, _degrader_rhs_cols),
    "degrader_prec": (
        DEGRADER_CONST_NAMES,
        DEGRADER_SPECIES + N_PREC,
        _with_precisions(_degrader_rhs_cols, DEGRADER_SPECIES),
    ),
}
PREC_KINDS = frozenset(k for k in KINDS if k.endswith("_prec"))


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
    has_w = kind in PREC_KINDS

    def kernel(*refs):
        if has_w:
            wmat_ref, consts_ref, y0_ref, times_ref, out_ref = refs
        else:
            consts_ref, y0_ref, times_ref, out_ref = refs
        cdict = {name: consts_ref[i, :] for i, name in enumerate(names)}
        c = (cdict, wmat_ref[:]) if has_w else cdict
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
    jax.checkpoint remat).  For *_prec kinds the weight-matrix cotangent
    accumulates per grid cell into a [n_cells, ...]-blocked output that the
    host sums (same scheme as pallas_blackbox)."""
    names, _, rhs = KINDS[kind]
    n_const = len(names)
    has_w = kind in PREC_KINDS

    def kernel(*refs):
        if has_w:
            (wmat_ref, consts_ref, times_ref, traj_ref, g_ref,
             dw_ref, dc_ref, dy0_ref) = refs
            wmat = wmat_ref[:]
            dw_ref[0] = jnp.zeros_like(dw_ref[0])
        else:
            consts_ref, times_ref, traj_ref, g_ref, dc_ref, dy0_ref = refs
        cvals = tuple(consts_ref[i, :] for i in range(n_const))
        for j in range(n_const):
            dc_ref[j, :] = jnp.zeros_like(dc_ref[j, :])

        def body(k, a):
            i = n_times - 2 - k
            y_i = traj_ref[i]
            t1 = times_ref[i, 0]
            t2 = times_ref[i + 1, 0]

            if has_w:
                def step_fn(y, cv, wm):
                    cdict = {name: cv[j] for j, name in enumerate(names)}
                    return _one_step((cdict, wm), t1, t2, y, method, rhs)

                _, vjp_fn = jax.vjp(step_fn, y_i, cvals, wmat)
                a_y, a_c, a_w = vjp_fn(a)
                dw_ref[0] += a_w
            else:
                def step_fn(y, cv):
                    cdict = {name: cv[j] for j, name in enumerate(names)}
                    return _one_step(cdict, t1, t2, y, method, rhs)

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
    block = min(block, 256) if Rp % 256 == 0 else block  # see _integrate_padded_w_bwd
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


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _integrate_padded_w(wmat, packed, y0_flat, times2d, kind, method, block, interpret):
    """Fused forward for *_prec kinds: the precision-net weight matrix
    ``wmat`` [2*N_PREC, 1+n_in] rides as a whole-array VMEM operand."""
    NC, Rp = packed.shape
    S = y0_flat.shape[0]
    T = times2d.shape[0]
    return pl.pallas_call(
        _make_kernel(T, method, kind),
        grid=(Rp // block,),
        in_specs=[
            pl.BlockSpec(wmat.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, S, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, S, Rp), y0_flat.dtype),
        interpret=interpret,
    )(wmat, packed, y0_flat, times2d)


def _integrate_padded_w_fwd(wmat, packed, y0_flat, times2d, kind, method, block, interpret):
    out = _integrate_padded_w(wmat, packed, y0_flat, times2d, kind, method, block, interpret)
    return out, (wmat, packed, times2d, out)


def _integrate_padded_w_bwd(kind, method, block, interpret, res, g):
    wmat, packed, times2d, traj = res
    NC, Rp = packed.shape
    T, S = traj.shape[0], traj.shape[1]
    # the per-step VJP retrace roughly doubles the forward's VMEM working
    # set (traj + cotangent tiles + re-traced solver intermediates), so the
    # backward runs at a smaller block than the tuned forward (256 divides
    # every shipped forward default; measured: block 1024 bwd OOMs at 22 MB
    # scoped vmem on v5e)
    block = min(block, 256) if Rp % 256 == 0 else block
    n_cells = Rp // block
    dw, dc, dy0 = pl.pallas_call(
        _make_bwd_kernel(T, method, kind),
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec(wmat.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, S, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, S, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1,) + wmat.shape, lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_cells,) + wmat.shape, wmat.dtype),
            jax.ShapeDtypeStruct((NC, Rp), packed.dtype),
            jax.ShapeDtypeStruct((S, Rp), packed.dtype),
        ],
        interpret=interpret,
    )(wmat, packed, times2d, traj, g)
    return dw.sum(axis=0), dc, dy0, jnp.zeros_like(times2d)


_integrate_padded_w.defvjp(_integrate_padded_w_fwd, _integrate_padded_w_bwd)


def _simulate(kind, constants, y0, times, method, block_rows, interpret, wmat=None):
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
        # ones, not zeros: zero constants make the padded lanes' RHS
        # non-finite (x/K), and the *_prec weight cotangent REDUCES over
        # lanes, so a padded-lane NaN would poison the whole weight grad
        # (0 * nan = nan); with finite math the padded lanes' zero
        # cotangents contribute exactly zero.
        packed = jnp.pad(packed, ((0, 0), (0, pad)), constant_values=1.0)
    y0_flat = y0.reshape(R, S).T  # [S, R] — species on sublanes, rows on lanes
    if pad:
        y0_flat = jnp.pad(y0_flat, ((0, 0), (0, pad)), constant_values=1e-3)
    times2d = times.reshape(times.shape[0], 1)

    if wmat is not None:
        out = _integrate_padded_w(wmat, packed, y0_flat, times2d, kind, method, block, interpret)
    else:
        out = _integrate_padded(packed, y0_flat, times2d, kind, method, block, interpret)
    return jnp.moveaxis(out[:, :, :R], 1, 2).reshape(times.shape[0], B, Kn, S)


def dr_constant_simulate(constants, y0, times, method="midpoint", block_rows=None, interpret=False):
    """Fused integration.  ``constants``: dict name -> [B, K]-broadcastable;
    ``y0``: [B, K, 8]; returns [T, B, K, 8] (same layout as ops.solvers).

    Differentiable: reverse-mode rides the in-kernel backward sweep
    (_make_bwd_kernel); gradients flow to ``constants`` (and through them to
    theta) and to ``y0``.  The pack/pad/unpack around the kernel is plain
    XLA, so its VJP is automatic.
    """
    block_rows = _block_default(2048) if block_rows is None else block_rows
    return _simulate("dr", constants, y0, times, method, block_rows, interpret)


def _prec_wmat(prec_params):
    """Stack the NeuralPrecisions(n_hidden=0) weights into the kernel's
    single [2*N_PREC, 1+n_in] matrix operand (rows 0..3 prod, 4..7 degr;
    column 0 is the bias, columns 1.. the [t, species...] input weights).
    ``prec_params``: {'prod': {'w': [n_in, 4], 'b': [4]}, 'degr': {...}}.
    Plain XLA ops, so the weight cotangent from the kernel flows back to
    the param leaves automatically."""
    return jnp.concatenate(
        [
            jnp.concatenate(
                [prec_params[net]["b"][:, None], prec_params[net]["w"].T], axis=1
            )
            for net in ("prod", "degr")
        ],
        axis=0,
    )


def dr_constant_precisions_simulate(
    constants, prec_params, y0, times, method="midpoint", block_rows=None, interpret=False
):
    """Fused integration of the dr_constant_precisions family (8 mechanistic
    + 4 learned-precision states; NeuralPrecisions with n_hidden=0, tanh
    activation, non-inverse — the shipped specs/dr_constant_precisions.yaml
    configuration).  ``y0``: [B, K, 12]; returns [T, B, K, 12].

    Smaller default block than the plain kernel: 12 state rows x T
    trajectory + cotangents must stay VMEM-resident in the backward sweep.
    """
    block_rows = _block_default(1024) if block_rows is None else block_rows
    return _simulate("dr_prec", constants, y0, times, method, block_rows,
                     interpret, wmat=_prec_wmat(prec_params))


def relay_constant_simulate(constants, y0, times, method="midpoint", block_rows=None, interpret=False):
    """Fused integration of the 12-state relay_constant family; same layout
    contract as ``dr_constant_simulate``."""
    block_rows = _block_default(1024) if block_rows is None else block_rows
    return _simulate("relay", constants, y0, times, method, block_rows, interpret)


def relay_constant_precisions_simulate(
    constants, prec_params, y0, times, method="midpoint", block_rows=None, interpret=False
):
    """Fused relay_constant_precisions (12 mechanistic + 4 learned-precision
    states); ``y0``: [B, K, 16]; returns [T, B, K, 16]."""
    block_rows = _block_default(1024) if block_rows is None else block_rows
    return _simulate("relay_prec", constants, y0, times, method, block_rows,
                     interpret, wmat=_prec_wmat(prec_params))


def degrader_constant_simulate(constants, y0, times, method="midpoint", block_rows=None, interpret=False):
    """Fused integration of the 11-state degrader_constant family; same
    layout contract as ``dr_constant_simulate``."""
    block_rows = _block_default(1024) if block_rows is None else block_rows
    return _simulate("degrader", constants, y0, times, method, block_rows, interpret)


def degrader_constant_precisions_simulate(
    constants, prec_params, y0, times, method="midpoint", block_rows=None, interpret=False
):
    """Fused degrader_constant_precisions (11 mechanistic + 4
    learned-precision states); ``y0``: [B, K, 15]; returns [T, B, K, 15]."""
    block_rows = _block_default(512) if block_rows is None else block_rows
    return _simulate("degrader_prec", constants, y0, times, method, block_rows,
                     interpret, wmat=_prec_wmat(prec_params))


def simulate_kind(kind, constants, y0, times, method="midpoint", prec_params=None, interpret=False):
    """Family dispatcher used by OdeModel's generic pallas route.  Resolves
    the per-family wrapper through the module namespace so tests (and
    callers) can monkeypatch an individual family's entry point."""
    import vihds_tpu.ops.pallas_ode as me

    fns = {
        "dr": me.dr_constant_simulate,
        "dr_prec": me.dr_constant_precisions_simulate,
        "relay": me.relay_constant_simulate,
        "relay_prec": me.relay_constant_precisions_simulate,
        "degrader": me.degrader_constant_simulate,
        "degrader_prec": me.degrader_constant_precisions_simulate,
    }
    fn = fns[kind]
    if kind.endswith("_prec"):
        return fn(constants, prec_params, y0, times, method=method, interpret=interpret)
    return fn(constants, y0, times, method=method, interpret=interpret)
