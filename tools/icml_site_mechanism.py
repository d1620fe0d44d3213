"""Mechanism probes for the two icml battery sites the TOST gate marks
SHIFTED (VERDICT r4 #2): aYFP.mu and KGS_81.prec.

Two testable mechanisms, each probed under THIS stack's own decoder:

1. ``ridge`` — aYFP rides a compensation ridge through P81: the RHS only
   constrains aYFP*P81 with P81 = (e81 + KGR_81*bLuxR + KGS_81*bLasR) /
   (1 + KGR_81*bLuxR + KGS_81*bLasR) (models/dr_constant.py; reference
   models/dr_constant.py:77-112), so per-series posteriors should show
   strong cross-correlations between log aYFP and log e81 / log KGR_81 —
   the coordinates trade while the product stays pinned.  The battery's
   compensating shifts (ours vs ref: aYFP +0.26, e81 -0.31, KGR_81 +0.47
   in z) are different ridge points, not disagreements about the flow.
   This probe trains the icml seed, runs the per-series HMC
   (refine.hmc_refine, massq + adapt_mass), and reports the per-series
   posterior correlation matrix over the P81 block, averaged over series.

2. ``drift`` — KGS_81 is per-series prior-dominated (per-series posterior
   sd == prior sd 3.0, measured: reports/icml_site_ground_truth), so the
   pooled q precision on it moves SLOWLY from its init (q_global_init:
   unit => prec 1.0) under noisy gradients; at 1000 epochs both stacks
   still sit near 1.0 (ref 0.76, ours 1.43) on opposite sides.  If that is
   the mechanism, training longer must move q(KGS_81).prec monotonically
   toward the barycenter value instead of holding a converged plateau.
   This probe trains the same seed at several epoch budgets and prints the
   q(site) trajectory.

Usage:
  python tools/icml_site_mechanism.py ridge  [seed] [out_dir]
  python tools/icml_site_mechanism.py drift  [seed] [out_dir] [epochs ...]
"""

import os
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
DEFAULT_OUT = os.path.join(REPO, "reports", "icml_site_ground_truth")
SPEC = "dr_constant_icml.yaml"
BLOCK = ("aYFP", "e81", "KGR_81", "KGS_81", "aCFP", "e76")


def _train(seed, epochs):
    import jax
    import numpy as np

    os.chdir(tempfile.mkdtemp(prefix="mech_seed%d_" % seed))

    from vihds_tpu.profiling import enable_compile_cache

    enable_compile_cache()

    from vihds_tpu.config import Config
    from vihds_tpu.data.datasets import build_datasets
    from vihds_tpu.prob import ParamProgram, parse_parameters
    from vihds_tpu.run_xval import create_parser
    from vihds_tpu.training import Training, batch_arrays
    from vihds_tpu.vae import VAE

    args = create_parser(True).parse_args([os.path.join(REPO, "specs", SPEC)])
    args.seed = seed
    args.epochs = epochs
    args.test_epoch = 20
    args.plot_epoch = 0
    args.train_samples = 200
    args.test_samples = 200
    settings = Config(args)
    settings.trainer = None
    settings.params.q_global_init = "unit"
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    training = Training(args, settings, data, program, model)
    training.run()
    params = training.final_params
    batch = batch_arrays(data.train.batch())
    q = model.encoder(params["enc"], batch)
    return model, program, params, batch, np.asarray(q.mu), np.asarray(q.prec)


def ridge(seed, out_dir):
    import numpy as np
    import jax

    model, program, params, batch, q_mu, q_prec = _train(seed, 1000)
    from vihds_tpu import refine

    res = refine.hmc_refine(
        model, program, params, batch, jax.random.PRNGKey(seed + 101),
        n_chains=16, n_steps=4000, n_leapfrog=10,
        mass_from_q=True, adapt_mass=True, return_trace=True,
    )
    nw = int(res.n_warmup)
    idx = [program.index[n] for n in BLOCK]
    # fetch only the monitored columns, post-warmup, in slabs
    zt = res.z_trace[:, :, :, np.asarray(idx)]
    d = np.concatenate(
        [np.asarray(zt[i: i + 200]) for i in range(nw, zt.shape[0], 200)], axis=0
    )  # [S, B, K, len(BLOCK)]
    S, B, K, P = d.shape
    # per-series posterior correlation matrix, then series-averaged
    x = d.transpose(1, 0, 2, 3).reshape(B, S * K, P)
    x = x - x.mean(axis=1, keepdims=True)
    cov = np.einsum("bsp,bsq->bpq", x, x) / (S * K - 1)
    sd = np.sqrt(np.maximum(np.einsum("bpp->bp", cov), 1e-30))
    corr = cov / (sd[:, :, None] * sd[:, None, :])
    mean_corr = corr.mean(axis=0)
    os.makedirs(out_dir, exist_ok=True)
    np.savez(
        os.path.join(out_dir, "ridge_seed%d.npz" % seed),
        block=np.array(BLOCK), mean_corr=mean_corr, corr=corr,
        accept=float(np.asarray(res.accept_rate).mean()),
    )
    print("per-series posterior correlations (mean over %d series):" % B)
    print("%10s" % "", " ".join("%8s" % n for n in BLOCK))
    for i, n in enumerate(BLOCK):
        print("%10s" % n, " ".join("%8.2f" % mean_corr[i, j] for j in range(P)))


def drift(seed, out_dir, epoch_grid):
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for ep in epoch_grid:
        model, program, params, batch, q_mu, q_prec = _train(seed, ep)
        row = {"epochs": ep}
        for s in ("aYFP", "KGS_81"):
            i = program.index[s]
            row["%s_q_mu" % s] = float(q_mu[:, i].mean())
            row["%s_q_prec" % s] = float(q_prec[:, i].mean())
        rows.append(row)
        print(row)
    np.savez(
        os.path.join(out_dir, "drift_seed%d.npz" % seed),
        **{k: np.array([r[k] for r in rows]) for k in rows[0]},
    )


def main():
    mode = sys.argv[1]
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    out_dir = os.path.abspath(sys.argv[3]) if len(sys.argv) > 3 else DEFAULT_OUT
    if mode == "ridge":
        ridge(seed, out_dir)
    elif mode == "drift":
        grid = [int(e) for e in sys.argv[4:]] or [1000, 2000, 4000]
        drift(seed, out_dir, grid)
    else:
        raise SystemExit("mode must be ridge|drift")


if __name__ == "__main__":
    main()
