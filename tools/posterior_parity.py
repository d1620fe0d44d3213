"""Posterior-moment parity gate (BASELINE.json correctness north star).

Trains the UNMODIFIED (shimmed) reference and this repo on the same spec at a
matched regime and compares per-site posterior moments — the variational
q-site parameters (mu, prec) at the best-validation epoch — within the
Monte-Carlo error estimated from the across-seed spread.  Both
implementations draw the SAME train/validation split (both seed numpy and
permute identically), so local-site moments compare elementwise per
validation datapoint.

The relay half of the gate is impossible to run in the reference: its relay
models do not construct (Relay_Constant passes 5 args to the 4-arg
OdeFunc.__init__, reference models/relay_constant.py:17 vs vihds/ode.py:21,
and Relay_Constant_Precisions calls the nonexistent init_with_params,
models/relay_constant.py:201).  The dr_constant half is what this tool
measures; see PARITY.md.

Usage:
  python tools/posterior_parity.py reference <seed> [epochs] [out_dir] [spec]
  python tools/posterior_parity.py ours      <seed> [epochs] [out_dir] [spec]
  python tools/posterior_parity.py compare   [out_dir]
"""

import os
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
DEFAULT_OUT = os.path.join(REPO, "reports", "posterior_parity")
DEFAULT_SPEC = "dr_constant_one.yaml"
DEFAULT_EPOCHS = 300

# A run's ELBO above this is the reference's +-4sigma clip exploit blowing up
# (q pushed past the clip bound => unbounded -log q; see vihds_tpu/vae.py
# docstring); its best-val cache is then the exploded epoch — junk moments.
DIVERGED_ELBO = 1e4


def _isolate_cwd(tag, seed):
    """Both implementations fall back to a RELATIVE .vihds_cache best-val
    cache when no Trainer is configured (reference vihds/utils.py:101);
    concurrent runs sharing a cwd would clobber each other's cache, so give
    every run its own scratch cwd."""
    d = tempfile.mkdtemp(prefix="pp_%s_seed%d_" % (tag, seed))
    os.chdir(d)


def _save(out_dir, tag, seed, results):
    import numpy as np

    elbo = results.elbo
    if not float(elbo) == float(elbo) or abs(float(elbo)) > DIVERGED_ELBO:
        out_dir = os.path.join(out_dir, "diverged")  # outside compare()'s glob
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "%s_seed%d.npz" % (tag, seed))
    np.savez(
        path,
        q_names=np.array(list(results.q_names), dtype=object),
        q_values=np.array(
            [np.asarray(v, dtype=np.float64) for v in results.q_values], dtype=object
        ),
        elbo=float(elbo),
        # posterior-predictive moments on the validation set [n_val, 4, T] —
        # the parameterisation-independent face of the posterior
        iw_predict_mu=np.asarray(results.iw_predict_mu, dtype=np.float64),
        iw_predict_std=np.asarray(results.iw_predict_std, dtype=np.float64),
        allow_pickle=True,
    )
    print("saved %s (best-val elbo %.2f)" % (path, float(elbo)))


def run_reference(seed, epochs, out_dir, spec):
    _isolate_cwd("reference", seed)
    sys.path.insert(0, HERE)
    import bench_reference  # installs munch/torchdiffeq shims on import

    sys.path.insert(0, bench_reference.REFERENCE)
    os.environ["INFERENCE_DATA_DIR"] = os.path.join(bench_reference.REFERENCE, "data")

    import numpy as np
    import vihds.datasets as ref_datasets

    # ragged-merge fix (modern numpy crashes on the reference's np.array of
    # unequal-length lists; same shim as tools/train_reference.py)
    def merge_observations(times_list, observations_list):
        times_arr, obs_arr = list(times_list), list(observations_list)
        loc = int(np.argmin([len(t) for t in times_arr]))
        chosen = times_arr[loc]
        for i, (t, obs) in enumerate(zip(times_arr, obs_arr)):
            obs_arr[i] = obs[:, :, [ref_datasets.find_nearest(t, ti) for ti in chosen]]
        return chosen, np.concatenate(obs_arr)

    ref_datasets.merge_observations = merge_observations

    if os.environ.get("VIHDS_REF_SCORE_SAMPLED"):
        # EXPLOIT CONTROL (VERDICT r2 #1): the reference scores log q / log p
        # at the CLIPPED theta (reference vihds/vae.py:34 feeds clipped theta
        # to the decoder, and training.py:136-137 scores the theta the
        # forward returns), which admits the runaway -log q exploit once the
        # encoder pushes q-mass past the +-4 sigma clip bound.  This shim
        # makes the reference score at the SAMPLED theta — exactly this
        # repo's semantics (vihds_tpu/vae.py:70-78) — while the decoder still
        # integrates the clipped value.  Identical whenever clipping is
        # inactive.  On specs WITH device conditioning (dr_constant_icml) the
        # native reference additionally scores log q at the CONDITIONED theta
        # (vihds/vae.py:35 returns the decoder's conditioned_theta); this
        # shim scores at the sampled theta there too — again exactly this
        # repo's objective, so shimmed-reference-vs-ours is the
        # matched-objective comparison on every spec.  (Measured round 3:
        # the NATIVE reference diverges on dr_constant_icml seed 0 — ELBO
        # +2.9e19 by epoch 160, reports/icml_parity/*_native_DIVERGED.log —
        # so the native objective has no usable headline-config readout.)
        import vihds.vae as ref_vae

        def _forward_score_sampled(self, data, samples, writer=None, epoch=None):
            u = self.sample_u(len(data.inputs), samples)
            q = self.encoder(data)
            theta = q.sample(u, self.device)
            clipped_theta = self.encoder.p.clip(theta, stddevs=4)
            result, _conditioned = self.decoder(clipped_theta, data, writer, epoch)
            return result, theta, q, self.encoder.p

        ref_vae.BaseVAE.forward = _forward_score_sampled
        print("[posterior_parity] exploit-control shim ACTIVE: log q/log p at sampled theta")

    from vihds.config import Config
    from vihds.run_xval import create_parser, run_on_split

    args = create_parser(True).parse_args([os.path.join(bench_reference.REFERENCE, "specs", spec)])
    args.seed = seed
    args.epochs = epochs
    args.test_epoch = int(os.environ.get("VIHDS_REF_TEST_EPOCH", "20"))
    args.plot_epoch = 0
    args.train_samples = 200
    # q moments are encoder outputs; K only adds eval cost
    args.test_samples = int(os.environ.get("VIHDS_REF_TEST_SAMPLES", "200"))
    args.split = int(os.environ.get("VIHDS_REF_SPLIT", str(args.split)))
    settings = Config(args)
    settings.trainer = None
    _, val_results = run_on_split(args, settings)
    _save(out_dir, "reference", seed, val_results)


def run_ours(seed, epochs, out_dir, spec):
    _isolate_cwd("ours", seed)
    sys.path.insert(0, REPO)
    os.environ.setdefault("INFERENCE_RESULTS_DIR", "/tmp/vihds_tpu_results")
    from vihds_tpu.config import Config
    from vihds_tpu.run_xval import create_parser, run_on_split

    args = create_parser(True).parse_args([os.path.join(REPO, "specs", spec)])
    args.seed = seed
    args.epochs = epochs
    args.test_epoch = int(os.environ.get("VIHDS_REF_TEST_EPOCH", "20"))
    args.plot_epoch = 0
    args.train_samples = 200
    args.test_samples = int(os.environ.get("VIHDS_REF_TEST_SAMPLES", "200"))
    settings = Config(args)
    settings.trainer = None
    if os.environ.get("VIHDS_OURS_Q_INIT"):
        # init-convention control: "unit" matches the reference's Q_Global
        # log-prec=0 init (see config.DEFAULT_PARAMS["q_global_init"])
        settings.params.q_global_init = os.environ["VIHDS_OURS_Q_INIT"]
        print("[posterior_parity] ours q_global_init = %s" % settings.params.q_global_init)
    _, val_results = run_on_split(args, settings)
    _save(out_dir, "ours", seed, val_results)


def _collect(out_dir, tag):
    import glob

    import numpy as np

    runs = []
    for path in sorted(glob.glob(os.path.join(out_dir, "%s_seed*.npz" % tag))):
        with np.load(path, allow_pickle=True) as z:
            runs.append(
                (
                    list(z["q_names"]),
                    list(z["q_values"]),
                    float(z["elbo"]),
                    np.asarray(z["iw_predict_mu"]) if "iw_predict_mu" in z else None,
                )
            )
    if not runs:
        raise SystemExit("no %s_seed*.npz under %s" % (tag, out_dir))
    return runs


def compare(out_dir, spec_label="dr_constant_one"):
    import numpy as np

    ref_runs = _collect(out_dir, "reference")
    our_runs = _collect(out_dir, "ours")
    names = ref_runs[0][0]
    assert names == our_runs[0][0], "q-site name sets differ"

    def stack(runs, i):
        return np.stack([np.atleast_1d(np.asarray(r[1][i], dtype=np.float64)) for r in runs])

    lines = [
        "# Posterior-moment parity: reference (torch CPU) vs this repo",
        "",
        "Spec %s, matched regime (epochs, K, LR schedule), %d+%d seeds."
        % (spec_label, len(ref_runs), len(our_runs)),
        "Same numpy-seeded split => local sites compare elementwise over the",
        "validation datapoints.  z = |mean_ref - mean_ours| / sqrt(se_ref^2 + se_ours^2)",
        "with se the across-seed standard error; 'pass' = median z over elements <= 3.",
        "",
        "| site tensor | arity | mean (ref) | mean (ours) | median z | max z | pass |",
        "|---|---|---|---|---|---|---|",
    ]
    n_pass = n_tot = 0
    for i, name in enumerate(names):
        if name.endswith(".value"):
            continue  # constants
        R = stack(ref_runs, i)  # [seeds, arity]
        O = stack(our_runs, i)
        if R.shape[1] != O.shape[1]:
            lines.append("| %s | shape mismatch %s vs %s | | | | | FAIL |" % (name, R.shape, O.shape))
            n_tot += 1
            continue
        mr, mo = R.mean(0), O.mean(0)
        se = np.sqrt(R.var(0, ddof=1) / R.shape[0] + O.var(0, ddof=1) / O.shape[0])
        z = np.abs(mr - mo) / np.maximum(se, 1e-12)
        ok = float(np.median(z)) <= 3.0
        n_pass += ok
        n_tot += 1
        lines.append(
            "| %s | %d | %.4f | %.4f | %.2f | %.2f | %s |"
            % (name, R.shape[1], mr.mean(), mo.mean(), np.median(z), z.max(), "yes" if ok else "NO")
        )
    lines += [
        "",
        "**%d / %d site tensors within MC error (median z <= 3).**" % (n_pass, n_tot),
        "",
        "Best-val ELBO per seed — reference: %s; ours: %s"
        % ([round(r[2], 1) for r in ref_runs], [round(r[2], 1) for r in our_runs]),
        "",
    ]

    # Posterior-predictive parity: the parameterisation-independent face of
    # the posterior (q-precision sites at this horizon mostly reflect each
    # implementation's INIT convention — ours starts q at the prior
    # precision, the reference at unit precision — so the predictive
    # comparison is the decisive correctness check).
    if ref_runs[0][3] is not None and our_runs[0][3] is not None:
        Rp = np.stack([r[3] for r in ref_runs])  # [seeds, n_val, 4, T]
        Op = np.stack([r[3] for r in our_runs])
        if Rp.shape[1:] == Op.shape[1:]:
            mr, mo = Rp.mean(0), Op.mean(0)
            se = np.sqrt(Rp.var(0, ddof=1) / Rp.shape[0] + Op.var(0, ddof=1) / Op.shape[0])
            z = np.abs(mr - mo) / np.maximum(se, 1e-12)
            scale = np.maximum(np.abs(mr).max(axis=(0, 2), keepdims=True), 1e-12)
            rel = np.abs(mr - mo) / scale
            lines += [
                "## Posterior-predictive parity (validation set, %d series x 4 signals x %d times)"
                % mr.shape[::2],
                "",
                "| signal | median z | 90th pct z | median rel err | max rel err |",
                "|---|---|---|---|---|",
            ]
            for s, sig in enumerate(["OD", "mRFP1", "EYFP", "ECFP"]):
                zs, rs = z[:, s, :], rel[:, s, :]
                lines.append(
                    "| %s | %.2f | %.2f | %.4f | %.4f |"
                    % (sig, np.median(zs), np.percentile(zs, 90), np.median(rs), rs.max())
                )
            ok_pred = float(np.median(z)) <= 3.0
            lines += [
                "",
                "**Predictive means %s within MC error (overall median z = %.2f; "
                "median relative error = %.4f).**"
                % ("agree" if ok_pred else "DISAGREE", np.median(z), np.median(rel)),
                "",
            ]
        else:
            lines += ["(predictive shapes differ: %s vs %s)" % (Rp.shape, Op.shape), ""]
    report = "\n".join(lines)
    out = os.path.join(out_dir, "REPORT.md")
    with open(out, "w") as f:
        f.write(report)
    print(report)
    print("written to", out)


def main():
    mode = sys.argv[1]
    if mode == "compare":
        compare(
            sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT,
            sys.argv[3] if len(sys.argv) > 3 else "dr_constant_one",
        )
        return
    seed = int(sys.argv[2])
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else DEFAULT_EPOCHS
    out_dir = os.path.abspath(sys.argv[4] if len(sys.argv) > 4 else DEFAULT_OUT)
    spec = sys.argv[5] if len(sys.argv) > 5 else DEFAULT_SPEC
    {"reference": run_reference, "ours": run_ours}[mode](seed, epochs, out_dir, spec)


if __name__ == "__main__":
    main()
