"""Simulation-based parameter-recovery study: simulate -> infer -> compare.

The gold-standard correctness check for an inference framework, impossible in
the reference (it has no data simulator and never persists weights): draw a
KNOWN ground truth from the model's own (tempered) prior, simulate a
plate-reader dataset from it (vihds_tpu/simulate.py), train the full amortised
VI stack on that dataset, then measure how well the recovered posterior covers
the truth —

  * per-site posterior z-scores  z = (q_mu - truth) * sqrt(q_prec)
    (log-space for LogNormal sites), with 95% credible-interval coverage;
  * across-series correlation between the amortised per-series posterior
    means and the per-series truth for LOCAL sites (identifiability of the
    amortisation itself);
  * posterior-predictive coverage: the fraction of observed points inside
    mu +- 1.96 sigma of the importance-weighted predictive distribution.

Writes REPORT.md + recovery.npz into --outdir.

Usage (the study regime; takes ~a minute on the TPU chip, longer on CPU):

  python tools/recovery_study.py --epochs 1000 --outdir reports/recovery_study
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p.add_argument("--spec", default=os.path.join(here, "specs", "dr_constant_one.yaml"))
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--test_epoch", type=int, default=50)
    p.add_argument("--train_samples", type=int, default=200)
    p.add_argument("--test_samples", type=int, default=1000)
    p.add_argument("--n_per_device", type=int, default=48)
    p.add_argument("--sigma_scale", type=float, default=0.5)
    p.add_argument(
        "--max_scaled",
        type=float,
        default=2.0,
        help="Condition the truth draw on the observable regime: redraw until the "
        "noiseless scaled trajectories peak at or below this (real data peaks at "
        "1.0 by construction); 0 disables the conditioning",
    )
    p.add_argument(
        "--calibrate_target",
        type=float,
        default=1.0,
        help="Gradient-calibrate the shared-block truth center to this probe peak "
        "before drawing (the dr_constant prior-predictive CENTER peaks at 6x the "
        "data scale, so rejection alone cannot reach the data regime); 0 disables",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--grad_clip_norm", type=float, default=10.0,
        help="Global-norm gradient clip for the training phase (default 10, "
        "the shipped inference-graph convention — NeuralPrecisions at the "
        "spec lr=0.01 blows up without it on off-regime data; 0 disables)",
    )
    p.add_argument("--folds", type=int, default=4, help="train on (folds-1)/folds of the data")
    p.add_argument(
        "--refine_chains",
        type=int,
        default=64,
        help="After the amortised comparison, HMC-refine the LOCAL sites per "
        "series (cut inference: shared sites stay integrated over the amortised "
        "q) with this many chains and re-measure truth coverage; 0 disables",
    )
    p.add_argument(
        "--refine_steps", type=int, default=200,
        help="HMC steps (first half is warmup+adaptation); raised from 60 "
        "after the r2 advisor flagged that short chains with ~0.95 "
        "acceptance may not have equilibrated — the REPORT now prints ESS / "
        "split-R-hat / displacement evidence either way",
    )
    p.add_argument(
        "--pooled_chains",
        type=int,
        default=32,
        help="Also run POOLED joint HMC (one shared-block state per chain "
        "across all series — the true hierarchical joint) and measure truth "
        "coverage under it; 0 disables",
    )
    p.add_argument("--pooled_steps", type=int, default=300)
    p.add_argument("--outdir", default=os.path.join(here, "reports", "recovery_study"))
    return p.parse_args()


def _ess_rhat_coord(x):
    """One scalar coordinate's kept draws ``x [S, C]`` across C chains ->
    (effective sample size, split-R-hat).  ESS uses the chain-averaged
    autocorrelation with an initial-positive-sequence cutoff; R-hat splits
    each chain in half (Gelman et al.)."""
    S, C = x.shape
    half = S // 2
    if half < 2:
        return float("nan"), float("nan")
    xs = np.concatenate([x[:half], x[half: 2 * half]], axis=1)  # [half, 2C]
    m, v = xs.mean(0), xs.var(0, ddof=1)
    W = float(v.mean())
    Bv = half * float(m.var(ddof=1))
    if W <= 0:
        return 0.0, (float("inf") if Bv > 0 else 1.0)
    var_hat = (half - 1) / half * W + Bv / half
    rhat = float(np.sqrt(var_hat / W))
    xc = x - x.mean(0, keepdims=True)
    s2 = float(x.var(0, ddof=1).mean())
    if s2 <= 0:
        return 0.0, rhat
    rho_sum = 0.0
    for t in range(1, min(S - 1, 100)):
        rho = float(np.mean((xc[:-t] * xc[t:]).sum(0) / (S - t)) / s2)
        if rho < 0.05:
            break
        rho_sum += rho
    return S * C / (1.0 + 2.0 * rho_sum), rhat


def mixing_summary(coords):
    """Aggregate ESS / split-R-hat over an iterable of [S, C] coordinate
    traces."""
    esss, rhats = [], []
    for x in coords:
        e, r = _ess_rhat_coord(np.asarray(x, np.float64))
        if np.isfinite(e):
            esss.append(e)
        if np.isfinite(r):
            rhats.append(r)
    if not esss:
        return None
    rh = np.asarray(rhats)
    return dict(
        ess_median=float(np.median(esss)),
        ess_min=float(np.min(esss)),
        rhat_max=float(rh.max()),
        rhat_frac_ok=float(np.mean(rh < 1.05)),
        n_coords=len(esss),
    )


def rms_displacement(z, z_init, prior_prec, cols):
    """|z - z_init| in PRIOR-SIGMA units over the moved columns: median and
    RMS.  Distinguishes 'chains equilibrated elsewhere' from 'chains barely
    left the amortised init' (r2 advisor)."""
    d = (np.asarray(z, np.float64) - np.asarray(z_init, np.float64)) * np.sqrt(
        np.asarray(prior_prec, np.float64)
    )[None, None, :]
    d = d[:, :, cols]
    return float(np.median(np.abs(d))), float(np.sqrt(np.mean(d ** 2)))


def site_comparisons(program, q_mu, q_prec, truth_theta):
    """Per-site z-scores of the truth under the recovered posterior.

    Normal-family sites only (LogNormal scores in log space — the (mu, prec)
    the encoder emits parameterise the underlying normal).  Returns
    [(name, tier, z[L] or z[()], corr-or-None), ...] for non-constant sites."""
    rows = []
    n_loc = program.local_slice.stop - program.local_slice.start
    n_gc = program.global_cond_slice.stop - program.global_cond_slice.start
    for i, name in enumerate(program.names):
        if bool(program.is_constant[i]) or bool(program.is_kumaraswamy[i]):
            continue
        t = truth_theta[:, i].astype(np.float64)
        t = np.log(np.maximum(t, 1e-30)) if program.is_lognormal[i] else t
        mu = q_mu[:, i].astype(np.float64)
        sd = 1.0 / np.sqrt(np.maximum(q_prec[:, i].astype(np.float64), 1e-30))
        if i < n_loc:
            tier = "local"
            z = (mu - t) / sd
            corr = float(np.corrcoef(mu, t)[0, 1]) if np.ptp(t) > 0 else None
        elif i < n_loc + n_gc:
            tier = "global_cond"
            z = np.array([(mu.mean() - t[0]) / max(sd.mean(), 1e-30)])
            corr = None
        else:
            tier = "global"
            z = np.array([(mu.mean() - t[0]) / max(sd.mean(), 1e-30)])
            corr = None
        rows.append((name, tier, z, corr))
    return rows


def main():
    args = parse()
    os.makedirs(args.outdir, exist_ok=True)
    os.environ.setdefault("INFERENCE_RESULTS_DIR", "/tmp/vihds_tpu_results")

    from vihds_tpu import simulate as sim
    from vihds_tpu.config import Config
    from vihds_tpu.data.datasets import build_datasets
    from vihds_tpu.prob import ParamProgram, parse_parameters
    from vihds_tpu.profiling import enable_compile_cache
    from vihds_tpu.run_xval import create_parser
    from vihds_tpu.training import Training
    from vihds_tpu.vae import VAE

    enable_compile_cache()

    print("=== 1/3 simulate (truth ~ tempered prior, sigma_scale=%.2f) ===" % args.sigma_scale)
    sim_args = sim.create_parser().parse_args(
        [
            args.spec,
            "--output_dir", args.outdir,
            "--name", "synthetic",
            "--seed", str(args.seed),
            "--sigma_scale", str(args.sigma_scale),
            "--n_per_device", str(args.n_per_device),
        ]
        + (["--max_scaled", str(args.max_scaled)] if args.max_scaled else [])
        + (["--calibrate_target", str(args.calibrate_target)] if args.calibrate_target else [])
    )
    out = sim.simulate(sim_args)
    program_fp = out.program

    print("=== 2/3 train on the synthetic spec ===")
    targs = create_parser(True).parse_args([out.spec])
    targs.seed = args.seed
    targs.epochs = args.epochs
    targs.test_epoch = args.test_epoch
    targs.plot_epoch = 0
    targs.train_samples = args.train_samples
    targs.test_samples = args.test_samples
    targs.folds = args.folds
    targs.split = 1
    if args.grad_clip_norm:
        targs.grad_clip_norm = args.grad_clip_norm
    settings = Config(targs)
    settings.trainer = None
    data = build_datasets(targs, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    training = Training(targs, settings, data, program, model)
    results = training.run()
    assert results is not None, "training produced no results (NaN abort?)"
    if not np.isfinite(np.asarray(training.final_params["enc"]["lin"]["w"])).all():
        raise SystemExit(
            "recovery_study: trained encoder parameters are non-finite "
            "(training NaN'd) — no report written; retry with a stronger "
            "--grad_clip_norm or a lower learning rate"
        )

    print("=== 3/3 evaluate on ALL series; compare to truth ===")
    import jax

    full_host = data.train.dataset.select(np.arange(len(data.train.dataset)))
    merged, _ = training.evaluate(
        training.final_params, full_host, args.test_samples,
        jax.random.PRNGKey(args.seed + 1), with_theta=False,
    )
    truth = np.load(out.truth, allow_pickle=True)
    # Score against the theta the data was actually GENERATED from: the
    # decoder integrates the +-4sigma-clipped draw (r2 advisor; identical to
    # "theta" whenever no coordinate saturated the clip).
    truth_theta = truth["theta_clipped"] if "theta_clipped" in truth else truth["theta"]
    if not np.isfinite(np.asarray(merged["q_mu"])).all():
        raise SystemExit(
            "recovery_study: recovered q is non-finite — no report written"
        )
    rows = site_comparisons(program, merged["q_mu"], merged["q_prec"], truth_theta)

    obs = full_host.observations
    lo = merged["iw_predict_mu"] - 1.96 * merged["iw_predict_std"]
    hi = merged["iw_predict_mu"] + 1.96 * merged["iw_predict_std"]
    pred_cover = float(np.mean((obs >= lo) & (obs <= hi)))

    # --- HMC refinement of the local sites (cut inference) ----------------- #
    refined_rows, refine_accept, z_refined = [], None, None
    refine_mix, refine_disp = None, None
    if args.refine_chains:
        import jax.numpy as jnp

        from vihds_tpu import refine
        from vihds_tpu.training import batch_arrays

        print(
            "=== 3b/3 HMC-refine local sites (%d chains x %d steps, shared "
            "sites ~ amortised q) ===" % (args.refine_chains, args.refine_steps)
        )
        movable = program.is_normal_family & ~program.is_constant
        local_mask = np.zeros(program.n_theta, np.float32)
        sl = program.local_slice
        local_mask[sl] = movable[sl].astype(np.float32)
        res = refine.hmc_refine(
            model, program, training.final_params, batch_arrays(full_host),
            jax.random.PRNGKey(args.seed + 2),
            n_chains=args.refine_chains, n_steps=args.refine_steps,
            site_mask=jnp.asarray(local_mask), return_trace=True,
        )
        z_refined = np.asarray(res.z)  # [L, chains, n_theta]
        refine_accept = float(np.asarray(res.accept_rate).mean())
        # mixing evidence (r2 advisor): ESS / split-R-hat from the kept
        # post-warmup trace, displacement from the amortised init
        kept = np.asarray(res.z_trace)[int(res.n_warmup):]  # [S, L, K, n]
        mov_cols = np.flatnonzero(local_mask)
        refine_mix = mixing_summary(
            kept[:, li, :, i] for li in range(kept.shape[1]) for i in mov_cols
        )
        refine_disp = rms_displacement(
            z_refined, np.asarray(res.z_init), program.prior_prec, mov_cols
        )
        amortised_cover = {
            name: 100 * float(np.mean(np.abs(np.atleast_1d(z)) < 1.96))
            for name, tier, z, _ in rows
            if tier == "local"
        }
        for i in np.flatnonzero(local_mask):
            name = program.names[i]
            t = truth_theta[:, i].astype(np.float64)
            t = np.log(np.maximum(t, 1e-30)) if program.is_lognormal[i] else t
            zi = z_refined[:, :, i].astype(np.float64)
            qlo = np.quantile(zi, 0.025, axis=1)
            qhi = np.quantile(zi, 0.975, axis=1)
            cover = 100 * float(np.mean((t >= qlo) & (t <= qhi)))
            zscore = (zi.mean(axis=1) - t) / np.maximum(zi.std(axis=1), 1e-30)
            corr = float(np.corrcoef(zi.mean(axis=1), t)[0, 1]) if np.ptp(t) > 0 else None
            refined_rows.append(
                (name, amortised_cover.get(name), cover,
                 float(np.median(np.abs(zscore))), corr)
            )

    # --- Pooled joint HMC over the full hierarchy -------------------------- #
    pooled_rows, pooled_accept = [], None
    z_pooled = None
    pooled_mix, pooled_disp = None, None
    if args.pooled_chains:
        import jax.numpy as jnp

        from vihds_tpu import refine
        from vihds_tpu.training import batch_arrays

        print(
            "=== 3c/3 pooled joint HMC (%d chains x %d steps, one shared "
            "state per chain) ===" % (args.pooled_chains, args.pooled_steps)
        )
        res_p = refine.hmc_refine_pooled(
            model, program, training.final_params, batch_arrays(full_host),
            jax.random.PRNGKey(args.seed + 3),
            devices=full_host.devices,
            n_chains=args.pooled_chains, n_steps=args.pooled_steps,
            return_trace=True,
        )
        pooled_accept = float(np.asarray(res_p.accept_rate).mean())
        z_pooled = np.asarray(res_p.z)  # [L, chains, n_theta]
        movable = program.is_normal_family & ~program.is_constant & ~program.is_truncated
        # mixing evidence on the pooled state leaves ({g,c,l} traces)
        nw = int(res_p.n_warmup)
        gsl_, csl_, lsl_ = program.global_slice, program.global_cond_slice, program.local_slice

        def pooled_coords():
            tg = np.asarray(res_p.state_trace["g"])[nw:]  # [S, K, nG]
            for i in np.flatnonzero(movable[gsl_]):
                yield tg[:, :, i]
            tc = np.asarray(res_p.state_trace["c"])[nw:]  # [S, D, K, nC]
            for d in range(tc.shape[1]):
                for i in np.flatnonzero(movable[csl_]):
                    yield tc[:, d, :, i]
            tl = np.asarray(res_p.state_trace["l"])[nw:]  # [S, L, K, nL]
            for li in range(tl.shape[1]):
                for i in np.flatnonzero(movable[lsl_]):
                    yield tl[:, li, :, i]

        pooled_mix = mixing_summary(pooled_coords())
        pooled_disp = rms_displacement(
            z_pooled, np.asarray(res_p.z_init), program.prior_prec,
            np.flatnonzero(movable),
        )
        n_loc = program.local_slice.stop - program.local_slice.start
        n_gc = program.global_cond_slice.stop - program.global_cond_slice.start
        for i in np.flatnonzero(movable):
            name = program.names[i]
            tier = "local" if i < n_loc else ("global_cond" if i < n_loc + n_gc else "global")
            t = truth_theta[:, i].astype(np.float64)
            t = np.log(np.maximum(t, 1e-30)) if program.is_lognormal[i] else t
            zi = z_pooled[:, :, i].astype(np.float64)
            qlo = np.quantile(zi, 0.025, axis=1)
            qhi = np.quantile(zi, 0.975, axis=1)
            cover = 100 * float(np.mean((t >= qlo) & (t <= qhi)))
            zscore = (zi.mean(axis=1) - t) / np.maximum(zi.std(axis=1), 1e-30)
            corr = (
                float(np.corrcoef(zi.mean(axis=1), t)[0, 1])
                if tier == "local" and np.ptp(t) > 0
                else None
            )
            pooled_rows.append(
                (name, tier, cover, float(np.median(np.abs(zscore))), corr)
            )

    all_z = np.concatenate([np.atleast_1d(z) for _, _, z, _ in rows])
    local_rows = [r for r in rows if r[1] == "local"]
    summary = dict(
        median_abs_z=float(np.median(np.abs(all_z))),
        coverage95=float(np.mean(np.abs(all_z) < 1.96)),
        predictive_coverage95=pred_cover,
        median_local_corr=float(
            np.median([c for _, _, _, c in local_rows if c is not None])
        ) if local_rows else None,
        val_elbo=float(results.elbo),
        epochs=args.epochs,
        seed=args.seed,
        sigma_scale=args.sigma_scale,
        n_series=int(obs.shape[0]),
    )
    if refined_rows:
        summary["refined_local_cover"] = float(np.mean([r[2] for r in refined_rows]))
        summary["refine_accept"] = refine_accept
        if refine_mix:
            summary.update({"refine_" + k: v for k, v in refine_mix.items()})
        if refine_disp:
            summary["refine_disp_median"], summary["refine_disp_rms"] = refine_disp
    if pooled_rows:
        loc_rows_p = [r for r in pooled_rows if r[1] == "local"]
        sh_rows_p = [r for r in pooled_rows if r[1] != "local"]
        if loc_rows_p:
            summary["pooled_local_cover"] = float(np.mean([r[2] for r in loc_rows_p]))
        if sh_rows_p:
            summary["pooled_shared_cover"] = float(np.mean([r[2] for r in sh_rows_p]))
        summary["pooled_accept"] = pooled_accept
        if pooled_mix:
            summary.update({"pooled_" + k: v for k, v in pooled_mix.items()})
        if pooled_disp:
            summary["pooled_disp_median"], summary["pooled_disp_rms"] = pooled_disp

    np.savez(
        os.path.join(args.outdir, "recovery.npz"),
        q_mu=merged["q_mu"],
        q_prec=merged["q_prec"],
        truth_theta=truth_theta,
        theta_names=np.array(program.names, dtype=object),
        iw_predict_mu=merged["iw_predict_mu"],
        iw_predict_std=merged["iw_predict_std"],
        observations=obs,
        **({"z_refined": z_refined} if z_refined is not None else {}),
        **({"z_pooled": z_pooled} if z_pooled is not None else {}),
        **{k: v for k, v in summary.items() if v is not None},
    )

    lines = [
        "# Parameter-recovery study (simulate -> infer -> compare)",
        "",
        "Spec `%s`; truth drawn from the tempered prior (sigma_scale=%.2f, seed=%d),"
        % (os.path.basename(args.spec), args.sigma_scale, args.seed),
        "conditioned on the observable regime%s by blocked rejection (noiseless "
        "scaled peak %.2f <= max_scaled %.1f; shared draw accepted on attempt "
        "%d, %d local redraw rounds; real data peaks at 1.0);"
        % (
            " around a gradient-calibrated shared center (probe peak %.2f, "
            "target %.1f — the spec's prior-predictive center sits at 6x the "
            "data scale)" % (float(truth["calibrated_peak"]), args.calibrate_target)
            if "calibrated_peak" in truth
            else "",
            float(truth["noiseless_peak"]), args.max_scaled,
            int(truth["truth_attempt"]), int(truth["local_rounds"]),
        )
        if args.max_scaled
        else "with NO regime conditioning (noiseless scaled peak %.2f; real data "
        "peaks at 1.0);" % float(truth["noiseless_peak"]),
        "%d synthetic series; trained %d epochs (K_train=%d, K_eval=%d, %d/%d split)."
        % (obs.shape[0], args.epochs, args.train_samples, args.test_samples,
           args.folds - 1, args.folds),
        "Pipeline: vihds_tpu/simulate.py -> the standard training stack -> "
        "posterior vs `synthetic_truth.npz`.",
        "",
        "## Headline",
        "",
        "| metric | value |",
        "|---|---|",
        "| median abs z (truth under recovered posterior) | %.2f |" % summary["median_abs_z"],
        "| 95%% credible-interval coverage of truth | %.1f%% |" % (100 * summary["coverage95"]),
        "| posterior-predictive 95%% coverage of data | %.1f%% |"
        % (100 * summary["predictive_coverage95"]),
        "| median across-series corr(q_mu, truth), local sites | %s |"
        % ("%.3f" % summary["median_local_corr"] if summary["median_local_corr"] is not None else "n/a"),
        "| final val IWAE-ELBO | %.1f |" % summary["val_elbo"],
    ] + (
        ["| HMC-refined local-site cover95 (mean) | %.1f%% |"
         % summary["refined_local_cover"]]
        if "refined_local_cover" in summary
        else []
    ) + (
        ["| pooled-joint-HMC cover95 (local mean / shared mean) | %.1f%% / %.1f%% |"
         % (summary.get("pooled_local_cover", float("nan")),
            summary.get("pooled_shared_cover", float("nan")))]
        if pooled_rows
        else []
    ) + [
        "",
        "z = (q_mu - truth) * sqrt(q_prec), log-space for LogNormal sites.",
        "",
        "## Per-site",
        "",
        "| site | tier | median z | median abs z | cover95 | corr(series) |",
        "|---|---|---|---|---|---|",
    ]
    for name, tier, z, corr in rows:
        z = np.atleast_1d(z)
        lines.append(
            "| %s | %s | %+.2f | %.2f | %.0f%% | %s |"
            % (
                name,
                tier,
                float(np.median(z)),
                float(np.median(np.abs(z))),
                100 * float(np.mean(np.abs(z) < 1.96)),
                "%.3f" % corr if corr is not None else "—",
            )
        )
    if refined_rows:
        lines += [
            "",
            "## HMC-refined local sites (cut inference: shared sites ~ amortised q)",
            "",
            "%d chains x %d steps per series from the amortised start "
            "(vihds_tpu.refine.hmc_refine with a local-sites mask); mean "
            "acceptance %.2f.  Truth coverage before vs after refinement:"
            % (args.refine_chains, args.refine_steps, refine_accept),
            "",
            "| site | amortised cover95 | refined cover95 | refined median abs z | refined corr |",
            "|---|---|---|---|---|",
        ]
        if refine_mix:
            lines[-4] += (
                "  Mixing evidence (kept post-warmup trace, %d coords): "
                "median ESS %.0f (min %.0f), max split-R-hat %.3f "
                "(%.0f%% of coords < 1.05); |z - z_init| in prior-sigma "
                "units: median %.2f, RMS %.2f." % (
                    refine_mix["n_coords"], refine_mix["ess_median"],
                    refine_mix["ess_min"], refine_mix["rhat_max"],
                    100 * refine_mix["rhat_frac_ok"],
                    refine_disp[0], refine_disp[1],
                )
            )
        for name, am_cov, cov, medz, corr in refined_rows:
            lines.append(
                "| %s | %s | %.0f%% | %.2f | %s |"
                % (
                    name,
                    "%.0f%%" % am_cov if am_cov is not None else "—",
                    cov,
                    medz,
                    "%.3f" % corr if corr is not None else "—",
                )
            )

    if pooled_rows:
        lines += [
            "",
            "## Pooled joint HMC (the true hierarchical posterior)",
            "",
            "%d chains x %d steps with ONE shared-block state per chain pooled "
            "across all %d series (refine.hmc_refine_pooled); mean acceptance "
            "%.2f.  Truth coverage under the exact joint the training objective "
            "bounds:" % (args.pooled_chains, args.pooled_steps, obs.shape[0], pooled_accept),
            "",
            "| site | tier | pooled cover95 | pooled median abs z | corr(series) |",
            "|---|---|---|---|---|",
        ]
        if pooled_mix:
            lines[-4] += (
                "  Mixing evidence (shared+local state trace, %d coords): "
                "median ESS %.0f (min %.0f), max split-R-hat %.3f "
                "(%.0f%% of coords < 1.05); |z - z_init| in prior-sigma "
                "units: median %.2f, RMS %.2f." % (
                    pooled_mix["n_coords"], pooled_mix["ess_median"],
                    pooled_mix["ess_min"], pooled_mix["rhat_max"],
                    100 * pooled_mix["rhat_frac_ok"],
                    pooled_disp[0], pooled_disp[1],
                )
            )
        for name, tier, cov, medz, corr in pooled_rows:
            lines.append(
                "| %s | %s | %.0f%% | %.2f | %s |"
                % (name, tier, cov, medz, "%.3f" % corr if corr is not None else "—")
            )

    lines += [
        "",
        "## Reading the table",
        "",
        "Global-tier sites are constrained by every series jointly, so |z| < 1.96",
        "with high cover95 is the expected signature of correct inference.  Local",
        "sites are informed only by their own series through the amortised encoder:",
        "corr(series) measures whether the encoder genuinely tracks the per-series",
        "truth, and cover95 exposes the well-documented overconfidence of amortised",
        "variational posteriors (compare the posterior-predictive coverage, which",
        "stays calibrated when the fit is good).  The HMC section separates the",
        "two possible causes: if refined coverage recovers toward 95%, the gap was",
        "the amortisation; if it does NOT move despite healthy mixing (the ESS /",
        "split-R-hat / displacement line above — acceptance alone does not show",
        "the chains equilibrated), the exact",
        "per-series posterior itself sits away from the truth — in a hierarchical",
        "model, small finite-data biases in the shared sites are compensated by",
        "the local conditionals, a property of the model/data pairing rather than",
        "an inference failure (the posterior-predictive coverage is the check",
        "that the fit itself is calibrated).",
        "",
        "Reproduce: `python tools/recovery_study.py --epochs %d --seed %d "
        "--sigma_scale %s --max_scaled %s --calibrate_target %s "
        "--n_per_device %d --refine_chains %d --refine_steps %d "
        "--pooled_chains %d --pooled_steps %d --outdir %s`"
        % (args.epochs, args.seed, args.sigma_scale, args.max_scaled,
           args.calibrate_target, args.n_per_device, args.refine_chains,
           args.refine_steps, args.pooled_chains, args.pooled_steps,
           args.outdir),
        "",
    ]
    with open(os.path.join(args.outdir, "REPORT.md"), "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
