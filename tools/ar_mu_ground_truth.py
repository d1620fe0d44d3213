"""aR.mu decisive experiment (VERDICT r3 #4): is the one failing parity site
a small systematic q bias, or basin statistics with a faithful q?

The cross-implementation battery (reports/posterior_parity_ctrl_unit) left
aR.mu open: reference seeds mean -0.45 (sd 0.35), ours +0.12 (sd 0.41) —
overlapping per-seed distributions whose means differ by ~1.5 per-seed sd.
Two hypotheses the battery cannot separate:

  (a) optimizer-path statistics: each run parks in a seed-dependent basin
      along a near-flat direction; q faithfully reports the posterior OF ITS
      OWN BASIN, and only the basin distribution differs between stacks;
  (b) a small systematic q bias in one implementation: q misreports the
      posterior its own trained decoder defines.

This tool separates them by computing, per trained seed, the GROUND-TRUTH
posterior of aR under that seed's own decoder: the pooled hierarchical HMC
(refine.hmc_refine_pooled — exact joint p(shared, locals | all train
series), one shared state per chain) sampled long, with split-R-hat
monitoring on the aR coordinate.  If q(aR) matches its own HMC posterior
within MC error at every seed, (a) is confirmed and aR.mu closes as a
basin-distribution shift; a consistent q-vs-HMC offset would instead
establish (b) with the sign naming the biased stack.  aS — the identically
specified site that PASSES the battery (z = 0.28) — runs as the control.

Regime matches the ctrl_unit battery (dr_constant_one, 1000 epochs,
K_train=200, unit global-q init, same numpy-seeded split).

Usage:
  python tools/ar_mu_ground_truth.py run <seed> [out_dir] [n_steps]
  python tools/ar_mu_ground_truth.py report [out_dir]
"""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
DEFAULT_OUT = os.path.join(REPO, "reports", "ar_mu_ground_truth")
# Round 5 (VERDICT r4 #2): the tool generalises to any spec/site list so the
# same per-basin yardstick can point at the icml battery's two SHIFTED sites
# (aYFP.mu, KGS_81.prec) — e.g.
#   VIHDS_ARMU_SPEC=dr_constant_icml.yaml VIHDS_ARMU_SITES=aYFP,KGS_81 \
#     python tools/ar_mu_ground_truth.py run 0 reports/icml_site_ground_truth
SITES = tuple(os.environ.get("VIHDS_ARMU_SITES", "aR,aS").split(","))
SPEC = os.environ.get("VIHDS_ARMU_SPEC", "dr_constant_one.yaml")


def split_rhat(x):
    """Split-R-hat over [n_samples, n_chains] draws."""
    import numpy as np

    n = (x.shape[0] // 2) * 2
    halves = np.concatenate([x[: n // 2], x[n // 2: n]], axis=1)  # [n/2, 2C]
    m = halves.shape[1]
    cm = halves.mean(axis=0)
    W = halves.var(axis=0, ddof=1).mean()
    B = halves.shape[0] * cm.var(ddof=1) if m > 1 else 0.0
    var_plus = (halves.shape[0] - 1) / halves.shape[0] * W + B / halves.shape[0]
    return float(np.sqrt(var_plus / max(W, 1e-30)))


def run(seed, out_dir, n_steps=3000):
    import tempfile

    import numpy as np
    import jax

    os.chdir(tempfile.mkdtemp(prefix="armu_seed%d_" % seed))  # isolate .vihds_cache

    from vihds_tpu.profiling import enable_compile_cache

    enable_compile_cache()  # TPU-only no-op on CPU; seeds share the compiles

    from vihds_tpu import refine
    from vihds_tpu.config import Config
    from vihds_tpu.data.datasets import build_datasets
    from vihds_tpu.prob import ParamProgram, parse_parameters
    from vihds_tpu.run_xval import create_parser
    from vihds_tpu.training import Training, batch_arrays
    from vihds_tpu.vae import VAE

    os.makedirs(out_dir, exist_ok=True)
    args = create_parser(True).parse_args([os.path.join(REPO, "specs", SPEC)])
    args.seed = seed
    args.epochs = int(os.environ.get("VIHDS_ARMU_EPOCHS", "1000"))  # smoke hook
    args.test_epoch = 20
    args.plot_epoch = 0
    args.train_samples = 200
    args.test_samples = 200
    settings = Config(args)
    settings.trainer = None
    settings.params.q_global_init = "unit"  # the ctrl_unit battery convention

    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    training = Training(args, settings, data, program, model)
    results = training.run()
    params = training.final_params

    host = data.train.batch()
    batch = batch_arrays(host)
    q = model.encoder(params["enc"], batch)
    q_mu = np.asarray(q.mu)
    q_prec = np.asarray(q.prec)

    sampler = os.environ.get("VIHDS_ARMU_SAMPLER", "perseries")
    if sampler == "perseries":
        # THE matched yardstick.  Amortised VI with per-series ELBO/IWAE
        # terms does NOT target the pooled posterior for a shared site: at
        # stationarity q* minimises sum_s KL(q || p(. | x_s)), whose
        # Gaussian solution is the KL-barycenter — mean = the
        # precision-weighted average of per-series posterior means,
        # variance = the harmonic mean of per-series posterior variances.
        # So q(aR) is compared against the barycenter of the PER-SERIES
        # posteriors, each sampled exactly by the per-series HMC
        # (hmc_refine: one independent chain per (series, chain), all
        # sites move, shared sites duplicated per series — exactly
        # p(theta | x_s)).  The pooled-posterior routes are the wrong
        # yardstick AND intractable here: the pooled geometry is an
        # extreme shared-locals ridge (joint HMC split-R-hat ~22,
        # q-preconditioned ~23; Gibbs conditional-crawl R-hat ~55; the
        # pseudo-marginal estimator carries ~20+ nats of per-series IS
        # noise) — all three negative results are kept in the npz history
        # and REPORT for the record.
        res = refine.hmc_refine(
            model, program, params, batch, jax.random.PRNGKey(seed + 101),
            n_chains=16, n_steps=int(n_steps),
            n_leapfrog=int(os.environ.get("VIHDS_ARMU_LEAPFROG", "5")),
            init_inflate=float(os.environ.get("VIHDS_ARMU_INFLATE", "1.0")),
            mass_from_q=bool(int(os.environ.get("VIHDS_ARMU_MASSQ", "0"))),
            adapt_mass=bool(int(os.environ.get("VIHDS_ARMU_ADAPTMASS", "0"))),
            return_trace=True,
        )
        nw = int(res.n_warmup)
        # fetch the trace in ~200-step slabs: one multi-GB transfer can
        # crash the axon tunnel worker (observed at 1 GB, round 5); slab
        # latency overhead is ~100 ms each — noise at this size
        zt = res.z_trace
        ztr_all = np.concatenate(
            [np.asarray(zt[i: i + 200]) for i in range(0, zt.shape[0], 200)], axis=0
        )                                          # [S_tot, B, K, n]
        ztr = ztr_all[nw:]                         # [S, B, K, n]
        out = {
            "seed": seed,
            "best_val_elbo": float(np.asarray(results.elbo)) if results is not None else np.nan,
            "accept": float(np.asarray(res.accept_rate).mean()),
            "n_steps": int(n_steps),
            "sampler": sampler,
        }
        arrays = {}
        q_sd_all = 1.0 / np.sqrt(q_prec)
        for name in SITES:
            i = program.index[name]
            d = ztr[:, :, :, i]                    # [S, B, K]
            mu_s = d.mean(axis=(0, 2))             # per-series posterior means
            var_s = d.var(axis=(0, 2))             # per-series posterior vars
            w = 1.0 / np.maximum(var_s, 1e-12)
            bary = float((w * mu_s).sum() / w.sum())
            bary_sd = float(np.sqrt(d.shape[1] / w.sum()))  # harmonic-mean sd
            # per-series chain diagnostics; the gate uses the WORST series
            rhats, esss, mcses = [], [], []
            for b in range(d.shape[1]):
                db = d[:, b, :]                    # [S, K]
                rhats.append(split_rhat(db))
                e = _ess(db)
                esss.append(e)
                mcses.append(float(db.std() / max(np.sqrt(e), 1.0)))
            w_n = w / w.sum()
            out["%s_q_mu" % name] = float(q_mu[:, i].mean())
            out["%s_q_sd" % name] = float(q_sd_all[:, i].mean())
            out["%s_hmc_mean" % name] = bary
            out["%s_hmc_sd" % name] = bary_sd
            out["%s_hmc_mcse" % name] = float(
                np.sqrt((w_n ** 2 * np.asarray(mcses) ** 2).sum())
            )
            out["%s_rhat" % name] = float(np.max(rhats))
            out["%s_hmc_ess" % name] = float(np.min(esss))
            arrays["%s_ens_mu" % name] = ztr_all[:, :, :, i].mean(axis=(1, 2))
            arrays["%s_series_mu" % name] = mu_s
            arrays["%s_series_sd" % name] = np.sqrt(var_s)
            arrays["%s_series_rhat" % name] = np.asarray(rhats)
            arrays["%s_series_ess" % name] = np.asarray(esss)
            # barycenter restricted to converged series (sensitivity check:
            # a few non-mixed series must not be what moves the verdict)
            okb = (np.asarray(rhats) < 1.05) & (np.asarray(esss) >= 100)
            if okb.any():
                out["%s_hmc_mean_conv" % name] = float(
                    (w[okb] * mu_s[okb]).sum() / w[okb].sum()
                )
                # barycenter sd over converged series (prec-moment yardstick:
                # q* precision = mean of per-series posterior precisions)
                out["%s_hmc_sd_conv" % name] = float(
                    np.sqrt(okb.sum() / w[okb].sum())
                )
                out["%s_n_conv" % name] = int(okb.sum())
        path = os.path.join(out_dir, "seed%d.npz" % seed)
        np.savez(path, **out, **arrays)
        print({k: (round(v, 4) if isinstance(v, float) else v) for k, v in out.items()})
        print("saved", path)
        return
    if sampler == "gibbs":
        # Exact-joint Gibbs (no importance sampling): locals by per-series
        # HMC given shared, shared by adaptive MH given locals.  The PM
        # route drowns in per-series importance-weight variance here
        # (~20+ nats measured; particles almost never refresh), and the
        # joint pooled HMC random-walks (split-R-hat ~22) — the Gibbs
        # conditionals avoid both failure modes.
        res = refine.gibbs_refine_pooled(
            model, program, params, batch, jax.random.PRNGKey(seed + 101),
            devices=host.devices, n_chains=16, n_sweeps=int(n_steps),
            n_leapfrog=int(os.environ.get("VIHDS_ARMU_LEAPFROG", "10")),
            return_trace=True,
        )
        trace_c = res.state_trace["c"]
    elif sampler == "pm":
        # Correlated pseudo-marginal MH over the shared tier: the locals are
        # integrated out by IS from the trained q, so the 27-dim shared
        # block mixes by adaptive random walk — the pooled joint HMC
        # random-walks on this posterior (split-R-hat ~22 at 3000 steps;
        # the global block cannot move without coordinated local moves).
        res = refine.pm_refine_shared(
            model, program, params, batch, jax.random.PRNGKey(seed + 101),
            devices=host.devices, n_chains=16, n_steps=int(n_steps),
            n_particles=int(os.environ.get("VIHDS_ARMU_PARTICLES", "64")),
            rho=float(os.environ.get("VIHDS_ARMU_RHO", "0.98")),
            return_trace=True,
        )
        trace_c = res.state_trace["c"]
    else:
        res = refine.hmc_refine_pooled(
            model, program, params, batch, jax.random.PRNGKey(seed + 101),
            devices=host.devices, n_chains=16, n_steps=int(n_steps),
            n_leapfrog=int(os.environ.get("VIHDS_ARMU_LEAPFROG", "16")),
            step_scale=0.1, mass_from_q=True, return_trace=True,
        )
        trace_c = res.state_trace["c"]
    nw = int(res.n_warmup)
    tc_all = np.asarray(trace_c)  # [S_total, D, K, nC] incl. warmup
    tc = tc_all[nw:]  # [S, D, K, nC]
    csl = program.global_cond_slice
    gc_names = [program.names[i] for i in range(csl.start, csl.stop)]
    out = {
        "seed": seed,
        "best_val_elbo": float(np.asarray(results.elbo)) if results is not None else np.nan,
        "accept": float(np.asarray(res.accept_rate).mean()),
        "n_steps": int(n_steps),
        "sampler": sampler,
    }
    if "accept_rate_u" in res:
        out["accept_u"] = float(np.asarray(res.accept_rate_u).mean())
    arrays = {}
    for name in SITES:
        i = program.index[name]
        ic = i - csl.start
        assert gc_names[ic] == name
        draws = tc[:, 0, :, ic]  # [S, K] z-space (z = log theta for LogNormal)
        out["%s_q_mu" % name] = float(q_mu[:, i].mean())
        out["%s_q_sd" % name] = float((1.0 / np.sqrt(q_prec[:, i])).mean())
        out["%s_hmc_mean" % name] = float(draws.mean())
        out["%s_hmc_sd" % name] = float(draws.std())
        # MCSE via ESS from lag-1..L autocorrelation of the pooled chains
        ac = _ess(draws)
        out["%s_hmc_ess" % name] = ac
        out["%s_hmc_mcse" % name] = float(draws.std() / max(np.sqrt(ac), 1.0))
        out["%s_rhat" % name] = split_rhat(draws)
        # ensemble-stationarity diagnostic: chains start AT q, and the
        # kernel leaves the exact posterior invariant — if q were the
        # posterior, the cross-chain ensemble mean would be flat in
        # expectation at every step (warmup included); a systematic drift
        # away from q's mean exposes a q bias with its sign, independently
        # of full convergence.
        arrays["%s_ens_mu" % name] = tc_all[:, 0, :, ic].mean(axis=1)
    path = os.path.join(out_dir, "seed%d.npz" % seed)
    np.savez(path, **out, **arrays)
    print({k: (round(v, 4) if isinstance(v, float) else v) for k, v in out.items()})
    print("saved", path)


def _ess(draws):
    """Effective sample size over [S, K] chains (Geyer initial positive)."""
    import numpy as np

    S, K = draws.shape
    x = draws - draws.mean(axis=0, keepdims=True)
    # mean autocorrelation across chains
    var = (x ** 2).mean()
    if var <= 0:
        return float(S * K)
    rho_sum = 0.0
    for lag in range(1, min(S - 1, 500)):
        r = (x[:-lag] * x[lag:]).mean() / var
        if r < 0.01:
            break
        rho_sum += r
    return float(S * K / (1.0 + 2.0 * rho_sum))


def report(out_dir):
    import glob

    import numpy as np

    lines = [
        "# %s ground truth: q vs the per-series-posterior KL-barycenter, per trained seed"
        % "/".join(SITES),
        "",
        ("Regime: %s, 1000 ep, K=200, unit " % SPEC) +
        "init; values in z-space (z = log theta).  Yardstick: amortised "
        "VI with per-series ELBO terms targets, for a shared site, the "
        "KL-barycenter of the per-series posteriors (mean = "
        "precision-weighted average of per-series posterior means, sd = "
        "harmonic-mean posterior sd), NOT the pooled posterior — so each "
        "seed's q(site) is compared against the barycenter of exact "
        "per-series HMC posteriors under that seed's OWN decoder "
        "(refine.hmc_refine, one independent chain per series; R-hat is "
        "the WORST series, ESS the SMALLEST).  aS is the "
        "identically-specified control site that PASSES the "
        "cross-implementation battery.  (The pooled posterior is both the "
        "wrong target and intractable here: joint HMC split-R-hat ~22, "
        "Gibbs conditional-crawl ~55, pseudo-marginal IS noise 20+ nats — "
        "see REPORT history.)",
        "",
        "| seed | site | q mu | q sd | HMC bary (all) | bary (converged series) +- MCSE | HMC sd | |q-conv|/HMC sd | q sd / bary sd (conv) | n_conv | worst R-hat | min ESS |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    gaps = {s: [] for s in SITES}
    n_series_note = None
    for path in sorted(glob.glob(os.path.join(out_dir, "seed*.npz"))):
        z = np.load(path)
        for s in SITES:
            # Convergence gate is PER SERIES, not per seed: the per-series
            # sampler runs one independent chain ensemble per series, so a
            # few non-mixed series must not discard the seed — the verdict
            # barycenter uses only series with split-R-hat < 1.05 and
            # ESS >= 100 (*_hmc_mean_conv, computed at run time), and the
            # table reports how many series that is (n_conv).  A seed is
            # excluded only if NO series converged.
            conv_key = "%s_hmc_mean_conv" % s
            has_conv = conv_key in z.files
            mean_conv = float(z[conv_key]) if has_conv else np.nan
            n_conv = int(z["%s_n_conv" % s]) if has_conv else 0
            n_total = (
                len(np.asarray(z["%s_series_rhat" % s]))
                if "%s_series_rhat" % s in z.files else None
            )
            if n_total is not None:
                n_series_note = n_total
            gap = abs(float(z["%s_q_mu" % s]) - mean_conv)
            rel = gap / max(float(z["%s_hmc_sd" % s]), 1e-12)
            sd_conv_key = "%s_hmc_sd_conv" % s
            sd_ratio = (
                float(z["%s_q_sd" % s]) / max(float(z[sd_conv_key]), 1e-12)
                if sd_conv_key in z.files else np.nan
            )
            if has_conv:
                gaps[s].append((gap, rel, n_conv, sd_ratio))
            lines.append(
                "| %d | %s | %.3f | %.3f | %.3f | %s +- %.3f | %.3f | %s | %s | %s | %.3f | %.0f |%s"
                % (int(z["seed"]), s, z["%s_q_mu" % s], z["%s_q_sd" % s],
                   z["%s_hmc_mean" % s],
                   ("%.3f" % mean_conv) if has_conv else "—",
                   z["%s_hmc_mcse" % s], z["%s_hmc_sd" % s],
                   ("%.2f" % rel) if has_conv else "—",
                   ("%.2f" % sd_ratio) if np.isfinite(sd_ratio) else "—",
                   "%d%s" % (n_conv, "/%d" % n_total if n_total else ""),
                   z["%s_rhat" % s], z["%s_hmc_ess" % s],
                   "" if has_conv else " GATE-FAIL (no converged series; excluded)")
            )
    lines.append("")
    if n_series_note:
        lines.append(
            "Gate: per-series (split-R-hat < 1.05 and ESS >= 100 per series' "
            "chain ensemble); the verdict column 'bary (converged series)' is "
            "the precision-weighted barycenter over ONLY the converged "
            "series.  The all-series barycenter is kept for comparison; "
            "where the two agree, the non-mixed series are not driving the "
            "verdict."
        )
        lines.append("")
    for s in SITES:
        if not gaps[s]:
            continue
        rels = [r for _, r, _, _ in gaps[s]]
        sdr = [x for _, _, _, x in gaps[s] if np.isfinite(x)]
        lines.append(
            "%s: mean |q - converged-series barycenter| = %.3f (%.2f posterior "
            "sd, converged series only; mean n_conv %.1f%s); "
            "cross-implementation battery shift for comparison: 0.57 (aR)."
            % (s, float(np.mean([g for g, _, _, _ in gaps[s]])),
               float(np.mean(rels)), float(np.mean([n for _, _, n, _ in gaps[s]])),
               ("; mean q-sd/bary-sd %.2f" % float(np.mean(sdr))) if sdr else "")
        )
    # Ensemble-stationarity drift: chains start AT q and the kernel leaves
    # the exact posterior invariant, so if q matched the posterior the
    # cross-chain ensemble mean would be flat (in expectation) at every
    # step.  Convergence-independent: a systematic early-steps drift away
    # from q's mean exposes a q bias with its sign even when R-hat has not
    # closed.  MCSE from the late-window step-to-step spread (conservative:
    # the ensemble mean is autocorrelated, so spread/sqrt(n_eff<n) is
    # larger than the naive SE; we quote the raw late-window sd instead).
    drift_lines = [
        "",
        "## Ensemble-stationarity drift (per seed, z-space)",
        "",
        "| seed | site | q mu | ens mean (first 5%) | ens mean (last 20%) | late sd(ens) | drift / HMC sd |",
        "|---|---|---|---|---|---|---|",
    ]
    have_any = False
    for path in sorted(glob.glob(os.path.join(out_dir, "seed*.npz"))):
        z = np.load(path)
        for s in SITES:
            key = "%s_ens_mu" % s
            if key not in z.files:
                continue
            have_any = True
            ens = np.asarray(z[key])
            n = ens.shape[0]
            early = float(ens[: max(n // 20, 1)].mean())
            late_w = ens[-max(n // 5, 1):]
            late = float(late_w.mean())
            drift = (late - float(z["%s_q_mu" % s])) / max(float(z["%s_hmc_sd" % s]), 1e-12)
            drift_lines.append(
                "| %d | %s | %.3f | %.3f | %.3f | %.3f | %+.2f |"
                % (int(z["seed"]), s, z["%s_q_mu" % s], early, late,
                   float(late_w.std()), drift)
            )
    if have_any:
        lines.extend(drift_lines)
    report_path = os.path.join(out_dir, "REPORT.md")
    with open(report_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print("written to", report_path)


def main():
    mode = sys.argv[1]
    if mode == "report":
        report(os.path.abspath(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_OUT)
        return
    seed = int(sys.argv[2])
    out_dir = os.path.abspath(sys.argv[3]) if len(sys.argv) > 3 else DEFAULT_OUT
    n_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 3000
    run(seed, out_dir, n_steps)


if __name__ == "__main__":
    main()
