"""Synthetic-data generation: sample the spec's generative model and write a
plate-reader CSV the full pipeline can train on.

The reference has no simulator — its generative half (prior -> ODE ->
observation noise) only ever runs inside the ELBO, so there is no way to
produce data with a KNOWN ground truth.  This module samples that generative
model directly:

  theta ~ p(theta)  (tier-faithful: local sites i.i.d. per series, global
                     sites one draw for the whole dataset,
                     global_conditioned sites one draw per device)
  x     = observe(ODE(theta, inputs))        on the source experiment's design
  y     = x + noise(precisions(theta))       Gaussian or Laplace per the spec

and writes three artifacts into ``--output_dir``:

  <name>.csv        plate-reader CSV in the exact layout procdata.load parses
                    (times row, condition strings, "(SIGNAL)" reading columns)
  <name>.yaml       derived spec: the source spec with ``files`` pointing at
                    the CSV, ``normalize`` pinned to the generation scales and
                    ``subtract_background: false`` — so the training pipeline
                    reproduces the simulated (scaled) observations exactly
                    instead of re-deriving data-dependent normalisation
  <name>_truth.npz  ground truth: per-series theta (sampled and clipped),
                    site names, decoder parameters, treatments, times, seed

The experimental DESIGN (devices, treatments, time grid) is taken from the
source spec's real CSVs so the synthetic data is realistic by construction;
``--n_per_device`` resamples the design down/up per device.

This closes the loop for simulation-based validation: train on the synthetic
spec and compare the recovered posterior against ``<name>_truth.npz``
(tools/recovery_study.py runs that end to end).

CLI::

  python -m vihds_tpu.simulate <spec.yaml> --output_dir DIR [--name synthetic]
      [--seed 0] [--sigma_scale 1.0] [--n_per_device N] [--max_scaled X]
      [--calibrate_target Y]

``--sigma_scale s`` tempers the prior for the TRUTH draw only (normal-family
sites sample with sigma*s): the headline specs put deliberately wide priors
on rate constants (sigma up to 3 in log space), where a full-width draw is
often dynamically degenerate; s<1 keeps the truth in the scientifically
plausible bulk while the trained model still uses the spec's own priors.
``--max_scaled X`` additionally conditions the truth draw on the OBSERVABLE
regime: noiseless scaled trajectories must peak at or below X.  An
unconditioned joint draw over ~30+ wide prior sites is almost always
dynamically extreme (measured on dr_constant_one at sigma_scale=0.5: every
one of 100 joint draws peaked 28-340x the real data's 1.0 scale), which puts
the synthetic dataset far outside the regime any fixed
architecture/learning-rate pairing is tuned for — and a joint accept/reject
over all series never terminates.  The conditioning is therefore a BLOCKED
rejection sampler matched to the sharing structure of the hierarchy
(``sample_truth_theta_in_regime``): shared global blocks are redrawn against
a probe dataset (locals at their prior mean), then each offending series'
local block is redrawn independently under the frozen shared draw, so
acceptance factorises per block and converges geometrically.

``--calibrate_target Y`` handles the case rejection alone cannot: when the
spec's prior-predictive CENTER is already far from the data scale (measured
on dr_constant_one: 6.0x, so P(probe peak <= 2) ~ 0), gradient descent
through the differentiable generative decode finds the smallest recentering
of the tempered prior whose probe trajectories peak at ~Y
(``calibrate_shared_center``); the blocked rejection then runs around that
center, and the recentering is recorded in the truth npz.
"""

import argparse
import csv
import os

import numpy as np
import yaml

from vihds_tpu import models
from vihds_tpu.config import Config
from vihds_tpu.data import procdata
from vihds_tpu.data.datasets import get_cassettes, merge_observations
from vihds_tpu.prob import ParamProgram, parse_parameters
from vihds_tpu.utils.attrdict import AttrDict


def create_parser():
    parser = argparse.ArgumentParser(description="VI-HDS-TPU synthetic-data simulator")
    parser.add_argument("yaml", type=str, help="Source spec (defines model, priors, design CSVs)")
    parser.add_argument("--output_dir", type=str, required=True, help="Directory for csv/yaml/npz")
    parser.add_argument("--name", type=str, default="synthetic", help="Basename for the artifacts")
    parser.add_argument("--seed", type=int, default=0, help="RNG seed (theta draw + noise)")
    parser.add_argument(
        "--sigma_scale",
        type=float,
        default=1.0,
        help="Temper the truth draw: normal-family prior sigmas scale by this factor",
    )
    parser.add_argument(
        "--n_per_device",
        type=int,
        default=None,
        help="Resample the design to N series per device (default: keep the source design)",
    )
    parser.add_argument(
        "--max_scaled",
        type=float,
        default=None,
        help="Condition the truth draw on the observable regime via blocked "
        "rejection: noiseless scaled trajectories must peak at or below this "
        "bound (real scaled data peaks at 1.0 by construction; default: accept "
        "any draw)",
    )
    parser.add_argument(
        "--calibrate_target",
        type=float,
        default=None,
        help="Gradient-calibrate the shared-block truth center so the probe "
        "trajectories peak at ~this value BEFORE drawing (use when the spec's "
        "prior-predictive sits far from the data scale; the truth distribution "
        "becomes the recentered tempered prior, recorded in the truth npz)",
    )
    # Config._tidy_args reads these training-loop fields; they are inert here.
    parser.set_defaults(epochs=0, test_epoch=0, plot_epoch=0)
    return parser


def load_design(settings):
    """The experimental design of the source spec's real data:
    (devices[L] int, treatments[L,C] raw, times[T]).  Uses the same
    merge-to-coarsest-grid rule as training."""
    parsed = [procdata.load(f, settings.data) for f in settings.data.files]
    parsed = [p for p in parsed if p is not None]
    if not parsed:
        raise SystemExit("No design rows for devices %s" % list(settings.data.devices))
    devices = np.concatenate([p[0] for p in parsed])
    treatments = np.concatenate([p[1] for p in parsed])
    times, _ = merge_observations([p[2] for p in parsed], [p[3] for p in parsed])
    return devices, treatments, np.asarray(times)


def resample_design(devices, treatments, n_per_device, seed):
    """N rows per device, sampled with replacement from that device's rows."""
    rng = np.random.RandomState(seed)
    keep = []
    for d in np.unique(devices):
        rows = np.flatnonzero(devices == d)
        keep.append(rng.choice(rows, size=n_per_device, replace=True))
    keep = np.concatenate(keep)
    return devices[keep], treatments[keep]


def _tied_normal_u(program, devices, key, center=None):
    """One u per (site, sharing unit): local sites i.i.d. per series, global
    (and constant) sites one draw for every series, global_conditioned sites
    one draw per device.  ``center`` (a [n_theta] vector, zero on local
    sites) recenters the draw: u = center + xi, xi ~ N(0, 1)."""
    import jax
    import jax.numpy as jnp

    L = len(devices)
    u = np.array(jax.random.normal(key, (L, 1, program.n_theta), jnp.float32))
    for sl in (program.global_slice, program.constant_slice):
        u[:, :, sl] = u[0:1, :, sl]
    for d in np.unique(devices):
        rows = np.flatnonzero(devices == d)
        u[rows, :, program.global_cond_slice] = u[rows[0], :, program.global_cond_slice]
    if center is not None:
        u += np.asarray(center, np.float32)[None, None, :]
    return u


def _shared_site_mask(program):
    mask = np.zeros(program.n_theta, bool)
    mask[program.global_slice] = True
    mask[program.global_cond_slice] = True
    return mask


def calibrate_shared_center(
    program, n_series, decode_diff, sigma_scale, target_peak,
    steps=200, lr=0.05, ridge=1e-3,
):
    """Gradient-calibrate the shared-block center of the truth draw so the
    probe dataset (locals at their prior mean) peaks at ~``target_peak``.

    A spec's prior-predictive can be badly mis-calibrated against the real
    data's scale: measured on dr_constant_one, the prior-CENTER trajectories
    peak at 6.0x the per-signal-max-normalised data (fluorescence channels),
    so conditioning the shared draw on peak <= 2 has acceptance 0/1000 — no
    amount of rejection sampling reaches the data regime.  Because the whole
    generative decode (theta -> ODE -> observe) is differentiable in JAX, we
    instead descend a center vector g over the shared sites minimising

        (log peak(g) - log target)^2 + ridge * |g|^2

    i.e. the SMALLEST recentering of the tempered prior that puts the probe
    trajectories at the data scale (the torch reference cannot express this:
    its generative half only exists inside the ELBO).  The truth distribution
    becomes the recentered tempered prior — u = g + xi per sharing unit —
    and is recorded in the truth npz (``u_center``, ``calibrated_peak``).

    Returns (center [n_theta] float32 — zero on local/constant sites,
    achieved probe peak)."""
    import jax
    import jax.numpy as jnp
    import optax

    shared = jnp.asarray(_shared_site_mask(program), jnp.float32)
    prec = np.where(
        program.is_normal_family,
        program.prior_prec / float(sigma_scale) ** 2,
        program.prior_prec,
    ).astype(np.float32)
    q_truth = AttrDict(
        mu=jnp.asarray(program.prior_mu)[None, :], prec=jnp.asarray(prec)[None, :]
    )

    def probe_peak(g):
        u = jnp.broadcast_to(
            (g * shared)[None, None, :], (n_series, 1, program.n_theta)
        )
        theta = program.sample(q_truth, u)
        clipped = program.clip(theta, stddevs=4)
        return jnp.max(jnp.abs(decode_diff(clipped)))

    def loss(g):
        pk = probe_peak(g)
        return (jnp.log(pk) - jnp.log(jnp.float32(target_peak))) ** 2 + ridge * jnp.sum(g * g)

    tx = optax.adam(lr)
    g = jnp.zeros(program.n_theta, jnp.float32)
    state = tx.init(g)

    @jax.jit
    def update(g, state):
        val, grads = jax.value_and_grad(loss)(g)
        upd, state = tx.update(grads, state, g)
        return optax.apply_updates(g, upd), state, val

    for _ in range(steps):
        g, state, _ = update(g, state)
    center = np.asarray(g * shared, np.float32)
    achieved = float(probe_peak(jnp.asarray(center)))
    print(
        "simulate: calibrated shared center |g|=%.2f, probe peak %.3f (target %.2f)"
        % (float(np.linalg.norm(center)), achieved, target_peak)
    )
    return center, achieved


def probe_peak_through(program, n_series, decode_fn, sigma_scale, center):
    """The calibration probe's peak through an ARBITRARY decode (e.g. the
    eval_mode decode that actually generates the data, when a spec's solver
    and eval_solver differ — r2 advisor: the calibrated peak must describe
    the generating decode, not just the train-solver one it was optimised
    through)."""
    import jax.numpy as jnp

    prec = np.where(
        program.is_normal_family,
        program.prior_prec / float(sigma_scale) ** 2,
        program.prior_prec,
    ).astype(np.float32)
    q_truth = AttrDict(
        mu=jnp.asarray(program.prior_mu)[None, :], prec=jnp.asarray(prec)[None, :]
    )
    u = jnp.broadcast_to(jnp.asarray(center)[None, None, :], (n_series, 1, program.n_theta))
    clipped = program.clip(program.sample(q_truth, u), stddevs=4)
    return float(np.max(np.abs(np.asarray(decode_fn(clipped)))))


def _theta_from_u(program, u, sigma_scale):
    """Push tied u through the spec's own sampling machinery (dependent sites
    and non-Normal kinds included), so the truth distribution is exactly the
    model's prior, tempered by ``sigma_scale`` on normal-family sigmas.
    Returns (theta, theta_clipped); the VAE's effective generative model
    decodes the +-4-sigma-clipped theta (clip bounds from the spec's
    UNtempered prior, like training)."""
    import jax.numpy as jnp

    prec = np.where(
        program.is_normal_family,
        program.prior_prec / float(sigma_scale) ** 2,
        program.prior_prec,
    ).astype(np.float32)
    q_truth = AttrDict(mu=program.prior_mu[None, :], prec=prec[None, :])
    theta = np.asarray(program.sample(q_truth, jnp.asarray(u)))  # [L, 1, n_theta]
    clipped = np.asarray(program.clip(jnp.asarray(theta), stddevs=4))
    return theta, clipped


def sample_truth_theta(program, devices, key, sigma_scale=1.0):
    """Tier-faithful prior draw (unconditioned on the observable regime)."""
    return _theta_from_u(program, _tied_normal_u(program, devices, key), sigma_scale)


def sample_truth_theta_in_regime(
    program, devices, key, sigma_scale, max_scaled, noiseless_fn,
    max_attempts=1000, max_rounds=50, center=None,
):
    """Blocked rejection: a tempered-prior draw conditioned on the observable
    regime (noiseless scaled trajectories peak at or below ``max_scaled``).

    A JOINT all-series rejection has vanishing acceptance: the shared rate
    constants dominate the dynamics and every series must stay in regime
    simultaneously (measured at sigma_scale=0.5 on dr_constant_one: 0/100
    joint draws accepted, peaks 28-340x the data scale).  Rejection is
    therefore blocked at the sharing structure of the hierarchy:

      Stage A: redraw the SHARED blocks (global / global_conditioned /
        constant) until the probe dataset — every series with its local
        sites at the prior mean (u_local = 0) — is in regime.
      Stage B: with the shared draw frozen, redraw each OFFENDING series'
        local block independently until its own trajectory is in regime.

    Acceptance factorises per block, so both stages converge geometrically.
    The truth distribution is the tempered prior conditioned, block by block,
    on the in-regime event (stage A on the probe event, stage B per series) —
    recorded in the truth npz so the study reports what it sampled.

    ``noiseless_fn(theta_clipped) -> x_predict [L, 1, S, T]`` must be the
    spec's own decode (jit it once; shapes are constant across attempts).
    Returns (theta, theta_clipped, stats dict)."""
    import jax

    # Stage A: shared blocks against the probe dataset
    loc = program.local_slice
    for attempt in range(max_attempts):
        k_a = jax.random.fold_in(key, attempt) if attempt else key
        u = _tied_normal_u(program, devices, k_a, center=center)
        u_probe = u.copy()
        u_probe[:, :, loc] = 0.0
        _, probe_clipped = _theta_from_u(program, u_probe, sigma_scale)
        probe_peak = float(np.max(np.abs(noiseless_fn(probe_clipped))))
        if probe_peak <= max_scaled:
            break
        if attempt < 5 or attempt % 25 == 0:
            print(
                "simulate: shared draw %d rejected (probe peak %.1f > max_scaled %.1f)"
                % (attempt, probe_peak, max_scaled)
            )
    else:
        raise SystemExit(
            "simulate: no in-regime SHARED draw in %d attempts; raise "
            "--max_scaled or lower --sigma_scale" % max_attempts
        )

    # Stage B: per-series local blocks under the frozen shared draw
    for rnd in range(max_rounds):
        theta, clipped = _theta_from_u(program, u, sigma_scale)
        x_predict = np.asarray(noiseless_fn(clipped))
        per_series_peak = np.max(np.abs(x_predict), axis=tuple(range(1, x_predict.ndim)))
        bad = per_series_peak > max_scaled
        if not bad.any():
            return theta, clipped, dict(
                truth_attempt=attempt,
                probe_peak=probe_peak,
                local_rounds=rnd,
                noiseless_peak=float(per_series_peak.max()),
            )
        print(
            "simulate: round %d — redrawing %d/%d local blocks (worst peak %.1f)"
            % (rnd, int(bad.sum()), len(bad), float(per_series_peak.max()))
        )
        fresh = _tied_normal_u(
            program, devices, jax.random.fold_in(k_a, 10000 + rnd), center=center
        )
        u[bad, :, loc] = fresh[bad, :, loc]
    raise SystemExit(
        "simulate: %d series still out of regime after %d local redraw rounds; "
        "raise --max_scaled or lower --sigma_scale" % (int(bad.sum()), max_rounds)
    )


def make_decoder(settings, program, devices, treatments, times, k_dec, eval_mode=True):
    """The spec's generative decode as a jitted function of theta alone.

    Design (dev_1hot, log-treatments, time grid) and decoder params are closed
    over; shapes are constant across rejection attempts, so the one compile is
    reused by every draw.  Returns (ode_model, params_dec,
    decode: theta_clipped[L,1,n_theta] -> (x_predict[L,1,S,T], precisions))."""
    import jax
    import jax.numpy as jnp

    ode_model = models.LOOKUP[settings.model](settings)
    condition_on_device = settings.data.device_depth > 1
    if not condition_on_device:
        ode_model.conditioned_params = ()
    params_dec = ode_model.init_params(k_dec)

    dev_1hot = jnp.asarray(get_cassettes(devices, settings.data))
    inputs_log = jnp.asarray(np.log1p(treatments).astype(np.float32))
    times_j = jnp.asarray(times.astype(np.float32))
    n_times = len(times)

    @jax.jit
    def decode(theta_clipped):
        th = program.theta_dict(theta_clipped)
        if condition_on_device:
            th = ode_model.condition_theta(params_dec, th, dev_1hot)
        x_solution = ode_model.simulate(
            params_dec, th, times_j, inputs_log, dev_1hot, n_iwae=1, eval_mode=eval_mode
        )
        x_states, precisions = ode_model.expand_precisions(
            params_dec, th, n_times, x_solution
        )
        return ode_model.observe(x_states, th), precisions  # [L, 1, S, T]

    return ode_model, params_dec, decode


def add_observation_noise(ode_model, x_predict, precisions, key):
    """Observation noise from the model's own precision sites.  Returns
    (obs[L,S,T] in SCALED model units, precisions[L,S,T])."""
    import jax
    import jax.numpy as jnp

    if ode_model.use_laplace:
        # log_prob_laplace is rate-parameterised: scale b = 1/precision
        eps = jax.random.laplace(key, x_predict.shape, x_predict.dtype) / precisions
    else:
        eps = jax.random.normal(key, x_predict.shape, x_predict.dtype) / jnp.sqrt(precisions)
    obs = np.asarray(x_predict + eps)[:, 0]  # [L, S, T]
    precisions = np.asarray(jnp.broadcast_to(precisions, x_predict.shape))[:, 0]
    return obs, precisions


def write_csv(path, settings, devices, treatments, times, raw_obs):
    """Plate-reader CSV in the layout procdata.load parses (see that module's
    docstring): row 0 after the header holds the observation times from
    column 5 on; each later row is one well."""
    signals = list(settings.data.signals)
    conditions = list(settings.data.conditions)
    name_of = settings.data.device_idx_to_device_name
    T = len(times)
    header = ["Content", "Colony", "Well Col", "Well Row", "Conditions"]
    col_id = 0
    for sig in signals:
        for _ in range(T):
            col_id += 1
            header.append("%d (%s)" % (col_id, sig))
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        # times row: one entry per reading column
        w.writerow(
            ["timesall", "", "", "", ""]
            + [repr(float(t)) for _ in signals for t in times]
        )
        for i in range(len(devices)):
            cond = ";".join(
                "%s=%s" % (c, repr(float(v))) for c, v in zip(conditions, treatments[i])
            )
            row = [name_of[int(devices[i])], 1, (i % 12) + 1, (i // 12) + 1, cond]
            for s in range(len(signals)):
                row.extend(repr(float(v)) for v in raw_obs[i, s])
            w.writerow(row)


def write_derived_spec(path, source_yaml, csv_path, scales):
    """The source spec with ``files`` -> the synthetic CSV (absolute path, so
    it resolves under any INFERENCE_DATA_DIR), ``normalize`` pinned to the
    generation scales and background subtraction off — the pipeline then
    reproduces the simulated scaled observations instead of re-deriving
    data-dependent normalisation from the synthetic draw."""
    with open(source_yaml) as f:
        spec = yaml.safe_load(f)
    spec["data"]["files"] = [os.path.abspath(csv_path)]
    spec["data"]["normalize"] = [float(s) for s in scales]
    spec["data"]["subtract_background"] = False
    with open(path, "w") as f:
        yaml.safe_dump(spec, f, sort_keys=False)


def simulate(args):
    """Run the simulator; returns AttrDict with every artifact path and the
    in-memory truth (theta, obs, ...)."""
    import jax

    settings = Config(args)
    program = ParamProgram(parse_parameters(settings.params))

    devices, treatments, times = load_design(settings)
    if args.n_per_device:
        devices, treatments = resample_design(devices, treatments, args.n_per_device, args.seed)

    import jax.numpy as jnp

    base_key = jax.random.PRNGKey(args.seed)
    k_theta, k_sim = jax.random.split(base_key)
    k_dec, k_noise = jax.random.split(k_sim)
    ode_model, params_dec, decode = make_decoder(
        settings, program, devices, treatments, times, k_dec
    )

    center = None
    stats = dict(truth_attempt=0, local_rounds=0)
    if args.calibrate_target:
        _, _, decode_diff = make_decoder(
            settings, program, devices, treatments, times, k_dec, eval_mode=False
        )
        center, calibrated_peak = calibrate_shared_center(
            program, len(devices), lambda c: decode_diff(c)[0],
            args.sigma_scale, args.calibrate_target,
        )
        # The probe peak through the EVAL decode — the one data generation
        # actually uses; differs from calibrated_peak only when the spec's
        # solver and eval_solver differ (r2 advisor).
        calibrated_peak_eval = probe_peak_through(
            program, len(devices), lambda c: decode(c)[0], args.sigma_scale, center
        )
        if abs(calibrated_peak_eval - calibrated_peak) > 0.05 * max(calibrated_peak, 1e-9):
            print(
                "simulate: NOTE eval-decode probe peak %.3f differs from the "
                "train-decode calibrated peak %.3f (solver vs eval_solver)"
                % (calibrated_peak_eval, calibrated_peak)
            )
        stats.update(
            u_center=center,
            calibrated_peak=calibrated_peak,
            calibrated_peak_eval=calibrated_peak_eval,
        )

    if args.max_scaled:
        theta, theta_clipped, in_regime = sample_truth_theta_in_regime(
            program, devices, k_theta, args.sigma_scale, args.max_scaled,
            noiseless_fn=lambda clipped: decode(jnp.asarray(clipped))[0],
            center=center,
        )
        stats.update(in_regime)
    else:
        u = _tied_normal_u(program, devices, k_theta, center=center)
        theta, theta_clipped = _theta_from_u(program, u, args.sigma_scale)

    # Record how much the +-4sigma clip actually bit the truth draw: recovery
    # scores against theta_clipped (what the decoder integrated), so nonzero
    # saturation here means sampled != generative theta (r2 advisor).
    clip_frac = float(np.mean(theta != theta_clipped))
    if clip_frac:
        print("simulate: clip saturation on %.2f%% of truth coordinates" % (100 * clip_frac))
    stats.update(clip_saturation=clip_frac)

    x_predict_j, prec_j = decode(jnp.asarray(theta_clipped))
    obs, truth_prec = add_observation_noise(ode_model, x_predict_j, prec_j, k_noise)
    x_noiseless = np.asarray(x_predict_j)[:, 0]
    stats.setdefault("noiseless_peak", float(np.max(np.abs(x_noiseless))))

    # Source-like units: scale by the per-signal max of the SOURCE data (the
    # same statistic the default pipeline normalises by).  The derived spec
    # pins normalize to these values, so loaded observations == obs exactly
    # (up to one f32 multiply/divide round-trip).
    src = [procdata.load(f, settings.data) for f in settings.data.files]
    scales = [
        float(max(np.max(p[3][:, i, :]) for p in src if p is not None))
        for i in range(obs.shape[1])
    ]
    raw = obs * np.asarray(scales, np.float32)[None, :, None]

    os.makedirs(args.output_dir, exist_ok=True)
    csv_path = os.path.join(args.output_dir, args.name + ".csv")
    spec_path = os.path.join(args.output_dir, args.name + ".yaml")
    truth_path = os.path.join(args.output_dir, args.name + "_truth.npz")
    write_csv(csv_path, settings, devices, treatments, times, raw)
    write_derived_spec(spec_path, args.yaml, csv_path, scales)

    payload = dict(
        theta=theta[:, 0],
        theta_clipped=theta_clipped[:, 0],
        theta_names=np.array(program.names, dtype=object),
        devices=devices,
        treatments=treatments,
        times=times,
        observations=obs,
        x_noiseless=x_noiseless,
        precisions=truth_prec,
        scales=np.asarray(scales, np.float64),
        seed=args.seed,
        sigma_scale=args.sigma_scale,
        max_scaled=args.max_scaled or 0.0,
        **stats,
    )
    import jax.tree_util as jtu

    for kp, leaf in jtu.tree_flatten_with_path(params_dec)[0]:
        payload["dec" + jtu.keystr(kp)] = np.asarray(leaf)
    np.savez(truth_path, **payload)
    print(
        "Wrote %s (%d series x %d signals x %d times), %s, %s"
        % (csv_path, obs.shape[0], obs.shape[1], obs.shape[2], spec_path, truth_path)
    )
    return AttrDict(
        csv=csv_path,
        spec=spec_path,
        truth=truth_path,
        theta=theta[:, 0],
        theta_clipped=theta_clipped[:, 0],
        observations=obs,
        devices=devices,
        treatments=treatments,
        times=times,
        scales=scales,
        program=program,
    )


def main(argv=None):
    from vihds_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    simulate(create_parser().parse_args(argv))


if __name__ == "__main__":
    main()
