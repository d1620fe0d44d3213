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

``--sigma_scale s`` tempers the prior for the TRUTH draw only (normal-family
sites sample with sigma*s): the headline specs put deliberately wide priors
on rate constants (sigma up to 3 in log space), where a full-width draw is
often dynamically degenerate; s<1 keeps the truth in the scientifically
plausible bulk while the trained model still uses the spec's own priors.
``--max_scaled X`` additionally conditions the truth draw on the OBSERVABLE
regime: draws whose noiseless scaled trajectories peak above X are rejected
and redrawn (key folded per attempt).  An unconditioned joint draw over ~30+
wide prior sites is frequently dynamically extreme (measured: a seed-0
sigma_scale=0.5 dr_constant_one draw peaks at 280 in units where the real
data peaks at 1.0), which puts the synthetic dataset far outside the regime
any fixed architecture/learning-rate pairing is tuned for.
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
        help="Condition the truth draw on the observable regime: redraw (up to 100x) "
        "until the noiseless scaled trajectories peak at or below this bound "
        "(real scaled data peaks at 1.0 by construction; default: accept any draw)",
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


def sample_truth_theta(program, devices, key, sigma_scale=1.0):
    """Tier-faithful prior draw: one u per (site, sharing unit).

    local sites: i.i.d. per series; global (and constant) sites: one draw for
    every series; global_conditioned sites: one draw per device.  Dependent
    sites and non-Normal kinds sample through the program's own machinery, so
    the truth distribution is exactly the model's prior (tempered by
    ``sigma_scale`` on normal-family sigmas)."""
    import jax
    import jax.numpy as jnp

    L = len(devices)
    u = np.array(jax.random.normal(key, (L, 1, program.n_theta), jnp.float32))
    for sl in (program.global_slice, program.constant_slice):
        u[:, :, sl] = u[0:1, :, sl]
    for d in np.unique(devices):
        rows = np.flatnonzero(devices == d)
        u[rows, :, program.global_cond_slice] = u[rows[0], :, program.global_cond_slice]

    prec = np.where(
        program.is_normal_family,
        program.prior_prec / float(sigma_scale) ** 2,
        program.prior_prec,
    ).astype(np.float32)
    q_truth = AttrDict(mu=program.prior_mu[None, :], prec=prec[None, :])
    theta = np.asarray(program.sample(q_truth, jnp.asarray(u)))  # [L, 1, n_theta]
    # the VAE's effective generative model decodes the +-4-sigma-clipped theta
    # (clip bounds from the spec's UNtempered prior, like training)
    clipped = np.asarray(program.clip(jnp.asarray(theta), stddevs=4))
    return theta, clipped


def simulate_observations(settings, program, theta_clipped, devices, treatments, times, key):
    """Decode truth theta through the spec's ODE model and add observation
    noise from the model's own precision sites.  Returns (obs[L,S,T] in
    SCALED model units, decoder params, x_predict[L,S,T] noiseless)."""
    import jax
    import jax.numpy as jnp

    ode_model = models.LOOKUP[settings.model](settings)
    condition_on_device = settings.data.device_depth > 1
    if not condition_on_device:
        ode_model.conditioned_params = ()
    k_dec, k_noise = jax.random.split(key)
    params_dec = ode_model.init_params(k_dec)

    dev_1hot = jnp.asarray(get_cassettes(devices, settings.data))
    inputs_log = jnp.asarray(np.log1p(treatments).astype(np.float32))
    th = program.theta_dict(jnp.asarray(theta_clipped))
    if condition_on_device:
        th = ode_model.condition_theta(params_dec, th, dev_1hot)
    x_solution = ode_model.simulate(
        params_dec, th, jnp.asarray(times.astype(np.float32)), inputs_log, dev_1hot,
        n_iwae=1, eval_mode=True,
    )
    x_states, precisions = ode_model.expand_precisions(
        params_dec, th, len(times), x_solution
    )
    x_predict = ode_model.observe(x_states, th)  # [L, 1, S, T]

    if ode_model.use_laplace:
        # log_prob_laplace is rate-parameterised: scale b = 1/precision
        eps = jax.random.laplace(k_noise, x_predict.shape, x_predict.dtype) / precisions
    else:
        eps = jax.random.normal(k_noise, x_predict.shape, x_predict.dtype) / jnp.sqrt(precisions)
    obs = np.asarray(x_predict + eps)[:, 0]  # [L, S, T]
    precisions = np.asarray(jnp.broadcast_to(precisions, x_predict.shape))[:, 0]
    return obs, params_dec, np.asarray(x_predict)[:, 0], precisions


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

    base_key = jax.random.PRNGKey(args.seed)
    max_attempts = 100 if args.max_scaled else 1
    for attempt in range(max_attempts):
        key = jax.random.fold_in(base_key, attempt) if attempt else base_key
        k_theta, k_sim = jax.random.split(key)
        theta, theta_clipped = sample_truth_theta(
            program, devices, k_theta, sigma_scale=args.sigma_scale
        )
        obs, params_dec, x_noiseless, truth_prec = simulate_observations(
            settings, program, theta_clipped, devices, treatments, times, k_sim
        )
        peak = float(np.max(np.abs(x_noiseless)))
        if not args.max_scaled or peak <= args.max_scaled:
            break
        print(
            "simulate: draw %d rejected (noiseless peak %.1f > max_scaled %.1f)"
            % (attempt, peak, args.max_scaled)
        )
    else:
        raise SystemExit(
            "simulate: no in-regime truth draw in %d attempts; raise --max_scaled "
            "or lower --sigma_scale" % max_attempts
        )

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
        truth_attempt=attempt,
        noiseless_peak=float(np.max(np.abs(x_noiseless))),
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
