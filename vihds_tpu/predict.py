"""Amortised posterior serving: predictions on UNSEEN data from a trained
checkpoint.

The reference has no serving path at all: it never saves model weights (no
torch.save anywhere — reference vihds/utils.py:101-156 persists results
tensors only), so a trained posterior is usable only through the artifacts
written during the same process.  Here the amortisation that gives the
method its name is served directly: restore a checkpoint (written by
``run_xval --checkpoint_epoch N``), parse a NEW plate-reader CSV with the
spec's device/treatment vocabulary, snap it onto the training time grid,
re-apply the TRAINING normalisation, and run one jitted evaluation —
q(theta | x_new) -> K theta samples -> ODE simulate -> IWAE-weighted
posterior-predictive moments — with no retraining.  With the persistent
compilation cache warm (any prior run of the same config), a serving call
starts in seconds.

CLI::

  python -m vihds_tpu.predict <spec.yaml> --checkpoint DIR --data NEW.csv \
      [--data MORE.csv ...] [--test_samples K] [--output out.npz] \
      [--save_theta] [--figures] [--mesh auto]

Library::

  from vihds_tpu.predict import predict
  out = predict(args)          # args from create_parser().parse_args(...)
"""

import copy
import os

import numpy as np

from vihds_tpu.config import Config
from vihds_tpu.data import procdata
from vihds_tpu.data.datasets import TimeSeriesDataset, build_datasets, find_nearest
from vihds_tpu.prob import ParamProgram, parse_parameters
from vihds_tpu.training import Training
from vihds_tpu.utils.attrdict import AttrDict
from vihds_tpu.vae import VAE


def create_parser():
    from vihds_tpu.run_xval import create_parser as base_parser

    parser = base_parser(False)
    parser.add_argument(
        "--checkpoint",
        type=str,
        required=True,
        help="Checkpoints directory of a trained run (run_xval --checkpoint_epoch N)",
    )
    parser.add_argument(
        "--data",
        type=str,
        action="append",
        required=True,
        help="CSV of new plate-reader time series (repeatable; same schema as the spec's files)",
    )
    parser.add_argument(
        "--output",
        type=str,
        default="predictions.npz",
        help="Output .npz path (default: ./predictions.npz)",
    )
    parser.add_argument(
        "--save_theta",
        action="store_true",
        default=False,
        help="Also store the per-sample theta draws [n_theta, B, K] (large)",
    )
    parser.add_argument(
        "--figures",
        action="store_true",
        default=False,
        help="Render a prediction-summary figure next to the output npz",
    )
    parser.add_argument(
        "--treatments",
        type=str,
        action="append",
        default=None,
        help="Counterfactual treatment override, same syntax as the CSV "
        "condition strings (e.g. \"C6=25000;C12=0\"; repeatable).  Posterior "
        "theta inferred from the observed data is re-simulated under these "
        "inputs; outputs land in the npz as cf<i>_* arrays",
    )
    return parser


def load_new_data(csv_files, settings, train_dataset):
    """Parse new CSVs and express them in the TRAINED model's coordinates.

    Three train-time conventions must be re-applied (not recomputed): the
    time grid (the encoder trunk is shape-bound to the training n_times),
    the per-signal normalisation scales (recomputing a max on new data
    would silently change units), and the device/treatment vocabulary
    (cassette one-hots must index the same component groups).  Returns a
    host batch AttrDict ready for Training.evaluate.
    """
    train_times = np.asarray(train_dataset.times)
    dt = float(np.median(np.diff(train_times)))
    parts = []
    for f in csv_files:
        # procdata.load resolves bare names under the spec's data_dir (the
        # contract for spec-listed files); serving accepts real filesystem
        # paths too, so pass existing paths through absolute.
        if os.path.exists(f):
            f = os.path.abspath(f)
        try:
            parsed = procdata.load(f, settings.data)
        except (ValueError, FileNotFoundError) as e:
            # named parse errors (empty file, missing signal columns, bad
            # condition strings, ...) — surface them as clean CLI failures
            raise SystemExit(str(e)) from None
        if parsed is None:
            import pandas as pd

            found = []
            try:
                found = sorted(
                    set(pd.read_csv(
                        os.path.join(settings.data.data_dir, f), na_filter=False
                    ).iloc[1:, 0])
                )
            except Exception:
                pass
            raise SystemExit(
                "No rows in %s match the spec's devices %s (the file's device "
                "column holds %s) — predictions require devices the model was "
                "trained on" % (f, list(settings.data.devices), found)
            )
        devices, inputs, times, obs = parsed
        # nearest-time snap onto the training grid (the same rule the
        # multi-file merge uses)
        idx = np.array([find_nearest(times, t) for t in train_times])
        worst = float(np.max(np.abs(np.asarray(times)[idx] - train_times)))
        span = float(train_times[-1] - train_times[0])
        if worst > 0.25 * span:
            raise SystemExit(
                "Time grid of %s is incompatible with the training grid: the "
                "nearest available reading is %.2f time units away from some "
                "training timepoint (training grid spans [%g, %g], step %.2f). "
                "The encoder is shape-bound to the training grid, so serving "
                "needs data covering a comparable time range."
                % (f, worst, float(train_times[0]), float(train_times[-1]), dt)
            )
        if worst > 1.5 * dt:
            print(
                "WARNING: %s deviates up to %.2f time units from the training grid "
                "(grid step %.2f) — predictions interpolate by nearest time" % (f, worst, dt)
            )
        parts.append((devices, inputs, obs[:, :, idx]))

    devices = np.concatenate([p[0] for p in parts])
    inputs = np.concatenate([p[1] for p in parts])
    observations = np.concatenate([p[2] for p in parts])

    ds_settings = copy.copy(settings.data)
    ds_settings.normalize = [float(s) for s in train_dataset.scales]
    ds = TimeSeriesDataset(ds_settings, settings.params)
    ds._preprocess(devices, inputs, train_times, observations)
    host = ds.select(np.arange(len(ds)))
    return host


def predict(args, settings=None):
    """Restore ``args.checkpoint`` and predict on ``args.data`` CSVs.

    Returns AttrDict(merged=<eval arrays>, results=<Results>, host=<input
    batch>, epoch=<checkpoint epoch>).
    """
    import jax

    from vihds_tpu import checkpoint as ckpt
    from vihds_tpu.run_xval import make_mesh_from_args

    if settings is None:
        settings = Config(args)
    settings.trainer = None
    if not getattr(args, "heldout", None):
        args.heldout = None
    if not hasattr(args, "split"):
        args.split = 1

    data = build_datasets(args, settings)
    full_dataset = data.train.dataset
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    mesh = make_mesh_from_args(args)
    training = Training(args, settings, data, program, model, mesh=mesh)

    if not os.path.isdir(args.checkpoint):
        # check BEFORE constructing the orbax manager: CheckpointManager is
        # built with create=True and would mkdir a mistyped path
        raise SystemExit("No checkpoint found under %s (not a directory)" % args.checkpoint)

    key = jax.random.PRNGKey(settings.seed or 0)
    key, k_init, k_eval = jax.random.split(key, 3)
    params0 = model.init_params(k_init)
    template = {
        "params": params0,
        "opt_state": training.tx.init(params0),
        "key": np.asarray(jax.random.PRNGKey(0)),
        "extra": {"epoch": 0},
    }
    epoch, state = ckpt.restore(args.checkpoint, template=template)
    if state is None:
        raise SystemExit("No checkpoint found under %s" % args.checkpoint)
    params = state["params"]

    host = load_new_data(args.data, settings, full_dataset)
    if training.multi:
        # models trained on merge:false data encode from enc_observations;
        # new data already lives on the encoder (shortest) grid
        host["enc_observations"] = host.observations
    treatments = getattr(args, "treatments", None) or []
    merged, results = training.evaluate(
        params, host, args.test_samples, k_eval,
        with_theta=getattr(args, "save_theta", False) or bool(treatments),
    )
    counterfactuals = [
        counterfactual(training, params, host, merged, spec_str)
        for spec_str in treatments
    ]
    return AttrDict(
        merged=merged,
        results=results,
        host=host,
        epoch=epoch,
        scales=[float(s) for s in full_dataset.scales],
        counterfactuals=counterfactuals,
    )


def counterfactual(training, params, host, merged, treatment_spec):
    """Re-simulate the inferred posterior theta under overridden treatments.

    ``treatment_spec`` uses the CSV condition syntax ("C6=25000;C12=0");
    named conditions replace that input column for EVERY served series
    (stored, like the dataset, as log1p).  The importance weights from the
    observed data stay valid — theta's posterior does not depend on the
    counterfactual input — so the returned moments are IW-weighted exactly
    like the factual ones.  One jitted dispatch, no chunking (serving
    batches are small; a 48x1000x8x86 trajectory is ~130 MB)."""
    import jax
    import jax.numpy as jnp

    from vihds_tpu.training import _importance_weighted_outputs

    overrides = procdata.process_condition(treatment_spec)
    if not overrides:
        raise SystemExit("Unparseable --treatments %r (want e.g. C6=100;C12=0)" % treatment_spec)
    conditions = list(training.settings.data.conditions)
    unknown = [k for k in overrides if k not in conditions]
    if unknown:
        raise SystemExit(
            "--treatments names %s not in the spec's conditions %s" % (unknown, conditions)
        )
    inputs = np.array(host.inputs, np.float32, copy=True)
    for k, v in overrides.items():
        inputs[:, conditions.index(k)] = np.log1p(v)

    model = training.model

    # One jitted decode-and-weight program shared across every --treatments
    # entry (a fresh @jax.jit per call would recompile the identical
    # program once per treatment).
    fn = getattr(training, "_counterfactual_step", None)
    if fn is None:

        @jax.jit
        def fn(params, batch, theta_bkn, log_w):
            out = model.decode(params, theta_bkn, batch, eval_mode=True)
            return _importance_weighted_outputs(AttrDict(log_w=log_w), out)

        training._counterfactual_step = fn

    batch = AttrDict(
        observations=jnp.asarray(host.observations),
        inputs=jnp.asarray(inputs),
        dev_1hot=jnp.asarray(host.dev_1hot),
        times=jnp.asarray(host.times),
    )
    theta_bkn = jnp.asarray(np.transpose(merged.theta, (1, 2, 0)))
    iw = jax.tree_util.tree_map(
        np.asarray, dict(fn(params, batch, theta_bkn, jnp.asarray(merged.log_w)))
    )
    return AttrDict(spec=treatment_spec, inputs=inputs, **iw)


def save_predictions(path, out, args, settings):
    merged, host = out.merged, out.host
    payload = dict(
        iw_predict_mu=merged.iw_predict_mu,
        iw_predict_std=merged.iw_predict_std,
        iw_states=merged.iw_states,
        iw_variance=merged.iw_variance,
        per_item_elbo=merged.per_item_elbo,  # per-series IWAE log-evidence
        elbo=merged.elbo,
        q_mu=merged.q_mu,
        q_prec=merged.q_prec,
        q_names=np.array(out.results.q_names, dtype=object),
        species_names=np.array(out.results.species_names, dtype=object),
        devices=host.devices,
        device_names=np.array(list(settings.data.devices), dtype=object),
        inputs=host.inputs,
        observations=host.observations,
        times=host.times,
        scales=np.asarray(out.scales, dtype=np.float64),
        checkpoint_epoch=out.epoch,
    )
    if getattr(args, "save_theta", False) and "theta" in merged:
        payload["theta"] = merged.theta
    for i, cf in enumerate(out.get("counterfactuals") or []):
        payload["cf%d_spec" % i] = np.array(cf.spec)
        payload["cf%d_inputs" % i] = cf.inputs
        for name in ("iw_predict_mu", "iw_predict_std", "iw_states", "iw_variance"):
            payload["cf%d_%s" % (i, name)] = cf[name]
    np.savez(path, **payload)
    print("Wrote %s (%d series, K=%d, checkpoint epoch %d, log-evidence %.2f)"
          % (path, host.observations.shape[0], args.test_samples, out.epoch, merged.elbo))


def make_figure(path_base, out, settings):
    import matplotlib

    matplotlib.use("Agg")
    from vihds_tpu import plotting

    merged, host = out.merged, out.host
    fig = plotting.plot_prediction_summary(
        list(settings.data.devices),
        out.results.species_names,
        host.times,
        host.observations,
        merged.iw_predict_mu,
        merged.iw_predict_std,
        host.devices,
        "-",
    )
    fig.savefig(path_base + ".png", bbox_inches="tight")
    fig.savefig(path_base + ".pdf", bbox_inches="tight")
    print("Wrote %s.png/.pdf" % path_base)


def main(argv=None):
    from vihds_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    args = create_parser().parse_args(argv)
    settings = Config(args)
    out = predict(args, settings)
    save_predictions(args.output, out, args, settings)
    if args.figures:
        make_figure(os.path.splitext(args.output)[0], out, settings)


if __name__ == "__main__":
    main()
