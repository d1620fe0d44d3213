"""Synthetic-data simulator (vihds_tpu/simulate.py): the generative half of
the spec samples to a plate-reader CSV the full pipeline trains on, with
recorded ground truth.  (Capability beyond the reference — it has no
simulator; SURVEY.md §2 generative path only ever runs inside the ELBO.)"""

import os

import numpy as np

from tests.conftest import make_args, spec


def _simulate(tmp_path, **kw):
    from vihds_tpu import simulate as sim

    argv = [
        spec("dr_constant_one.yaml"),
        "--output_dir", str(tmp_path),
        "--n_per_device", "6",
        "--sigma_scale", "0.5",
        "--seed", "1",
    ]
    for k, v in kw.items():
        argv.extend(["--" + k, str(v)])
    return sim.simulate(sim.create_parser().parse_args(argv))


def test_simulate_roundtrip(tmp_path, tmp_results):
    """The written CSV + derived spec reload through the REAL pipeline to the
    simulated observations (normalize pinned, background subtraction off) and
    the truth npz records a coherent ground truth."""
    out = _simulate(tmp_path)
    assert os.path.exists(out.csv) and os.path.exists(out.spec) and os.path.exists(out.truth)

    from vihds_tpu.config import Config
    from vihds_tpu.data.datasets import build_datasets

    args = make_args(out.spec, folds=2)
    settings = Config(args)
    assert settings.data.normalize == [float(s) for s in out.scales]
    assert settings.data.subtract_background is False
    data = build_datasets(args, settings)
    ds = data.train.dataset

    # pipeline-loaded observations == simulated scaled observations (one f32
    # multiply/divide round-trip of slack)
    assert ds.observations.shape == out.observations.shape == (6, 4, len(out.times))
    np.testing.assert_allclose(ds.observations, out.observations, rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(ds.times, out.times, rtol=0, atol=0)
    np.testing.assert_allclose(
        ds.inputs, np.log1p(out.treatments), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(ds.devices, out.devices)

    truth = np.load(out.truth, allow_pickle=True)
    assert list(truth["theta_names"]) == out.program.names
    assert truth["theta"].shape == (6, out.program.n_theta)
    # global sites share ONE truth value across every series; local sites vary
    g = out.program.global_slice
    np.testing.assert_array_equal(
        truth["theta"][:, g],
        np.broadcast_to(truth["theta"][0:1, g], truth["theta"][:, g].shape),
    )
    loc = out.program.local_slice
    assert loc.stop > loc.start, "spec has local sites"
    assert np.ptp(truth["theta"][:, loc], axis=0).max() > 0
    # noiseless predictions are finite and the noise model actually perturbed
    assert np.isfinite(truth["x_noiseless"]).all()
    assert not np.allclose(truth["x_noiseless"], out.observations)


def test_simulate_max_scaled(tmp_path, tmp_results):
    """--max_scaled conditions the truth draw on the observable regime via
    BLOCKED rejection (shared global blocks against a probe dataset, then
    per-series local blocks): the unconditioned seed-1 draw peaks at ~220x
    the data scale, and a joint all-series rejection measured 0/100
    acceptance at this sigma_scale."""
    out = _simulate(tmp_path, max_scaled=2.0)
    truth = np.load(out.truth, allow_pickle=True)
    assert float(truth["probe_peak"]) <= 2.0
    assert float(truth["noiseless_peak"]) <= 2.0
    assert int(truth["truth_attempt"]) >= 1, "shared-block rejection engaged"
    per_series = np.max(np.abs(truth["x_noiseless"]), axis=(1, 2))
    assert (per_series <= 2.0).all()
    # local redraws must not break the tier sharing: global sites still share
    # ONE truth value across every series
    g = out.program.global_slice
    np.testing.assert_array_equal(
        truth["theta"][:, g],
        np.broadcast_to(truth["theta"][0:1, g], truth["theta"][:, g].shape),
    )


def test_calibrate_shared_center(tmp_path, tmp_results):
    """Gradient calibration of the shared-block truth center: descending the
    differentiable generative decode moves the probe peak from the prior
    center's ~6x-the-data-scale down to the requested target, touching only
    the shared sites."""
    import jax

    from vihds_tpu import simulate as sim
    from vihds_tpu.config import Config
    from vihds_tpu.prob import ParamProgram, parse_parameters

    args = sim.create_parser().parse_args(
        [spec("dr_constant_one.yaml"), "--output_dir", str(tmp_path)]
    )
    settings = Config(args)
    program = ParamProgram(parse_parameters(settings.params))
    devices, treatments, times = sim.load_design(settings)
    devices, treatments = sim.resample_design(devices, treatments, 6, 1)
    _, _, decode = sim.make_decoder(
        settings, program, devices, treatments, times, jax.random.PRNGKey(0),
        eval_mode=False,
    )
    center, peak = sim.calibrate_shared_center(
        program, len(devices), lambda c: decode(c)[0], 0.5, 1.0, steps=120
    )
    assert 0.5 <= peak <= 2.0, "calibration reached the data scale from ~6x"
    assert (center[program.local_slice] == 0).all()
    assert (center[program.constant_slice] == 0).all()
    assert np.abs(center[program.global_slice]).max() > 0


def test_simulate_trains(tmp_path, tmp_results):
    """End-to-end: a model trains on the synthetic spec with finite ELBO."""
    out = _simulate(tmp_path)

    from vihds_tpu.config import Config
    from vihds_tpu.data.datasets import build_datasets
    from vihds_tpu.prob import ParamProgram, parse_parameters
    from vihds_tpu.training import Training
    from vihds_tpu.vae import VAE

    args = make_args(out.spec, folds=2, epochs=2, test_epoch=2)
    settings = Config(args)
    settings.trainer = None
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    results = Training(args, settings, data, program, model).run()
    assert results is not None and np.isfinite(results.elbo)
