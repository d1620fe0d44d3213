"""Feature coverage: heldout-device splits (declared-but-unimplemented in the
reference, vihds/datasets.py:200-206), Laplace observation model, spec
defaults plumbing."""

import numpy as np
import jax
import pytest

from tests.conftest import make_args, spec
from vihds_tpu.config import Config
from vihds_tpu.data.datasets import build_datasets
from vihds_tpu.prob import ParamProgram, parse_parameters
from vihds_tpu.training import batch_arrays, iwae_elbo, iwae_elbo_terms
from vihds_tpu.vae import VAE


def test_heldout_device_split():
    args = make_args(spec("dr_constant_icml.yaml"))
    args.heldout = "R33S32_Y81C76"
    settings = Config(args)
    data = build_datasets(args, settings)
    held_idx = int(settings.data.device_map["R33S32_Y81C76"])
    # validation set is exactly the held-out device's series
    assert (data.test.dataset.devices[data.test.indices] == held_idx).all()
    assert (data.train.dataset.devices[data.train.indices] != held_idx).all()
    assert data.n_train + data.n_test == 312


def test_heldout_unknown_device_raises():
    args = make_args(spec("dr_constant_icml.yaml"))
    args.heldout = "NotADevice"
    settings = Config(args)
    with pytest.raises(ValueError):
        build_datasets(args, settings)


def test_laplace_observation_model():
    args = make_args(spec("dr_constant_one.yaml"))
    settings = Config(args)
    settings.params.use_laplace = True
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    assert model.use_laplace is True
    params = model.init_params(jax.random.PRNGKey(0))
    batch = batch_arrays(data.train.dataset.select(np.arange(4)))

    def loss(params):
        u = model.sample_u(jax.random.PRNGKey(1), 4, 3)
        out = model.forward(params, batch, u)
        return -iwae_elbo(iwae_elbo_terms(program, out, batch, True))

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))


def test_train_through_dopri5(tmp_path, monkeypatch):
    """Training with an adaptive solver end-to-end (reference capability:
    solver: dopri5 trains through torchdiffeq, vihds/ode.py:75-82)."""
    monkeypatch.chdir(tmp_path)
    args = make_args(spec("dr_constant_one.yaml"), train_samples=5, test_samples=5, epochs=2)
    settings = Config(args)
    settings.params.solver = "dopri5"
    settings.trainer = None
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    from vihds_tpu.training import Training

    res = Training(args, settings, data, program, model).run()
    assert res is not None
    assert np.isfinite(res.elbo)


def test_defaults_table():
    """Hyper-parameter defaults parity (reference vihds/config.py:56-88)."""
    args = make_args(spec("dr_constant_one.yaml"))
    settings = Config(args)
    p = settings.params
    assert p.n_filters == 10 and p.filter_size == 10 and p.pool_size == 5
    assert p.n_hidden == 50 and p.n_batch == 36
    assert p.solver == "midpoint"
    assert p.transfer_func == "tanh"
    # spec overrides win over defaults
    assert p.learning_boundaries == [250, 1000]
    assert p.learning_rate == 0.01


def test_precision_hidden_layers_cli_override():
    args = make_args(spec("dr_constant_precisions.yaml"))
    args.precision_hidden_layers = 0
    settings = Config(args)
    assert settings.params.n_hidden_decoder_precisions == 0


def test_unmerged_multi_dataset(tmp_path, monkeypatch):
    """merge: false — per-file native time grids end-to-end (the reference
    declares this path but it is dead there: vihds/encoders.py:362-365)."""
    monkeypatch.chdir(tmp_path)
    args = make_args(spec("dr_constant_icml_unmerged.yaml"), train_samples=4, test_samples=4, epochs=2)
    settings = Config(args)
    settings.trainer = None
    data = build_datasets(args, settings)
    ds = data.train.dataset
    # heterogeneous native grids preserved (merge would snap all to 86)
    n_times = sorted({f.n_times for f in ds.files})
    assert len(n_times) > 1 and ds.n_times == min(n_times)
    assert len(ds) == 312  # same series count as the merged load
    # report view is rectangular on the shortest grid
    view = ds.select(np.arange(10))
    assert view.observations.shape == (10, 4, ds.n_times)

    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    from vihds_tpu.training import Training

    res = Training(args, settings, data, program, model).run()
    assert res is not None
    assert np.isfinite(res.elbo)
    # iw outputs snapped onto the report grid
    assert res.iw_predict_mu.shape == (data.n_test, 4, ds.n_times)


def test_growthrate_reduces_to_dr_constant():
    """dr_growthrate (reconstruction; dead upstream — the spec's model is
    absent from reference models/__init__.py:19-35) must reduce exactly to
    DR_Constant when the basal-expression fraction es = 1 (cap(t) == 1)."""
    import jax.numpy as jnp

    from vihds_tpu import models

    args = make_args(spec("dr_growthrate_xval.yaml"))
    settings = Config(args)
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    assert type(model.ode_model).__name__ == "DR_Growthrate"
    params = model.init_params(jax.random.PRNGKey(0))

    n, k = 4, 3
    batch = batch_arrays(data.train.dataset.select(np.arange(n)))
    u = model.sample_u(jax.random.PRNGKey(1), n, k)
    q = model.encoder(params["enc"], batch)
    th = program.theta_dict(program.clip(program.sample(q, u), stddevs=4))
    th = model.ode_model.condition_theta(params["dec"], th, batch.dev_1hot)
    th_es1 = dict(th)
    th_es1["es"] = jnp.ones_like(th["es"])

    cmodel = models.LOOKUP["dr_constant"](settings)
    rhs_g = model.ode_model.make_rhs(params["dec"], th_es1, batch.inputs, batch.dev_1hot)
    rhs_c = cmodel.make_rhs(params["dec"], th_es1, batch.inputs, batch.dev_1hot)
    y0 = model.ode_model.initialize_state(params["dec"], th_es1, batch.inputs, n, k)
    y0 = jnp.broadcast_to(y0, (n, k, model.ode_model.n_species))
    for t in (0.0, 2.5, 10.0):
        g, c = rhs_g(jnp.float32(t), y0), rhs_c(jnp.float32(t), y0)
        np.testing.assert_allclose(np.asarray(g), np.asarray(c), rtol=1e-6)
        assert np.isfinite(np.asarray(g)).all()

    # and with es < 1 production is damped, dilution untouched
    th_lo = dict(th)
    th_lo["es"] = jnp.full_like(th["es"], 0.1)
    rhs_lo = model.ode_model.make_rhs(params["dec"], th_lo, batch.inputs, batch.dev_1hot)
    d_lo = np.asarray(rhs_lo(jnp.float32(0.0), y0))
    assert np.isfinite(d_lo).all()
