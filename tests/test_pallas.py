"""Pallas fused integrator: interpret-mode equivalence with the XLA scan path
(real-TPU execution is exercised by bench/eval on hardware)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import make_args, spec
from vihds_tpu.config import Config
from vihds_tpu.data.datasets import build_datasets
from vihds_tpu.models.dr_constant import _dr_constants
from vihds_tpu.ops import pallas_ode
from vihds_tpu.ops.solvers import integrate
from vihds_tpu.prob import ParamProgram, parse_parameters
from vihds_tpu.training import batch_arrays
from vihds_tpu.vae import VAE


@pytest.fixture(scope="module")
def setup():
    args = make_args(spec("dr_constant_one.yaml"))
    settings = Config(args)
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = batch_arrays(data.train.dataset.select(np.arange(3)))
    q = model.encoder(params["enc"], batch)
    u = model.sample_u(jax.random.PRNGKey(1), 3, 4)
    theta = program.clip(program.sample(q, u), stddevs=4)
    th = program.theta_dict(theta)
    return model, params, batch, th


@pytest.mark.parametrize("method", ["midpoint", "modeuler", "rk4"])
def test_pallas_matches_scan(setup, method):
    model, params, batch, th = setup
    ode = model.ode_model
    c = _dr_constants(th, batch.inputs, 1)
    y0 = jnp.broadcast_to(
        ode.initialize_state(params["dec"], th, batch.inputs, 3, 4), (3, 4, 8)
    )
    rhs = ode.make_rhs(params["dec"], th, batch.inputs, batch.dev_1hot)
    ref = np.asarray(integrate(rhs, y0, batch.times, method=method))
    got = np.asarray(
        pallas_ode.dr_constant_simulate(
            c, y0, batch.times, method=method, block_rows=8, interpret=True
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-7)


def test_pallas_gradient_matches_scan(setup):
    """The in-kernel backward sweep must reproduce the XLA scan path's
    gradients w.r.t. theta-derived constants and the initial state."""
    model, params, batch, th = setup
    ode = model.ode_model
    c = _dr_constants(th, batch.inputs, 1)
    y0 = jnp.broadcast_to(
        ode.initialize_state(params["dec"], th, batch.inputs, 3, 4), (3, 4, 8)
    )

    def loss_pallas(c, y0):
        sol = pallas_ode.dr_constant_simulate(
            c, y0, batch.times, method="midpoint", block_rows=8, interpret=True
        )
        return jnp.sum(sol[-1] ** 2) + jnp.sum(jnp.abs(sol[40]))

    def loss_scan(c, y0):
        from vihds_tpu.models.dr_constant import _dr_species_rhs

        sol = integrate(lambda t, y: _dr_species_rhs(c, t, y), y0, batch.times, method="midpoint")
        return jnp.sum(sol[-1] ** 2) + jnp.sum(jnp.abs(sol[40]))

    (gc1, gy1) = jax.grad(loss_pallas, argnums=(0, 1))(c, y0)
    (gc2, gy2) = jax.grad(loss_scan, argnums=(0, 1))(c, y0)
    # tolerances cover accumulation-order differences between the in-kernel
    # reverse sweep and XLA's scan transpose
    np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy2), rtol=1e-3, atol=1e-6)
    for name in gc2:
        a, b = np.asarray(gc1[name]), np.asarray(gc2[name])
        assert np.isfinite(a).all(), name
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5, err_msg=name)


@pytest.fixture(scope="module")
def setup_prec():
    args = make_args(spec("dr_constant_precisions.yaml"))
    settings = Config(args)
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = batch_arrays(data.train.dataset.select(np.arange(3)))
    q = model.encoder(params["enc"], batch)
    u = model.sample_u(jax.random.PRNGKey(1), 3, 4)
    theta = program.clip(program.sample(q, u), stddevs=4)
    th = program.theta_dict(theta)
    th = model.ode_model.condition_theta(params["dec"], th, batch.dev_1hot)
    return model, params, batch, th


def test_pallas_precisions_matches_scan(setup_prec):
    """The 12-state dr_prec kernel (learned-precision ODE block in-kernel)
    must match the XLA scan path."""
    model, params, batch, th = setup_prec
    ode = model.ode_model
    assert ode.precisions.dynamic and ode._pallas_supported()
    c = _dr_constants(th, batch.inputs, 1)
    y0 = jnp.broadcast_to(
        ode.initialize_state(params["dec"], th, batch.inputs, 3, 4), (3, 4, 12)
    )
    rhs = ode.make_rhs(params["dec"], th, batch.inputs, batch.dev_1hot)
    ref = np.asarray(integrate(rhs, y0, batch.times, method="midpoint"))
    got = np.asarray(
        pallas_ode.dr_constant_precisions_simulate(
            c, params["dec"]["precisions"], y0, batch.times,
            method="midpoint", block_rows=8, interpret=True,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-7)


def test_pallas_precisions_gradients(setup_prec):
    """Backward sweep gradients flow to theta constants, the precision-net
    weights, and y0 — and match the XLA scan path."""
    model, params, batch, th = setup_prec
    ode = model.ode_model
    c = _dr_constants(th, batch.inputs, 1)
    pp = params["dec"]["precisions"]
    y0 = jnp.broadcast_to(
        ode.initialize_state(params["dec"], th, batch.inputs, 3, 4), (3, 4, 12)
    )

    def loss_pallas(c, pp, y0):
        sol = pallas_ode.dr_constant_precisions_simulate(
            c, pp, y0, batch.times, method="midpoint", block_rows=8, interpret=True
        )
        return jnp.sum(sol[-1] ** 2) + jnp.sum(jnp.abs(sol[40]))

    def loss_scan(c, pp, y0):
        from vihds_tpu.models.dr_constant import _dr_species_rhs

        def rhs(t, y):
            dX = _dr_species_rhs(c, t, y)
            dV = ode.precisions.rhs(pp, t, y, None)
            return jnp.concatenate([dX, dV], axis=-1)

        sol = integrate(rhs, y0, batch.times, method="midpoint")
        return jnp.sum(sol[-1] ** 2) + jnp.sum(jnp.abs(sol[40]))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(c, pp, y0)
    g2 = jax.grad(loss_scan, argnums=(0, 1, 2))(c, pp, y0)
    np.testing.assert_allclose(np.asarray(g1[2]), np.asarray(g2[2]), rtol=1e-3, atol=1e-6)
    for net in ("prod", "degr"):
        for leaf in ("w", "b"):
            a, b = np.asarray(g1[1][net][leaf]), np.asarray(g2[1][net][leaf])
            assert np.isfinite(a).all(), (net, leaf)
            assert np.abs(a).max() > 0, "zero weight grads: %s/%s" % (net, leaf)
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5, err_msg=net + leaf)
    for name in g2[0]:
        a, b = np.asarray(g1[0][name]), np.asarray(g2[0][name])
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5, err_msg=name)


def test_pallas_precisions_routing(setup_prec):
    """solver: pallas_midpoint on a *_precisions model routes through the
    fused 12-state kernel."""
    model, params, batch, th = setup_prec
    ode = model.ode_model
    old = ode.solver
    try:
        ode.solver = "pallas_midpoint"
        import vihds_tpu.ops.pallas_ode as pk

        orig = pk.dr_constant_precisions_simulate
        calls = {}

        def spy(*a, **k):
            calls["hit"] = True
            k["interpret"] = True
            return orig(*a, **k)

        pk.dr_constant_precisions_simulate = spy
        try:
            sol = ode.simulate(params["dec"], th, batch.times, batch.inputs, batch.dev_1hot, 4)
        finally:
            pk.dr_constant_precisions_simulate = orig
        assert calls.get("hit"), "pallas precisions path not taken"
        assert sol.shape == (3, 4, 12, batch.times.shape[0])
        assert np.isfinite(np.asarray(sol)).all()
    finally:
        ode.solver = old


def _family_setup(spec_name):
    args = make_args(spec(spec_name))
    settings = Config(args)
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = batch_arrays(data.train.dataset.select(np.arange(3)))
    q = model.encoder(params["enc"], batch)
    u = model.sample_u(jax.random.PRNGKey(1), 3, 4)
    th = program.theta_dict(program.clip(program.sample(q, u), stddevs=4))
    th = model.ode_model.condition_theta(params["dec"], th, batch.dev_1hot)
    return model, params, batch, th, settings


@pytest.fixture(scope="module")
def setup_relay():
    return _family_setup("relay_constant_precisions.yaml")


@pytest.fixture(scope="module")
def setup_degrader():
    return _family_setup("degrader_constant_precisions.yaml")


@pytest.mark.parametrize("family", ["relay", "degrader"])
def test_pallas_family_precisions_matches_scan(family, setup_relay, setup_degrader):
    """The generalized kernels (relay: 16 states / n_in=13 precision net;
    degrader: 15 states / n_in=12) must match the XLA scan path."""
    model, params, batch, th, _ = setup_relay if family == "relay" else setup_degrader
    ode = model.ode_model
    assert ode.precisions.dynamic and ode._pallas_supported()
    n_states = ode.n_species + 4
    c = ode._pallas_constants(th, batch.inputs)
    y0 = jnp.broadcast_to(
        ode.initialize_state(params["dec"], th, batch.inputs, 3, 4), (3, 4, n_states)
    )
    rhs = ode.make_rhs(params["dec"], th, batch.inputs, batch.dev_1hot)
    ref = np.asarray(integrate(rhs, y0, batch.times, method="midpoint"))
    got = np.asarray(
        pallas_ode.simulate_kind(
            ode.pallas_kinds[1], c, y0, batch.times, method="midpoint",
            prec_params=params["dec"]["precisions"], interpret=True,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("family", ["relay", "degrader"])
def test_pallas_family_plain_matches_scan(family, setup_relay, setup_degrader):
    """The plain mechanistic kernels (relay 12 / degrader 11 states) match
    the scan path (constructed directly: the shipped specs register the
    *_precisions variants)."""
    from vihds_tpu.models.degrader_constant import Degrader_Constant
    from vihds_tpu.models.relay_constant import Relay_Constant

    if family == "relay":
        model, params, batch, th, settings = setup_relay
        ode = Relay_Constant(settings)
    else:
        model, params, batch, th, settings = setup_degrader
        ode = Degrader_Constant(settings)
    c = ode._pallas_constants(th, batch.inputs)
    y0 = jnp.broadcast_to(
        ode.initialize_state(params["dec"], th, batch.inputs, 3, 4), (3, 4, ode.n_species)
    )
    rhs = ode.make_rhs(params["dec"], th, batch.inputs, batch.dev_1hot)
    ref = np.asarray(integrate(rhs, y0, batch.times, method="midpoint"))
    got = np.asarray(
        pallas_ode.simulate_kind(
            ode.pallas_kinds[0], c, y0, batch.times, method="midpoint", interpret=True
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-7)


def test_pallas_relay_precisions_gradients(setup_relay):
    """Backward sweep through the generalized (n_in=13) weight packing:
    gradients flow to constants, precision-net weights, and y0, matching
    the XLA scan path."""
    model, params, batch, th, _ = setup_relay
    ode = model.ode_model
    c = ode._pallas_constants(th, batch.inputs)
    pp = params["dec"]["precisions"]
    y0 = jnp.broadcast_to(
        ode.initialize_state(params["dec"], th, batch.inputs, 3, 4), (3, 4, 16)
    )

    def loss_pallas(c, pp, y0):
        sol = pallas_ode.relay_constant_precisions_simulate(
            c, pp, y0, batch.times, method="midpoint", block_rows=8, interpret=True
        )
        return jnp.sum(sol[-1] ** 2) + jnp.sum(jnp.abs(sol[40]))

    def loss_scan_model(c_unused, pp, y0):
        rhs = model.ode_model.make_rhs(
            {**params["dec"], "precisions": pp}, th, batch.inputs, batch.dev_1hot
        )
        sol = integrate(rhs, y0, batch.times, method="midpoint")
        return jnp.sum(sol[-1] ** 2) + jnp.sum(jnp.abs(sol[40]))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(c, pp, y0)
    g2 = jax.grad(loss_scan_model, argnums=(1, 2))(c, pp, y0)
    np.testing.assert_allclose(np.asarray(g1[2]), np.asarray(g2[1]), rtol=1e-3, atol=1e-6)
    for net in ("prod", "degr"):
        for leaf in ("w", "b"):
            a, b = np.asarray(g1[1][net][leaf]), np.asarray(g2[0][net][leaf])
            assert np.isfinite(a).all(), (net, leaf)
            assert np.abs(a).max() > 0, "zero weight grads: %s/%s" % (net, leaf)
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5, err_msg=net + leaf)
    for name in g1[0]:
        assert np.isfinite(np.asarray(g1[0][name])).all(), name


def test_pallas_relay_routing(setup_relay):
    """solver: pallas_midpoint on relay_constant_precisions routes through
    the fused 16-state kernel via the generic OdeModel route."""
    model, params, batch, th, _ = setup_relay
    ode = model.ode_model
    old = ode.solver
    try:
        ode.solver = "pallas_midpoint"
        import vihds_tpu.ops.pallas_ode as pk

        orig = pk.relay_constant_precisions_simulate
        calls = {}

        def spy(*a, **k):
            calls["hit"] = True
            k["interpret"] = True
            return orig(*a, **k)

        pk.relay_constant_precisions_simulate = spy
        try:
            sol = ode.simulate(params["dec"], th, batch.times, batch.inputs, batch.dev_1hot, 4)
        finally:
            pk.relay_constant_precisions_simulate = orig
        assert calls.get("hit"), "pallas relay path not taken"
        assert sol.shape == (3, 4, 16, batch.times.shape[0])
        assert np.isfinite(np.asarray(sol)).all()
    finally:
        ode.solver = old


@pytest.fixture(scope="module")
def setup_blackbox():
    args = make_args(spec("dr_blackbox_icml.yaml"))
    settings = Config(args)
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = batch_arrays(data.train.dataset.select(np.arange(3)))
    q = model.encoder(params["enc"], batch)
    u = model.sample_u(jax.random.PRNGKey(1), 3, 4)
    th = program.theta_dict(program.clip(program.sample(q, u), stddevs=4))
    th = model.ode_model.condition_theta(params["dec"], th, batch.dev_1hot)
    return model, params, batch, th


def test_pallas_blackbox_matches_scan(setup_blackbox):
    """The shared-weight MLP kernel (NeuralStates hidden=25 + relu
    NeuralPrecisions hidden=20, in-kernel matmuls) must match the XLA scan
    path on the shipped dr_blackbox_icml shape."""
    from vihds_tpu.ops import pallas_blackbox

    model, params, batch, th = setup_blackbox
    ode = model.ode_model
    assert pallas_blackbox.supported(ode)
    constants = ode._constants(th, batch.inputs, batch.dev_1hot, 4)
    y0 = ode.initialize_state(params["dec"], th, batch.inputs, 3, 4)
    rhs = ode.make_rhs(params["dec"], th, batch.inputs, batch.dev_1hot)
    ref = np.asarray(integrate(rhs, y0, batch.times, method="midpoint"))
    got = np.asarray(
        pallas_blackbox.blackbox_simulate(
            params["dec"], constants, y0, batch.times, ode.n_states,
            method="midpoint", block_rows=8, interpret=True,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-7)


def test_pallas_blackbox_gradients(setup_blackbox):
    """Backward sweep: weight cotangents (per-grid-cell accumulation +
    host-side sum), per-row constant and y0 cotangents all match the XLA
    scan path."""
    from vihds_tpu.ops import pallas_blackbox

    model, params, batch, th = setup_blackbox
    ode = model.ode_model
    constants = ode._constants(th, batch.inputs, batch.dev_1hot, 4)
    y0 = ode.initialize_state(params["dec"], th, batch.inputs, 3, 4)
    nets = {"states": params["dec"]["states"], "precisions": params["dec"]["precisions"]}

    def loss_pallas(nets, constants, y0):
        sol = pallas_blackbox.blackbox_simulate(
            nets, constants, y0, batch.times, ode.n_states,
            method="midpoint", block_rows=8, interpret=True,
        )
        return jnp.sum(sol[-1] ** 2) + jnp.sum(jnp.abs(sol[40]))

    def loss_scan(nets, constants, y0):
        def rhs(t, state):
            dx = ode.neural_states(nets["states"], state[..., :-4], constants)
            dv = ode.precisions.rhs(nets["precisions"], t, state, constants)
            return jnp.concatenate([dx, dv], axis=-1)

        sol = integrate(rhs, y0, batch.times, method="midpoint")
        return jnp.sum(sol[-1] ** 2) + jnp.sum(jnp.abs(sol[40]))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(nets, constants, y0)
    g2 = jax.grad(loss_scan, argnums=(0, 1, 2))(nets, constants, y0)
    np.testing.assert_allclose(np.asarray(g1[2]), np.asarray(g2[2]), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), rtol=1e-3, atol=1e-5)
    for net in ("states", "precisions"):
        for layer in ("hidden", "prod", "degr"):
            for leaf in ("w", "b"):
                a = np.asarray(g1[0][net][layer][leaf])
                b = np.asarray(g2[0][net][layer][leaf])
                assert np.isfinite(a).all(), (net, layer, leaf)
                assert np.abs(a).max() > 0, "zero grads: %s/%s/%s" % (net, layer, leaf)
                np.testing.assert_allclose(
                    a, b, rtol=1e-3, atol=1e-5, err_msg="%s/%s/%s" % (net, layer, leaf)
                )


def test_pallas_blackbox_routing(setup_blackbox):
    """solver: pallas_midpoint on dr_blackbox routes through the fused
    black-box kernel."""
    from vihds_tpu.ops import pallas_blackbox as pb

    model, params, batch, th = setup_blackbox
    ode = model.ode_model
    old = ode.solver
    try:
        ode.solver = "pallas_midpoint"
        orig = pb.blackbox_simulate
        calls = {}

        def spy(*a, **k):
            calls["hit"] = True
            k["interpret"] = True
            return orig(*a, **k)

        pb.blackbox_simulate = spy
        try:
            sol = ode.simulate(params["dec"], th, batch.times, batch.inputs, batch.dev_1hot, 4)
        finally:
            pb.blackbox_simulate = orig
        assert calls.get("hit"), "pallas blackbox path not taken"
        assert sol.shape == (3, 4, ode.n_states + 4, batch.times.shape[0])
        assert np.isfinite(np.asarray(sol)).all()
    finally:
        ode.solver = old


def test_pallas_solver_routing(setup):
    """solver: pallas_midpoint routes through the kernel end-to-end."""
    model, params, batch, th = setup
    ode = model.ode_model
    old = ode.solver
    try:
        ode.solver = "pallas_midpoint"
        import vihds_tpu.ops.pallas_ode as pk

        orig = pk.dr_constant_simulate
        calls = {}

        def spy(*a, **k):
            calls["hit"] = True
            k["interpret"] = True
            return orig(*a, **k)

        pk.dr_constant_simulate = spy
        try:
            sol = ode.simulate(params["dec"], th, batch.times, batch.inputs, batch.dev_1hot, 4)
        finally:
            pk.dr_constant_simulate = orig
        assert calls.get("hit"), "pallas path not taken"
        assert sol.shape == (3, 4, 8, batch.times.shape[0])
        assert np.isfinite(np.asarray(sol)).all()
    finally:
        ode.solver = old
