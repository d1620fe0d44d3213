"""Numerical parity against the UNMODIFIED reference implementation:
distribution log-probs/samples and the observation log-likelihood must match
to float32 tolerance on identical inputs (SURVEY.md §7 'numerical parity'
gate)."""

import importlib.util
import os
import sys
import types
from collections import OrderedDict

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def ref():
    """Import reference vihds.distributions + training with dependency shims."""
    torch = pytest.importorskip("torch")
    if "munch" not in sys.modules:
        munch = types.ModuleType("munch")

        class Munch(OrderedDict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            def __setattr__(self, k, v):
                self[k] = v

        munch.Munch = Munch
        munch.munchify = lambda obj: obj
        sys.modules["munch"] = munch
    if "torchdiffeq" not in sys.modules:
        td = types.ModuleType("torchdiffeq")
        td.odeint = td.odeint_adjoint = lambda *a, **k: None
        sys.modules["torchdiffeq"] = td
    sys.path.insert(0, REFERENCE)
    try:
        import vihds.distributions as ref_dist
        import vihds.training as ref_training
    finally:
        sys.path.pop(0)
    return types.SimpleNamespace(dist=ref_dist, training=ref_training, torch=torch)


def test_normal_lognormal_logprob_parity(ref):
    import torch

    from vihds_tpu.prob import ParamProgram
    from vihds_tpu.prob.sites import ParamSites, Site

    mu, prec = 1.3, 2.7
    prog = ParamProgram(
        ParamSites(
            [],
            [],
            [
                Site("n", tier="global", kind="Normal", init_mu=mu, init_prec=prec),
                Site("ln", tier="global", kind="LogNormal", init_mu=mu, init_prec=prec),
            ],
            [],
        )
    )
    x = np.array([[[0.4, 0.9], [2.0, 3.1]]], np.float32)  # [1, 2, 2]

    ref_n = ref.dist.TfNormal(mu=torch.tensor([mu]), prec=torch.tensor([prec]))
    ref_ln = ref.dist.TfLogNormal(mu=torch.tensor([mu]), prec=torch.tensor([prec]))
    expected_n = ref_n.log_prob(torch.tensor(x[..., 0]), False).numpy()
    expected_ln = ref_ln.log_prob(torch.tensor(x[..., 1]), False).numpy()

    import jax.numpy as jnp

    ours = np.asarray(prog.log_prob(prog.prior_q(), jnp.asarray(x), total=False))
    np.testing.assert_allclose(ours[..., 0], expected_n, rtol=1e-5)
    np.testing.assert_allclose(ours[..., 1], expected_ln, rtol=1e-5)


def test_sample_path_parity(ref):
    """mu + sigma*u (and exp thereof) must match the reference bit-for-bit
    on identical u draws (reference vihds/distributions.py:327-330, 369-371)."""
    import torch

    from vihds_tpu.prob import ParamProgram
    from vihds_tpu.prob.sites import ParamSites, Site

    mu, prec = -0.7, 4.0
    prog = ParamProgram(
        ParamSites(
            [], [], [Site("ln", tier="global", kind="LogNormal", init_mu=mu, init_prec=prec)], []
        )
    )
    u = np.random.RandomState(0).randn(3, 5, 1).astype(np.float32)
    ref_ln = ref.dist.TfLogNormal(mu=torch.tensor([mu]), prec=torch.tensor([prec]))
    expected = ref_ln.sample(torch.tensor(u[..., 0]), False).numpy()
    import jax.numpy as jnp

    ours = np.asarray(prog.sample(prog.prior_q(), jnp.asarray(u)))[..., 0]
    np.testing.assert_allclose(ours, expected, rtol=1e-6)


def test_gaussian_observation_logprob_parity(ref):
    import torch

    from vihds_tpu.ops.logprob import log_prob_gaussian

    rng = np.random.RandomState(1)
    x_obs = rng.rand(2, 1, 4, 7).astype(np.float32)
    x_pred = rng.rand(2, 3, 4, 7).astype(np.float32)
    prec = (0.5 + rng.rand(2, 3, 4, 7)).astype(np.float32)
    expected = ref.training.log_prob_gaussian(
        torch.tensor(x_obs), torch.tensor(x_pred), torch.tensor(prec)
    ).numpy()
    import jax.numpy as jnp

    ours = np.asarray(log_prob_gaussian(jnp.asarray(x_obs), jnp.asarray(x_pred), jnp.asarray(prec)))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_dr_constant_rhs_and_trajectory_parity(ref):
    """Integrate the flagship dr_constant model with the REFERENCE's own RHS
    class + modified-Euler solver and with ours, from identical theta — the
    trajectories must agree to float32 tolerance."""
    import torch

    import jax.numpy as jnp

    from vihds_tpu.models.dr_constant import _dr_constants, _dr_species_rhs
    from vihds_tpu.ops.solvers import integrate

    sys.path.insert(0, REFERENCE)
    try:
        from models.dr_constant import DR_Constant_RHS
        from vihds.solvers import modified_euler_integrate
        from vihds.distributions import DotOperatorSamples
    finally:
        sys.path.pop(0)

    rng = np.random.RandomState(0)
    B, K = 3, 4
    names = [
        "r", "K", "tlag", "rc", "a530", "a480", "drfp", "dyfp", "dcfp", "dR", "dS",
        "e76", "e81", "aCFP", "aYFP", "KGR_76", "KGS_76", "KGR_81", "KGS_81",
        "KR6", "KR12", "KS6", "KS12", "nR", "nS", "aR", "aS",
    ]
    vals = {n: (0.1 + rng.rand(B, K)).astype(np.float32) for n in names}
    treatments = np.log1p(rng.rand(B, 2) * 100).astype(np.float32)
    y0 = (0.01 * rng.rand(B, K, 8)).astype(np.float32)
    times = np.linspace(0.0, 10.0, 21).astype(np.float32)

    # reference side
    theta_ref = DotOperatorSamples()
    for n in names:
        theta_ref.add(n, torch.tensor(vals[n]))
    rhs_ref = DR_Constant_RHS(None, theta_ref, torch.tensor(treatments), None, version=1)
    sol_ref = modified_euler_integrate(
        rhs_ref, torch.tensor(y0), torch.tensor(times)
    ).detach().numpy()  # [T, B, K, S]

    # our side
    th = {n: jnp.asarray(vals[n]) for n in names}
    c = _dr_constants(th, jnp.asarray(treatments), 1)
    rhs = lambda t, y: _dr_species_rhs(c, t, y)
    sol = np.asarray(integrate(rhs, jnp.asarray(y0), jnp.asarray(times), method="modeuler"))

    np.testing.assert_allclose(sol, sol_ref, rtol=5e-4, atol=1e-6)


def test_clip_parity(ref):
    """p.clip bounds: mu +- s*sigma, exp-transformed for LogNormal
    (reference vihds/distributions.py:332-336, 377-381)."""
    import torch

    from vihds_tpu.prob import ParamProgram
    from vihds_tpu.prob.sites import ParamSites, Site

    mu, prec = 0.3, 0.25
    prog = ParamProgram(
        ParamSites(
            [],
            [],
            [
                Site("n", tier="global", kind="Normal", init_mu=mu, init_prec=prec),
                Site("ln", tier="global", kind="LogNormal", init_mu=mu, init_prec=prec),
            ],
            [],
        )
    )
    x = np.array([[[50.0, 1e6]]], np.float32)
    ref_n = ref.dist.TfNormal(mu=torch.tensor([mu]), prec=torch.tensor([prec]))
    ref_ln = ref.dist.TfLogNormal(mu=torch.tensor([mu]), prec=torch.tensor([prec]))
    exp_n = ref_n.clip(torch.tensor(x[..., 0]), stddevs=4).numpy()
    exp_ln = ref_ln.clip(torch.tensor(x[..., 1]), stddevs=4).numpy()
    import jax.numpy as jnp

    ours = np.asarray(prog.clip(jnp.asarray(x), stddevs=4))
    np.testing.assert_allclose(ours[..., 0], exp_n, rtol=1e-6)
    np.testing.assert_allclose(ours[..., 1], exp_ln, rtol=1e-5)
