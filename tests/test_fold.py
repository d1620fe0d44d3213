"""Fused online-log-likelihood training path (integrate_fold /
simulate_logprob / forward_logprob): the IWAE objective and its gradients
must match the trajectory-materialising path — same math, accumulated per
solver step instead of summed over a stored [B,K,S,T] buffer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import make_args, spec
from vihds_tpu.config import Config
from vihds_tpu.data.datasets import build_datasets
from vihds_tpu.prob import ParamProgram, parse_parameters
from vihds_tpu.training import batch_arrays, iwae_elbo, iwae_elbo_terms
from vihds_tpu.vae import VAE

N, K = 5, 6


def _setup(name, use_laplace=False):
    args = make_args(spec(name))
    settings = Config(args)
    if use_laplace:
        settings.params.use_laplace = True
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = batch_arrays(data.train.dataset.select(np.arange(N)))
    return program, model, params, batch


def _losses(name, checkpoint, use_laplace=False):
    program, model, params, batch = _setup(name, use_laplace=use_laplace)
    assert model.use_laplace == use_laplace
    assert model.ode_model.supports_fold()
    key = jax.random.PRNGKey(7)
    mask = jnp.ones((N,), jnp.float32)

    def loss_traj(params):
        u = model.sample_u(key, N, K)
        out = model.forward(params, batch, u, checkpoint=checkpoint)
        terms = iwae_elbo_terms(program, out, batch, model.use_laplace)
        return -iwae_elbo(terms, mask)

    def loss_fold(params):
        u = model.sample_u(key, N, K)
        out = model.forward_logprob(params, batch, u, checkpoint=checkpoint)
        log_w = (
            out.log_p_by_species.sum(axis=2)
            + program.log_prob(program.prior_q(), out.theta)
            - program.log_prob(out.q, out.theta)
        )
        lse = jax.scipy.special.logsumexp(log_w, axis=1)
        return -((lse - jnp.log(float(K))) * mask).sum() / mask.sum()

    return params, loss_traj, loss_fold


@pytest.mark.parametrize(
    "name",
    [
        "dr_constant_one.yaml",  # constant precisions, no conditioning
        "dr_constant_icml.yaml",  # constant precisions + device conditioner
        "dr_constant_precisions.yaml",  # neural (dynamic) precisions
        "auto_constant.yaml",  # 4-state observe override
    ],
)
def test_fold_matches_trajectory_value_and_grad(name):
    params, loss_traj, loss_fold = _losses(name, checkpoint=True)
    v1, g1 = jax.value_and_grad(loss_traj)(params)
    v2, g2 = jax.value_and_grad(loss_fold)(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-5)
    l1 = jax.tree_util.tree_leaves(g1)
    l2 = jax.tree_util.tree_leaves(g2)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        a, b = np.asarray(a), np.asarray(b)
        # identical math, different float32 accumulation order
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_fold_matches_trajectory_laplace():
    """use_laplace: the fold path must dispatch the Laplace log-lik too."""
    params, loss_traj, loss_fold = _losses("dr_constant_one.yaml", checkpoint=True, use_laplace=True)
    v1 = loss_traj(params)
    v2 = loss_fold(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-5)


def test_training_uses_fold_and_converges_same():
    """One fused-epoch dispatch through Training._build_steps with the fold
    path active produces finite, improving ELBOs (smoke at training scale)."""
    args = make_args(spec("dr_constant_one.yaml"))
    settings = Config(args)
    settings.trainer = None
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    from vihds_tpu.training import Training

    tr = Training(args, settings, data, program, model)
    assert model.ode_model.supports_fold()
    res = tr.run()
    assert res is not None
    assert np.isfinite(res.elbo_list).all()


def test_adjoint_config_disables_fold():
    args = make_args(spec("dr_constant_one.yaml"))
    settings = Config(args)
    settings.params.adjoint_solver = True
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    assert not model.ode_model.supports_fold()
