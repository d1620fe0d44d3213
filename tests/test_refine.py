"""Posterior refinement (HMC, SMC): finiteness, acceptance behaviour, and
improvement of the joint over the amortised initialisation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import make_args, spec
from vihds_tpu import refine
from vihds_tpu.config import Config
from vihds_tpu.data.datasets import build_datasets
from vihds_tpu.prob import ParamProgram, parse_parameters
from vihds_tpu.training import batch_arrays
from vihds_tpu.vae import VAE

N = 4


@pytest.fixture(scope="module")
def setup():
    args = make_args(spec("dr_constant_one.yaml"))
    settings = Config(args)
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = batch_arrays(data.train.dataset.select(np.arange(N)))
    return program, model, params, batch


def test_hmc_refine(setup):
    program, model, params, batch = setup
    out = refine.hmc_refine(
        model, program, params, batch, jax.random.PRNGKey(1), n_chains=8, n_steps=10, n_leapfrog=3
    )
    assert out.theta.shape == (N, 8, program.n_theta)
    assert np.isfinite(np.asarray(out.theta)).all()
    acc = np.asarray(out.accept_rate)
    assert (acc >= 0).all() and (acc <= 1).all()
    # the dual-averaged step size should land well above a broken sampler's
    # floor (the refine demo on a trained checkpoint reaches ~97% acceptance)
    assert acc.mean() > 0.3, "HMC acceptance %.3f < 0.3 — step size badly tuned" % acc.mean()
    # constants untouched
    const_cols = np.where(program.is_constant)[0]
    for c in const_cols:
        np.testing.assert_allclose(
            np.asarray(out.theta)[:, :, c], program.const_value[c], rtol=1e-6
        )
    # chains should (weakly) improve the joint over their start
    trace = np.asarray(out.log_joint_trace)
    assert np.isfinite(trace).all()
    assert trace[-1] >= trace[0] - 1.0


def test_hmc_site_mask_cut_inference(setup):
    """With a local-sites-only site_mask, HMC moves ONLY the masked sites;
    every other site keeps its per-chain amortised-q draw (cut inference:
    shared sites integrated over q)."""
    program, model, params, batch = setup
    local_mask = np.zeros(program.n_theta, np.float32)
    sl = program.local_slice
    movable = program.is_normal_family & ~program.is_constant
    local_mask[sl] = movable[sl].astype(np.float32)
    out = refine.hmc_refine(
        model, program, params, batch, jax.random.PRNGKey(4),
        n_chains=6, n_steps=8, n_leapfrog=3, site_mask=jnp.asarray(local_mask),
    )
    z, z0 = np.asarray(out.z), np.asarray(out.z_init)
    frozen = local_mask == 0
    np.testing.assert_array_equal(z[:, :, frozen], z0[:, :, frozen])
    moved = np.abs(z[:, :, local_mask > 0] - z0[:, :, local_mask > 0]).max()
    assert moved > 0, "masked-in local sites never moved"
    assert np.isfinite(np.asarray(out.theta)).all()


def test_hmc_refine_pooled(setup):
    """Pooled joint HMC: shared sites carry ONE value per chain across every
    series (the true hierarchical joint), locals vary per series; the tying
    is exact in the returned samples."""
    program, model, params, batch = setup
    K = 4
    out = refine.hmc_refine_pooled(
        model, program, params, batch, jax.random.PRNGKey(5),
        n_chains=K, n_steps=8, n_leapfrog=3,
    )
    th = np.asarray(out.theta)
    assert th.shape == (N, K, program.n_theta)
    assert np.isfinite(th).all()
    g = program.global_slice
    np.testing.assert_array_equal(
        th[:, :, g], np.broadcast_to(th[0:1, :, g], th[:, :, g].shape)
    )
    sl = program.local_slice
    assert np.ptp(th[:, :, sl], axis=0).max() > 0
    acc = np.asarray(out.accept_rate)
    assert acc.shape == (K,)
    assert (acc >= 0).all() and (acc <= 1).all()
    const_cols = np.where(program.is_constant)[0]
    for c in const_cols:
        np.testing.assert_allclose(th[:, :, c], program.const_value[c], rtol=1e-6)
    assert np.isfinite(np.asarray(out.log_joint_trace)).all()


def test_smc_refine(setup):
    program, model, params, batch = setup
    out = refine.smc_refine(
        model,
        program,
        params,
        batch,
        jax.random.PRNGKey(2),
        n_particles=16,
        n_temps=4,
        n_moves=1,
        n_leapfrog=2,
    )
    assert out.theta.shape == (N, 16, program.n_theta)
    assert np.isfinite(np.asarray(out.theta)).all()
    log_Z = np.asarray(out.log_evidence)
    assert log_Z.shape == (N,)
    assert np.isfinite(log_Z).all()
    ess = np.asarray(out.ess_trace)
    assert (ess > 0).all() and (ess <= 16 + 1e-3).all()


def test_log_joint_matches_elbo_terms(setup):
    """The refinement target must agree with the training-side decomposition:
    log_joint(z) == log p(x|theta) + log p(theta) + log|Jacobian| folded away,
    checked against iwae_elbo_terms on the same draw."""
    program, model, params, batch = setup
    from vihds_tpu.training import iwae_elbo_terms

    key = jax.random.PRNGKey(3)
    u = model.sample_u(key, N, 5)
    out = model.forward(params, batch, u)
    terms = iwae_elbo_terms(program, out, batch, model.use_laplace)

    # same theta, via the refinement path: z = log(theta) on LogNormal sites
    theta = out.theta
    z = np.where(program.is_lognormal, np.log(np.maximum(np.asarray(theta), 1e-30)), np.asarray(theta))
    log_joint = refine.make_log_joint(model, program, params, batch)(jnp.asarray(z))
    # log_joint = log_lik + log N(z; prior).  The training side uses
    # log p(theta) with the reference's -log(2pi) constant and the LogNormal
    # Jacobian; in z-space the Jacobian cancels and the constant differs by
    # 0.5*log(2pi) per sampled site.  Check agreement up to that constant.
    n_sampled = int((program.is_normal_family & ~program.is_constant).sum())
    jac = np.where(
        program.is_lognormal, -np.log(np.maximum(np.asarray(theta), 1e-30)), 0.0
    ).sum(-1)
    expected = np.asarray(terms.log_p_obs + terms.log_p) - jac + 0.5 * np.log(2 * np.pi) * n_sampled
    np.testing.assert_allclose(np.asarray(log_joint), expected, rtol=1e-3, atol=0.5)
