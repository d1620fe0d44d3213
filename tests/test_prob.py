"""Distribution-program unit tests: closed-form log-probs, reparameterised
sampling, clipping, dependency resolution, tier ordering."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats

from vihds_tpu.prob import ParamProgram, parse_parameters
from vihds_tpu.prob.sites import Site, ParamSites

LOG2PI = np.log(2 * np.pi)


def make_program(sites_by_tier):
    return ParamProgram(
        ParamSites(
            sites_by_tier.get("local", []),
            sites_by_tier.get("global_cond", []),
            sites_by_tier.get("global", []),
            sites_by_tier.get("constant", []),
        )
    )


def test_normal_log_prob_matches_reference_formula():
    prog = make_program({"global": [Site("a", tier="global", kind="Normal", init_mu=1.5, init_prec=4.0)]})
    theta = jnp.array([[[0.7]]])
    lp = np.asarray(prog.log_prob(prog.prior_q(), theta))
    # Reference formula: -log(2 pi) + 0.5 log(prec) - 0.5 prec (mu-x)^2
    expected = -LOG2PI + 0.5 * np.log(4.0 + 1e-12) - 0.5 * 4.0 * (1.5 - 0.7) ** 2
    np.testing.assert_allclose(lp[0, 0], expected, rtol=1e-6)
    # differs from the canonical density only by the constant 0.5*log(2 pi)
    canonical = scipy.stats.norm(1.5, 0.5).logpdf(0.7)
    np.testing.assert_allclose(lp[0, 0] - canonical, -0.5 * LOG2PI, rtol=1e-5)


def test_lognormal_log_prob_and_sampling():
    mu, prec = -1.0, 2.0
    prog = make_program({"global": [Site("a", tier="global", kind="LogNormal", init_mu=mu, init_prec=prec)]})
    u = jnp.array([[[0.3]]])
    theta = prog.sample(prog.prior_q(), u)
    sigma = 1 / np.sqrt(prec)
    np.testing.assert_allclose(np.asarray(theta)[0, 0, 0], np.exp(mu + sigma * 0.3), rtol=1e-6)
    lp = np.asarray(prog.log_prob(prog.prior_q(), theta))[0, 0]
    x = float(np.asarray(theta)[0, 0, 0])
    canonical = scipy.stats.lognorm(s=sigma, scale=np.exp(mu)).logpdf(x)
    np.testing.assert_allclose(lp - canonical, -0.5 * LOG2PI, rtol=1e-3)


def test_constant_site_sampling_and_zero_logprob():
    prog = make_program(
        {
            "global": [Site("a", tier="global", kind="Normal")],
            "constant": [Site("c", tier="constant", kind="Constant", init_mu=0.002)],
        }
    )
    u = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 2))
    theta = prog.sample(prog.prior_q(), u)
    np.testing.assert_allclose(np.asarray(theta)[:, :, 1], 0.002, rtol=1e-6)
    lp_sites = np.asarray(prog.log_prob(prog.prior_q(), theta, total=False))
    np.testing.assert_allclose(lp_sites[:, :, 1], 0.0)


def test_truncated_normal_sample_and_log_prob():
    prog = make_program(
        {"global": [Site("a", tier="global", kind="TruncatedNormal", init_mu=0.0, init_prec=1.0, a=-1.0, b=2.0)]}
    )
    u = jax.random.normal(jax.random.PRNGKey(1), (1, 20000, 1))
    theta = np.asarray(prog.sample(prog.prior_q(), u))
    assert (theta >= -1.0).all() and (theta <= 2.0).all()
    ref = scipy.stats.truncnorm(-1.0, 2.0, loc=0.0, scale=1.0)
    np.testing.assert_allclose(theta.mean(), ref.mean(), atol=0.02)
    lp = np.asarray(prog.log_prob(prog.prior_q(), jnp.asarray(theta)))[0]
    # our truncnorm subtracts the correctly sigma-standardised log Z
    np.testing.assert_allclose(
        lp - ref.logpdf(theta[0, :, 0]), -0.5 * LOG2PI, atol=1e-4
    )


def test_kumaraswamy_sample_support_and_log_prob():
    prog = make_program(
        {"global": [Site("k", tier="global", kind="Kumaraswamy", init_mu=2.0, init_prec=3.0)]}
    )
    u = jax.random.normal(jax.random.PRNGKey(2), (1, 20000, 1))
    theta = np.asarray(prog.sample(prog.prior_q(), u))
    assert (theta > 0).all() and (theta < 1).all()
    # E[X] for Kumaraswamy(a,b) = b B(1+1/a, b)
    from scipy.special import beta as B

    np.testing.assert_allclose(theta.mean(), 3.0 * B(1 + 1 / 2.0, 3.0), atol=0.02)
    x = theta[0, :5, 0]
    lp = np.asarray(prog.log_prob(prog.prior_q(), jnp.asarray(theta)))[0, :5]
    a, b = 2.0, 3.0
    expected = np.log(a) + np.log(b) + (a - 1) * np.log(x) + (b - 1) * np.log1p(-(x ** a))
    np.testing.assert_allclose(lp, expected, rtol=1e-4)


def test_clip_bounds_prior_4_sigma():
    prog = make_program(
        {
            "global": [
                Site("n", tier="global", kind="Normal", init_mu=1.0, init_prec=4.0),
                Site("ln", tier="global", kind="LogNormal", init_mu=0.0, init_prec=1.0),
            ],
            "constant": [Site("c", tier="constant", kind="Constant", init_mu=7.0)],
        }
    )
    theta = jnp.array([[[100.0, 1e9, 7.0]]])
    clipped = np.asarray(prog.clip(theta, stddevs=4))
    np.testing.assert_allclose(clipped[0, 0, 0], 1.0 + 4 * 0.5)
    np.testing.assert_allclose(clipped[0, 0, 1], np.exp(4.0), rtol=1e-6)
    np.testing.assert_allclose(clipped[0, 0, 2], 7.0)  # constants never clipped


def test_dependency_slots_topological():
    # b's mu is a's sample (string-valued dependency, reference
    # vihds/parameters.py:36-49 / distributions.py:119-142)
    sites = {
        "global": [
            Site("b", tier="global", kind="Normal", init_mu=0.0, init_prec=1e8, mu_dep="a"),
            Site("a", tier="global", kind="Normal", init_mu=3.0, init_prec=1e8),
        ]
    }
    prog = make_program(sites)
    u = jnp.zeros((1, 1, 2))
    theta = np.asarray(prog.sample(prog.prior_q(), u))
    # with ~zero noise, b should equal a's sample = 3.0
    np.testing.assert_allclose(theta[0, 0, 0], 3.0, atol=1e-3)
    np.testing.assert_allclose(theta[0, 0, 1], 3.0, atol=1e-3)


def test_yaml_tier_ordering_matches_reference_concat():
    params = {
        "constant": {"c1": 1.0},
        "shared": {"tmpl": {"distribution": "LogNormal", "mu": 0.0, "sigma": 2.0}},
        "global": {"g1": {"distribution": "tmpl"}, "g2": {"distribution": "Normal", "mu": 1.0, "sigma": 1.0}},
        "global_conditioned": {
            "conditioning": {"devices": True, "treatments": False},
            "gc1": {"distribution": "tmpl"},
        },
        "local": {
            "conditioning": {"devices": True, "treatments": False},
            "l1": {"distribution": "LogNormal", "mu": 0.0, "prec": 2.0},
        },
    }
    prog = ParamProgram(parse_parameters(params))
    # concat order: local | global_cond | global | constant
    # (reference vihds/encoders.py:402)
    assert prog.names == ["l1", "gc1", "g1", "g2", "c1"]
    # shared template resolution: g1/gc1 get the template's sigma
    np.testing.assert_allclose(prog.prior_prec[prog.index["g1"]], 1.0 / 4.0)
    # 'prec' spec taken directly
    np.testing.assert_allclose(prog.prior_prec[prog.index["l1"]], 2.0)
    assert prog.sites.ordered[0].cond_devices and not prog.sites.ordered[0].cond_treatments


def test_locals_cannot_inherit_from_global():
    params = {
        "global": {"g1": {"distribution": "Normal", "mu": 0.0, "sigma": 1.0}},
        "local": {"l1": {"distribution": "g1"}},
    }
    with pytest.raises(ValueError):
        parse_parameters(params)


def test_dependent_truncated_and_kumaraswamy_sites():
    """Sites whose parameter slots depend on OTHER sampled sites must still be
    drawn with their own bijection (truncation / Kumaraswamy inverse-CDF), so
    samples stay in-support and agree with the density log_prob scores."""
    sites = {
        "global": [
            Site("m", tier="global", kind="Normal", init_mu=0.5, init_prec=1e8),
            Site("ak", tier="global", kind="Normal", init_mu=2.0, init_prec=1e8),
            Site(
                "t", tier="global", kind="TruncatedNormal",
                init_mu=0.0, init_prec=1.0, a=0.0, b=2.0, mu_dep="m",
            ),
            Site(
                "k", tier="global", kind="Kumaraswamy",
                init_mu=1.0, init_prec=3.0, mu_dep="ak",
            ),
        ]
    }
    prog = make_program(sites)
    u = jax.random.normal(jax.random.PRNGKey(3), (1, 40000, 4))
    theta = np.asarray(prog.sample(prog.prior_q(), u))
    names = list(prog.names)
    t = theta[0, :, names.index("t")]
    k = theta[0, :, names.index("k")]
    # truncated site with dep mu=0.5: in [0,2], matching scipy moments
    assert (t >= 0.0).all() and (t <= 2.0).all()
    ref = scipy.stats.truncnorm(-0.5, 1.5, loc=0.5, scale=1.0)
    np.testing.assert_allclose(t.mean(), ref.mean(), atol=0.02)
    np.testing.assert_allclose(t.std(), ref.std(), atol=0.02)
    # kumaraswamy site with dep a=2.0, b=3.0: in (0,1), matching E[X]
    from scipy.special import beta as B

    assert (k > 0.0).all() and (k < 1.0).all()
    np.testing.assert_allclose(k.mean(), 3.0 * B(1 + 1 / 2.0, 3.0), atol=0.02)
