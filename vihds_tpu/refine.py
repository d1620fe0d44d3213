"""Posterior refinement beyond amortised VI: HMC over the latent parameters
and an SMC sampler that anneals from the amortised q to the true posterior.

This is the "beyond-parity" capability called out in BASELINE.json's north
star (the reference stops at the amortised IWAE posterior).  Both samplers:

  * work per-datapoint, vectorised over [B (datapoints), K (chains/particles)]
    — the same two axes the training step shards over a (data, sample) mesh,
    so the refinement runs unchanged on 1 chip or a pod slice;
  * operate in the UNCONSTRAINED space z (LogNormal sites sample log theta),
    where the prior is exactly Normal(prior_mu, prior_prec) and the Jacobian
    cancels — no change-of-variable corrections needed;
  * reuse the decoder (condition -> integrate -> observe -> log-lik) as the
    likelihood, so any registered model works.

Constant sites stay fixed.  Round 4 completes the site vocabulary: both
bounded families are refined through support bijections with exact
log-Jacobians — TruncatedNormal via sigmoid (two-sided) / exp (one-sided)
onto (a, b), Kumaraswamy via sigmoid onto (zmin, zmax) — so the samplers
target exactly the bounded posteriors (VERDICT r3 #7; both distributions
are unimplemented stubs in the reference,
/root/reference/vihds/distributions.py:384-464, 498-507).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import norm as jnorm

from vihds_tpu.ops.logprob import log_prob_observations
from vihds_tpu.utils.attrdict import AttrDict

LOG2PI = math.log(2.0 * math.pi)
# bound on |z| inside exp/sigmoid of masked truncation branches: keeps the
# discarded branches' primals finite so jnp.where gradients stay NaN-free
_ZCAP = 30.0


def _sampled_mask(program):
    """Which theta columns the samplers move: every non-constant site
    (bounded families move through the support bijections below).
    Dependent-site (a, b)/(mu, prec) wiring is held at the PRIOR values —
    the same static-prior convention the whole module uses."""
    return jnp.asarray((~program.is_constant).astype(np.float32))


def _trunc_cases(program):
    """(two_sided, lower_only, upper_only) boolean masks over theta columns."""
    lo = np.isfinite(program.trunc_a) & program.is_truncated
    hi = np.isfinite(program.trunc_b) & program.is_truncated
    return lo & hi, lo & ~hi, hi & ~lo


def _constrain_truncated(program, z):
    """z -> theta on the truncation support (garbage on other columns):
    two-sided a + (b-a)*sigmoid(z); one-sided a + e^z / b - e^z."""
    two, lo, hi = _trunc_cases(program)
    a, b = program._trunc_a_safe, program._trunc_b_safe
    zc = jnp.clip(z, -_ZCAP, _ZCAP)
    th = a + (b - a) * jax.nn.sigmoid(zc)
    th = jnp.where(lo, a + jnp.exp(zc), th)
    th = jnp.where(hi, b - jnp.exp(zc), th)
    return th


def _log_jac_truncated(program, z):
    """log |d theta / d z| of _constrain_truncated (garbage elsewhere)."""
    two, lo, hi = _trunc_cases(program)
    a, b = program._trunc_a_safe, program._trunc_b_safe
    zc = jnp.clip(z, -_ZCAP, _ZCAP)
    # log(b-a) + log sigmoid(z) + log sigmoid(-z); one-sided: z
    lj = jnp.log(jnp.maximum(b - a, 1e-12)) - jax.nn.softplus(-zc) - jax.nn.softplus(zc)
    return jnp.where(two, lj, zc)


def _constrain_kuma(program, z):
    """z -> theta on the Kumaraswamy support [zmin, zmax] (garbage on other
    columns): zmin + (zmax - zmin) * sigmoid(z)."""
    zc = jnp.clip(z, -_ZCAP, _ZCAP)
    return program.zmin + (program.zmax - program.zmin) * jax.nn.sigmoid(zc)


def _log_jac_kuma(program, z):
    zc = jnp.clip(z, -_ZCAP, _ZCAP)
    zr = jnp.maximum(program.zmax - program.zmin, 1e-12)
    return jnp.log(zr) - jax.nn.softplus(-zc) - jax.nn.softplus(zc)


def _log_kuma_pdf(program, theta, a, b):
    """Kumaraswamy(a, b) log-density at theta on [zmin, zmax] (the (mu,
    prec) slots carry (a, b) — same convention as ParamProgram.log_prob)."""
    zr = jnp.maximum(program.zmax - program.zmin, 1e-12)
    v = jnp.clip((theta - program.zmin) / zr, 1e-6, 1.0 - 1e-6)
    return (
        jnp.log(a) + jnp.log(b)
        + (a - 1.0) * jnp.log(v)
        + (b - 1.0) * jnp.log1p(-(v ** a))
        - jnp.log(zr)
    )


def unconstrain_kuma(program, theta):
    zr = jnp.maximum(program.zmax - program.zmin, 1e-12)
    v = jnp.clip((theta - program.zmin) / zr, 1e-6, 1.0 - 1e-6)
    return jnp.log(v) - jnp.log1p(-v)


def unconstrain_truncated(program, theta):
    """Inverse of _constrain_truncated on the truncated columns."""
    two, lo, hi = _trunc_cases(program)
    a, b = program._trunc_a_safe, program._trunc_b_safe
    eps = 1e-6
    ta = jnp.maximum(theta - a, eps)
    bt = jnp.maximum(b - theta, eps)
    z = jnp.log(ta) - jnp.log(bt)  # logit((theta-a)/(b-a)) up to the (b-a) scale
    z = jnp.where(lo, jnp.log(ta), z)
    z = jnp.where(hi, jnp.log(bt), z)
    return z


def constrain_z(program, z):
    """Unconstrained z -> constrained theta (exp for LogNormal, bounded
    bijection for TruncatedNormal, fixed for constants)."""
    theta = jnp.where(program.is_lognormal, jnp.exp(z), z)
    if program.is_truncated.any():
        theta = jnp.where(program.is_truncated, _constrain_truncated(program, z), theta)
    if program.is_kumaraswamy.any():
        theta = jnp.where(program.is_kumaraswamy, _constrain_kuma(program, z), theta)
    theta = jnp.where(program.is_constant, program.const_value, theta)
    return theta


def log_prior_z_cols(program, z, idx=None):
    """Per-site prior log-density IN z-SPACE, [..., n_idx] over theta
    columns ``idx`` (default: all).

    Normal/LogNormal sites: exactly N(z; prior_mu, prior_prec) (the
    LogNormal Jacobian cancels — z IS log theta there).  TruncatedNormal
    sites: TN(theta(z); prior, a, b) + log|d theta/d z| so that HMC in z
    targets exactly the truncated prior."""
    idx = np.arange(program.n_theta) if idx is None else np.asarray(idx)
    mu = jnp.asarray(program.prior_mu[idx])
    prec = jnp.asarray(program.prior_prec[idx])
    lp = _normal_logpdf(z, mu, prec)
    if not (program.is_truncated[idx].any() or program.is_kumaraswamy[idx].any()):
        return lp
    # full-width bounded-family machinery, then select the idx columns
    full = jnp.zeros(z.shape[:-1] + (program.n_theta,), z.dtype)
    zf = full.at[..., idx].set(z)
    if program.is_truncated[idx].any():
        theta = _constrain_truncated(program, zf)
        sigma = 1.0 / jnp.sqrt(jnp.asarray(program.prior_prec))
        A = (program._trunc_a_safe - program.prior_mu) / sigma
        B = (program._trunc_b_safe - program.prior_mu) / sigma
        logZ = jnp.log(jnp.maximum(jnorm.cdf(B) - jnorm.cdf(A), 1e-12))
        lp_t = (
            _normal_logpdf(theta, jnp.asarray(program.prior_mu), jnp.asarray(program.prior_prec))
            - logZ
            + _log_jac_truncated(program, zf)
        )[..., idx]
        lp = jnp.where(jnp.asarray(program.is_truncated[idx]), lp_t, lp)
    if program.is_kumaraswamy[idx].any():
        # (mu, prec) slots carry (a, b); guard the discarded columns with 1s
        a_k = jnp.where(program.is_kumaraswamy, program.prior_mu, 1.0)
        b_k = jnp.where(program.is_kumaraswamy, program.prior_prec, 1.0)
        lp_k = (
            _log_kuma_pdf(program, _constrain_kuma(program, zf), a_k, b_k)
            + _log_jac_kuma(program, zf)
        )[..., idx]
        lp = jnp.where(jnp.asarray(program.is_kumaraswamy[idx]), lp_k, lp)
    return lp


def make_log_lik(model, program, params, batch):
    """log p(x_b | theta_bk) as a pure function of theta[B,K,n]."""
    n_times = batch.times.shape[0]

    def log_lik(theta):
        th = program.theta_dict(program.clip(theta, stddevs=4))
        if model.condition_on_device:
            th = model.ode_model.condition_theta(params["dec"], th, batch.dev_1hot)
        sol = model.ode_model.simulate(
            params["dec"], th, batch.times, batch.inputs, batch.dev_1hot, n_iwae=theta.shape[1]
        )
        x_states, precisions = model.ode_model.expand_precisions(params["dec"], th, n_times, sol)
        x_predict = model.ode_model.observe(x_states, th)
        lp = log_prob_observations(x_predict, batch.observations, precisions, model.use_laplace)
        return lp.sum(axis=2)  # [B, K]

    return log_lik


def _normal_logpdf(z, mu, prec):
    return -0.5 * LOG2PI + 0.5 * jnp.log(prec) - 0.5 * prec * (z - mu) ** 2


def make_log_joint(model, program, params, batch, site_mask=None):
    """log p(x, z) = log p(x | T(z)) + N(z; prior) summed over sampled sites.

    ``site_mask`` restricts which theta columns contribute the prior term
    (defaults to every non-constant normal-family site); pass e.g. a
    local-sites-only mask for cut inference where the frozen sites' values
    ride in z but are not part of the target."""
    log_lik = make_log_lik(model, program, params, batch)
    mask = _sampled_mask(program) if site_mask is None else site_mask

    def log_joint(z):
        lp_prior = (log_prior_z_cols(program, z) * mask).sum(-1)
        return log_lik(constrain_z(program, z)) + lp_prior

    return log_joint


def z_from_u(program, u, mu_b, prec_b):
    """Map standard normals u [..., n_theta] through q's reparameterisation
    to unconstrained z (q's mu/prec parameterise z directly for
    Normal/LogNormal sites; TruncatedNormal sites draw theta by inverse CDF
    — exactly program.sample's rule — and map through the bijection;
    Kumaraswamy via its inverse CDF).  mu_b/prec_b broadcast against u."""
    sigma_b = 1.0 / jnp.sqrt(jnp.maximum(prec_b, 1e-12))
    z = mu_b + sigma_b * u
    if program.is_truncated.any():
        from jax.scipy.special import ndtri

        sig_safe = jnp.where(program.is_truncated, sigma_b, 1.0)
        A = (program._trunc_a_safe - mu_b) / sig_safe
        B = (program._trunc_b_safe - mu_b) / sig_safe
        PhiA, PhiB = jnorm.cdf(A), jnorm.cdf(B)
        vv = jnp.clip(PhiA + jnorm.cdf(u) * (PhiB - PhiA), 1e-6, 1.0 - 1e-6)
        theta_t = mu_b + sig_safe * ndtri(vv)
        z = jnp.where(program.is_truncated, unconstrain_truncated(program, theta_t), z)
    if program.is_kumaraswamy.any():
        # program.sample's rule: x = zmin + zr*(1-(1-v)^(1/b))^(1/a), v=Phi(u)
        v = jnp.clip(jnorm.cdf(u), 1e-6, 1.0 - 1e-6)
        a_k = jnp.where(program.is_kumaraswamy, mu_b, 1.0)
        b_k = jnp.where(program.is_kumaraswamy, prec_b, 1.0)
        x = program.zmin + (program.zmax - program.zmin) * (
            1.0 - (1.0 - v) ** (1.0 / b_k)
        ) ** (1.0 / a_k)
        z = jnp.where(program.is_kumaraswamy, unconstrain_kuma(program, x), z)
    return z


def init_z_from_q(model, program, params, batch, key, n_samples):
    """Draw z ~ q in unconstrained space (see ``z_from_u`` for the
    per-family reparameterisation rules).  The draw is sharded over the
    ambient (data, sample) mesh like the training u — chains/particles
    parallelise across chips."""
    from vihds_tpu import parallel

    q = model.encoder(params["enc"], batch)
    u = parallel.constrain_u(
        jax.random.normal(key, (q.mu.shape[0], n_samples, program.n_theta), jnp.float32)
    )
    mu_b, prec_b = q.mu[:, None, :], q.prec[:, None, :]
    z = z_from_u(program, u, mu_b, prec_b)
    log_q = (log_q_z_sites(program, z, mu_b, prec_b) * _sampled_mask(program)).sum(-1)
    return z, log_q, q


def log_q_z_sites(program, z, mu_b, prec_b):
    """Per-site log q IN z-SPACE: plain Normal for Normal/LogNormal sites
    (q parameterises z directly); for TruncatedNormal sites q parameterises
    theta-space, so TN(theta(z); q, a, b) + log|d theta/d z|; for
    Kumaraswamy sites the (mu, prec) slots carry q's (a, b)."""
    lq = _normal_logpdf(z, mu_b, prec_b)
    if program.is_truncated.any():
        sigma_b = 1.0 / jnp.sqrt(jnp.maximum(prec_b, 1e-12))
        sig_safe = jnp.where(program.is_truncated, sigma_b, 1.0)
        A = (program._trunc_a_safe - mu_b) / sig_safe
        B = (program._trunc_b_safe - mu_b) / sig_safe
        logZ = jnp.log(jnp.maximum(jnorm.cdf(B) - jnorm.cdf(A), 1e-12))
        lq_t = (
            _normal_logpdf(_constrain_truncated(program, z), mu_b, prec_b)
            - logZ
            + _log_jac_truncated(program, z)
        )
        lq = jnp.where(program.is_truncated, lq_t, lq)
    if program.is_kumaraswamy.any():
        a_k = jnp.where(program.is_kumaraswamy, mu_b, 1.0)
        b_k = jnp.where(program.is_kumaraswamy, prec_b, 1.0)
        lq_k = (
            _log_kuma_pdf(program, _constrain_kuma(program, z), a_k, b_k)
            + _log_jac_kuma(program, z)
        )
        lq = jnp.where(program.is_kumaraswamy, lq_k, lq)
    return lq


# --------------------------------------------------------------------------- #
# HMC
# --------------------------------------------------------------------------- #
def hmc_refine(
    model,
    program,
    params,
    batch,
    key,
    n_chains=32,
    n_steps=50,
    n_leapfrog=5,
    step_scale=0.05,
    target_accept=0.7,
    site_mask=None,
    return_trace=False,
    init_inflate=1.0,
    mass_from_q=False,
    adapt_mass=False,
):
    """HMC over z, one chain per (datapoint, sample) pair, initialised at q.

    The mass matrix is the diagonal prior precision, so the per-site step is
    automatically scaled by the prior sigma; ``step_scale`` seeds a per-chain
    step size that is Robbins-Monro-adapted toward ``target_accept`` during
    the first half of the run.  Returns refined theta samples and diagnostics
    (including ``z_init``, the amortised starting draw).

    ``mass_from_q=True`` preconditions the kinetic mass with each SERIES'
    amortised q precision instead of the prior's — per-series posterior
    curvature the encoder already estimated.  On tightly-identified local
    coordinates (posterior sd << prior sd) the prior mass forces the whole
    chain onto the tight coordinate's step scale, crawling the flat ones;
    the q mass restores per-coordinate steps (round 5, for the per-series
    ground-truth yardstick's convergence gate).  Only Normal/LogNormal
    columns use q (bounded-family q parameterises theta-space, not z).

    ``site_mask`` ([n_theta] float, optional) restricts which sites the
    sampler MOVES; unmasked sites keep their per-chain amortised-q draw.
    With a local-sites-only mask this is cut inference: locals are refined
    by HMC per series while the shared sites stay integrated over the
    amortised posterior q."""
    log_joint = make_log_joint(model, program, params, batch, site_mask)
    grad_log_joint = jax.grad(lambda z: log_joint(z).sum())
    mask = _sampled_mask(program) if site_mask is None else site_mask
    prior_prec = jnp.asarray(program.prior_prec)

    key, k0 = jax.random.split(key)
    z, _, q = init_z_from_q(model, program, params, batch, k0, n_chains)
    if mass_from_q:
        z_param = jnp.asarray(
            ~(program.is_truncated | program.is_kumaraswamy), jnp.float32
        )
        mass_prec = jnp.where(
            z_param > 0, jnp.maximum(q.prec, 1e-12), prior_prec
        )[:, None, :]                                    # [L, 1, n]
    else:
        mass_prec = prior_prec
    if init_inflate != 1.0:
        # overdispersed multi-start (z-space inflation about q's mean):
        # init-robustness control for multi-basin posteriors — chains that
        # relax to the same ensemble estimate from inflated starts are not
        # just reporting their initialisation.  Only Normal/LogNormal
        # columns are inflated: there q.mu parameterises z directly; for
        # TruncatedNormal/Kumaraswamy sites q.mu is theta-space (or (a,b)),
        # so z-space inflation about it would mis-center and can saturate
        # the bounded bijection — those columns keep their q draw.
        z_param = jnp.asarray(
            ~(program.is_truncated | program.is_kumaraswamy), z.dtype
        )
        z = z + (init_inflate - 1.0) * z_param * (z - q.mu[:, None, :])
    z_init = z
    n_warmup = n_steps // 2

    def run_phase(z, log_eps, n_accept, m_prec, keys, t0, trace):
        """``n`` scan steps under a fixed mass ``m_prec`` (Robbins-Monro
        step adaptation keeps running for absolute steps < n_warmup)."""
        inv_mass = jnp.where(mask > 0, 1.0 / m_prec, 0.0)
        base_step = jnp.where(mask > 0, 1.0 / jnp.sqrt(m_prec), 0.0)

        def leapfrog(z, p, step):
            g = grad_log_joint(z) * mask
            p = p + 0.5 * step * g
            for _ in range(n_leapfrog - 1):
                z = z + step * inv_mass * p
                g = grad_log_joint(z) * mask
                p = p + step * g
            z = z + step * inv_mass * p
            p = p + 0.5 * step * (grad_log_joint(z) * mask)
            return z, p

        def one_step(carry, inp):
            z, log_eps, n_accept = carry
            key_t, t = inp
            k_mom, k_acc = jax.random.split(key_t)
            step = jnp.exp(log_eps)[:, :, None] * base_step  # per-chain step
            p = jax.random.normal(k_mom, z.shape) * jnp.sqrt(m_prec) * mask
            lj0 = log_joint(z)
            ke0 = 0.5 * (p ** 2 * inv_mass).sum(-1)
            z_new, p_new = leapfrog(z, p, step)
            lj1 = log_joint(z_new)
            ke1 = 0.5 * (p_new ** 2 * inv_mass).sum(-1)
            log_alpha = jnp.nan_to_num((lj1 - ke1) - (lj0 - ke0), nan=-jnp.inf)
            alpha = jnp.minimum(jnp.exp(log_alpha), 1.0)
            accept = jnp.log(jax.random.uniform(k_acc, log_alpha.shape)) < log_alpha
            z = jnp.where(accept[:, :, None], z_new, z)
            # Robbins-Monro adaptation during warmup
            adapt = (t < n_warmup).astype(jnp.float32)
            log_eps = log_eps + adapt * 0.3 * (alpha - target_accept)
            counted = (t >= n_warmup).astype(jnp.float32)
            # median across chains: robust to the occasional diverged chain
            out = (jnp.median(lj0), z) if trace else jnp.median(lj0)
            return (z, log_eps, n_accept + counted * accept.astype(jnp.float32)), out

        n = keys.shape[0]
        return jax.lax.scan(
            one_step, (z, log_eps, n_accept), (keys, t0 + jnp.arange(n))
        )

    keys = jax.random.split(key, n_steps)
    # Per-chain initial step scaled by the local gradient magnitude: a unit
    # leapfrog displacement should perturb the energy by O(1) even from the
    # crude amortised initialisation, where |grad log p| can be astronomical.
    base_step0 = jnp.where(mask > 0, 1.0 / jnp.sqrt(mass_prec), 0.0)
    g0 = grad_log_joint(z) * mask
    g_scale = jnp.sqrt(jnp.sum((g0 * base_step0) ** 2, axis=-1))  # [B, K]
    log_eps0 = jnp.log(step_scale) - jnp.log1p(g_scale)
    n_accept0 = jnp.zeros(z.shape[:2])
    if adapt_mass:
        # Windowed mass adaptation (Stan-style): run the first half of
        # warmup under the seed mass, re-estimate the per-(series,
        # coordinate) posterior variance from the cross-chain ensemble over
        # that window, and run the remainder under the estimated mass.  16
        # independent chains per series make the ensemble variance a direct
        # posterior-spread estimate once the chains have spread — exactly
        # the quantity the kinetic mass should match; the seed mass (prior
        # or q precision) can be orders off on coordinates where q is
        # mis-calibrated, which is what kept the per-series convergence
        # gate red at any leapfrog depth (round 5).
        n1 = max(n_warmup // 2, 1)
        (z, log_eps, n_accept), sc1 = run_phase(
            z, log_eps0, n_accept0, mass_prec, keys[:n1], 0, True
        )
        lj1_trace, z1_trace = sc1
        w = max(min(n1 // 2, 200), 1)
        zw = z1_trace[-w:]  # [w, B, K, n]
        var = jnp.maximum(zw.var(axis=(0, 2)), 1e-10)  # [B, n]
        mass2 = jnp.where(mask > 0, 1.0 / var, 1.0)[:, None, :]  # [B, 1, n]
        (z, log_eps, n_accept), sc2 = run_phase(
            z, log_eps, n_accept, mass2, keys[n1:], n1, return_trace
        )
        mass_prec = mass2
        if return_trace:
            lj2_trace, z2_trace = sc2
            lj_trace = jnp.concatenate([lj1_trace, lj2_trace], axis=0)
            z_trace = jnp.concatenate([z1_trace, z2_trace], axis=0)
        else:
            lj_trace, z_trace = jnp.concatenate([lj1_trace, sc2], axis=0), None
    else:
        (z, log_eps, n_accept), scanned = run_phase(
            z, log_eps0, n_accept0, mass_prec, keys, 0, return_trace
        )
        lj_trace, z_trace = scanned if return_trace else (scanned, None)
    out = AttrDict(
        theta=constrain_z(program, z),
        z=z,
        z_init=z_init,
        accept_rate=n_accept / max(n_steps - n_warmup, 1),
        step_size=jnp.exp(log_eps),
        log_joint=log_joint(z),
        log_joint_trace=lj_trace,
        n_warmup=n_warmup,
    )
    if return_trace:
        # post-accept z after every step, [n_steps, B, K, n_theta]; the
        # post-warmup slice feeds the ESS / split-R-hat mixing diagnostics
        # (tools/recovery_study.py)
        out["z_trace"] = z_trace
    return out


def hmc_refine_pooled(
    model,
    program,
    params,
    batch,
    key,
    devices=None,
    n_chains=8,
    n_steps=100,
    n_leapfrog=10,
    step_scale=0.02,
    target_accept=0.7,
    return_trace=False,
    mass_from_q=False,
):
    """Joint HMC over the FULL hierarchy: the exact posterior
    p(shared, locals | all series), pooling evidence across the dataset.

    ``hmc_refine`` runs one independent chain per (series, sample) pair, so
    its shared sites are duplicated per series — it targets per-series
    posteriors (or a cut, with ``site_mask``).  This sampler carries ONE
    shared-block state per chain: global sites once, global_conditioned
    sites once per device (``devices``: integer device index per series,
    default a single device), and a local block per series, so the K chains
    sample the true hierarchical joint the training objective bounds.

    The state is a pytree ``{g: [K, nG], c: [D, K, nC], l: [L, K, nL]}``;
    momenta, diagonal prior-precision masses and leapfrog updates act
    leaf-wise, and accept/reject is ONE Metropolis decision per chain over
    the whole (nG + D*nC + L*nL)-dimensional state.  Non-normal-family,
    truncated and constant sites keep their amortised draw (same movable
    policy as hmc_refine); frozen SHARED coordinates are tied to one
    representative draw per scope (z0 row 0 for globals, each device's
    first row for conditioned sites) so shared sites stay shared in the
    returned joint samples.  Returns full-theta samples [L, K, n_theta]
    plus diagnostics."""
    L = batch.observations.shape[0]
    raw_dev = np.zeros(L, np.int32) if devices is None else np.asarray(devices, np.int32)
    # densify device ids (a subset of devices may appear in this batch)
    _, dev_np = np.unique(raw_dev, return_inverse=True)
    dev_np = dev_np.astype(np.int32)
    dev_idx = jnp.asarray(dev_np)
    D = int(dev_np.max()) + 1

    gsl, csl, lsl = program.global_slice, program.global_cond_slice, program.local_slice
    # same movable policy as _sampled_mask (bounded families move through
    # the support bijections; only constants stay fixed)
    mov = (~program.is_constant).astype(np.float32)
    idx_g, idx_c, idx_l = (np.arange(program.n_theta)[s] for s in (gsl, csl, lsl))
    mg, mc, ml = jnp.asarray(mov[gsl]), jnp.asarray(mov[csl]), jnp.asarray(mov[lsl])
    prior_mu = jnp.asarray(program.prior_mu)
    prior_prec = jnp.asarray(program.prior_prec)
    mu_g, pg = prior_mu[gsl], prior_prec[gsl]
    mu_c, pc = prior_mu[csl], prior_prec[csl]
    mu_l, pl = prior_mu[lsl], prior_prec[lsl]
    log_lik = make_log_lik(model, program, params, batch)
    key, k0 = jax.random.split(key)
    z0, _, q0 = init_z_from_q(model, program, params, batch, k0, n_chains)  # [L,K,n]
    first_row = np.array([np.flatnonzero(dev_np == d)[0] for d in range(D)])

    if mass_from_q:
        # Euclidean-metric preconditioning: kinetic mass = the amortised q
        # precision per coordinate (global q rows are replicated; local
        # masses per series), uniform base step.  The mass matrix changes
        # MIXING only — leapfrog stays symplectic/reversible for any fixed
        # positive diagonal mass, so the stationary distribution is still
        # the exact hierarchical posterior; q enters as a preconditioner,
        # never as part of the target.  The flat prior-precision mass
        # (below) underestimates a pooled shared site's posterior precision
        # by ~L, which is the R-hat~22 random-walk failure observed in
        # reports/ar_mu_ground_truth — q's precision reflects the pooled
        # evidence and restores O(1) proposal scales in posterior units.
        qp = jnp.maximum(q0.prec, 1e-8)
        mp = dict(
            g=qp[0, gsl],                                       # [nG]
            c=qp[jnp.asarray(first_row)][:, csl][:, None, :],   # [D,1,nC]
            l=qp[:, lsl][:, None, :],                           # [L,1,nL]
        )
        masks = dict(g=mg, c=mc, l=ml)
        im = {k: jnp.where(masks[k] > 0, 1.0 / mp[k], 0.0) for k in mp}
        bs = {k: jnp.where(masks[k] > 0, 1.0, 0.0) for k in mp}
        p_scale = {k: jnp.where(masks[k] > 0, jnp.sqrt(mp[k]), 0.0) for k in mp}
    else:
        im = dict(  # inverse mass per leaf (frozen coordinates never move)
            g=jnp.where(mg > 0, 1.0 / pg, 0.0),
            c=jnp.where(mc > 0, 1.0 / pc, 0.0),
            l=jnp.where(ml > 0, 1.0 / pl, 0.0),
        )
        bs = dict(  # per-site base step = prior sigma
            g=jnp.where(mg > 0, 1.0 / jnp.sqrt(pg), 0.0),
            c=jnp.where(mc > 0, 1.0 / jnp.sqrt(pc), 0.0),
            l=jnp.where(ml > 0, 1.0 / jnp.sqrt(pl), 0.0),
        )
        p_scale = dict(g=jnp.sqrt(pg) * mg, c=jnp.sqrt(pc) * mc, l=jnp.sqrt(pl) * ml)
    state0 = dict(
        g=z0[0, :, gsl],                                  # [K, nG]
        c=jnp.stack([z0[r, :, csl] for r in first_row]),  # [D, K, nC]
        l=z0[:, :, lsl],                                  # [L, K, nL]
    )

    # Frozen (non-movable) SHARED coordinates must stay shared too: tie them
    # to the same representative rows the sampled state was seeded from
    # (z0[0] for globals, the first row of each device for conditioned
    # sites), otherwise frozen shared sites would come back untied across
    # series in the supposedly exact hierarchical joint samples.
    frozen_g = jnp.broadcast_to(z0[0:1, :, gsl], (L,) + z0[0, :, gsl].shape)
    frozen_c = z0[jnp.asarray(first_row)][:, :, csl][dev_idx]

    def assemble(s):
        z = z0
        z = z.at[:, :, gsl].set(
            jnp.where(mg > 0, jnp.broadcast_to(s["g"][None], (L,) + s["g"].shape), frozen_g)
        )
        z = z.at[:, :, csl].set(jnp.where(mc > 0, s["c"][dev_idx], frozen_c))
        z = z.at[:, :, lsl].set(jnp.where(ml > 0, s["l"], z0[:, :, lsl]))
        return z

    def log_joint(s):  # [K]: data term pooled over series; each prior counted once
        ll = log_lik(constrain_z(program, assemble(s))).sum(0)
        lp_g = (log_prior_z_cols(program, s["g"], idx_g) * mg).sum(-1)
        lp_c = (log_prior_z_cols(program, s["c"], idx_c) * mc).sum(-1).sum(0)
        lp_l = (log_prior_z_cols(program, s["l"], idx_l) * ml).sum(-1).sum(0)
        return ll + lp_g + lp_c + lp_l

    grad_lj = jax.grad(lambda s: log_joint(s).sum())
    tmap = jax.tree_util.tree_map

    def step_tree(log_eps):  # per-chain step broadcast to each leaf's layout
        e = jnp.exp(log_eps)
        return dict(g=e[:, None] * bs["g"], c=e[None, :, None] * bs["c"], l=e[None, :, None] * bs["l"])

    def draw_p(k):
        kg, kc, kl = jax.random.split(k, 3)
        return dict(
            g=jax.random.normal(kg, state0["g"].shape) * p_scale["g"],
            c=jax.random.normal(kc, state0["c"].shape) * p_scale["c"],
            l=jax.random.normal(kl, state0["l"].shape) * p_scale["l"],
        )

    def kinetic(p):  # [K]
        return 0.5 * (
            (p["g"] ** 2 * im["g"]).sum(-1)
            + (p["c"] ** 2 * im["c"]).sum(-1).sum(0)
            + (p["l"] ** 2 * im["l"]).sum(-1).sum(0)
        )

    def leapfrog(s, p, st):
        p = tmap(lambda pi, gi, si: pi + 0.5 * si * gi, p, grad_lj(s), st)
        for _ in range(n_leapfrog - 1):
            s = tmap(lambda si, pi, sti, imi: si + sti * imi * pi, s, p, st, im)
            p = tmap(lambda pi, gi, sti: pi + sti * gi, p, grad_lj(s), st)
        s = tmap(lambda si, pi, sti, imi: si + sti * imi * pi, s, p, st, im)
        p = tmap(lambda pi, gi, sti: pi + 0.5 * sti * gi, p, grad_lj(s), st)
        return s, p

    def select(accept, new, old):
        return dict(
            g=jnp.where(accept[:, None], new["g"], old["g"]),
            c=jnp.where(accept[None, :, None], new["c"], old["c"]),
            l=jnp.where(accept[None, :, None], new["l"], old["l"]),
        )

    n_warmup = n_steps // 2

    def one_step(carry, inp):
        s, log_eps, n_accept = carry
        key_t, t = inp
        k_mom, k_acc = jax.random.split(key_t)
        st = step_tree(log_eps)
        p = draw_p(k_mom)
        lj0, ke0 = log_joint(s), kinetic(p)
        s_new, p_new = leapfrog(s, p, st)
        lj1, ke1 = log_joint(s_new), kinetic(p_new)
        log_alpha = jnp.nan_to_num((lj1 - ke1) - (lj0 - ke0), nan=-jnp.inf)
        alpha = jnp.minimum(jnp.exp(log_alpha), 1.0)
        accept = jnp.log(jax.random.uniform(k_acc, log_alpha.shape)) < log_alpha
        s = select(accept, s_new, s)
        adapt = (t < n_warmup).astype(jnp.float32)
        log_eps = log_eps + adapt * 0.3 * (alpha - target_accept)
        counted = (t >= n_warmup).astype(jnp.float32)
        out = (jnp.median(lj0), s) if return_trace else jnp.median(lj0)
        return (s, log_eps, n_accept + counted * accept.astype(jnp.float32)), out

    # gradient-scaled initial step, as in hmc_refine, but over the pooled state
    g0 = grad_lj(state0)
    st1 = step_tree(jnp.zeros(n_chains))
    g_scale = jnp.sqrt(
        ((g0["g"] * st1["g"]) ** 2).sum(-1)
        + ((g0["c"] * st1["c"]) ** 2).sum(-1).sum(0)
        + ((g0["l"] * st1["l"]) ** 2).sum(-1).sum(0)
    )
    log_eps0 = jnp.log(step_scale) - jnp.log1p(g_scale)
    keys = jax.random.split(key, n_steps)
    (s, log_eps, n_accept), scanned = jax.lax.scan(
        one_step, (state0, log_eps0, jnp.zeros(n_chains)), (keys, jnp.arange(n_steps))
    )
    lj_trace, s_trace = scanned if return_trace else (scanned, None)
    z = assemble(s)
    out = AttrDict(
        theta=constrain_z(program, z),
        z=z,
        z_init=z0,
        state=s,
        accept_rate=n_accept / max(n_steps - n_warmup, 1),
        step_size=jnp.exp(log_eps),
        log_joint=log_joint(s),
        log_joint_trace=lj_trace,
        n_warmup=n_warmup,
    )
    if return_trace:
        # post-accept SHARED-block states per step ({g:[S,K,nG], c:[S,D,K,nC],
        # l:[S,L,K,nL]}); feeds the mixing diagnostics without materialising
        # the assembled [S, L, K, n_theta] trace
        out["state_trace"] = s_trace
    return out


# --------------------------------------------------------------------------- #
# Pooled Gibbs: locals by per-series HMC | shared by adaptive MH
# --------------------------------------------------------------------------- #
def gibbs_refine_pooled(
    model,
    program,
    params,
    batch,
    key,
    devices=None,
    n_chains=16,
    n_sweeps=2000,
    n_leapfrog=10,
    local_step_scale=0.1,
    shared_step_scale=0.5,
    target_accept_local=0.7,
    target_accept_shared=0.3,
    return_trace=False,
):
    """Exact-joint Gibbs sampler for the pooled hierarchical posterior
    p(shared, locals | all series), built from two conditional updates:

      1. locals | shared — HMC on each series' local block.  Given the
         shared state the series are INDEPENDENT, so all L x K chains
         leapfrog simultaneously (one batched decoder evaluation per
         substep) and accept/reject PER (series, chain) on that series'
         own Hamiltonian — acceptance does not degrade with dataset size.
         Kinetic mass = the amortised q precision per coordinate (locals
         pass the cross-implementation parity battery, so q's local scales
         are well calibrated); per-chain step Robbins-Monro-adapts to
         ``target_accept_local`` during warmup.
      2. shared | locals — adaptive random-walk MH on the (globals,
         conditioned) block with the locals fixed: one batched evaluation
         per sweep; proposal shape follows the chains' own empirical sd
         accumulated during warmup (Haario-style, frozen after), scalar
         step adapts to ``target_accept_shared``.

    Why this exists: the JOINT pooled HMC random-walks on ridge-coupled
    posteriors (a shared coordinate cannot move without every series'
    locals moving coherently — split-R-hat ~22 observed), and the
    pseudo-marginal route drowns in importance-weight variance on sharp
    per-series local posteriors (~20+ nats of per-series log p_hat noise
    measured: q-draw particles almost never refresh).  The Gibbs
    conditionals need NO importance sampling and no joint move; mixing
    along the shared-locals ridge happens at rate (conditional sd /
    marginal sd)^2 per sweep, which is fast when the data pins the
    conditionals.  Both updates leave the exact joint invariant.

    Same state layout, tying and movable policy as ``hmc_refine_pooled``;
    returns the same AttrDict surface (plus ``accept_rate_local``)."""
    L = batch.observations.shape[0]
    raw_dev = np.zeros(L, np.int32) if devices is None else np.asarray(devices, np.int32)
    _, dev_np = np.unique(raw_dev, return_inverse=True)
    dev_np = dev_np.astype(np.int32)
    dev_idx = jnp.asarray(dev_np)
    D = int(dev_np.max()) + 1
    first_row = np.array([np.flatnonzero(dev_np == d)[0] for d in range(D)])
    K = int(n_chains)

    gsl, csl, lsl = program.global_slice, program.global_cond_slice, program.local_slice
    idx_g, idx_c, idx_l = (np.arange(program.n_theta)[s] for s in (gsl, csl, lsl))
    mov = (~program.is_constant).astype(np.float32)
    mg, mc, ml = jnp.asarray(mov[gsl]), jnp.asarray(mov[csl]), jnp.asarray(mov[lsl])

    log_lik = make_log_lik(model, program, params, batch)
    key, k0 = jax.random.split(key)
    z0, _, q0 = init_z_from_q(model, program, params, batch, k0, n_chains)  # [L,K,n]
    zg0 = z0[0, :, gsl]                                  # [K, nG]
    zc0 = jnp.stack([z0[r, :, csl] for r in first_row])  # [D, K, nC]
    zl0 = z0[:, :, lsl]                                  # [L, K, nL]

    q_sig = 1.0 / jnp.sqrt(jnp.maximum(q0.prec, 1e-12))
    sig_g = q_sig[:, gsl].mean(0)                        # [nG]
    sig_c = q_sig[jnp.asarray(first_row)][:, csl][:, None, :]  # [D, 1, nC]
    qp_l = jnp.maximum(q0.prec[:, lsl], 1e-8)[:, None, :]       # [L, 1, nL]
    im_l = jnp.where(ml > 0, 1.0 / qp_l, 0.0)            # inverse mass
    p_scale_l = jnp.where(ml > 0, jnp.sqrt(qp_l), 0.0)

    # frozen shared coordinates stay tied to their representative q draw
    frozen_g = zg0
    frozen_c = zc0

    def assemble(zg, zc, zl):
        z = z0
        z = z.at[:, :, gsl].set(
            jnp.broadcast_to(
                jnp.where(mg > 0, zg, frozen_g)[None], (L,) + zg.shape
            )
        )
        z = z.at[:, :, csl].set(jnp.where(mc > 0, zc, frozen_c)[dev_idx])
        z = z.at[:, :, lsl].set(jnp.where(ml > 0, zl, z0[:, :, lsl]))
        return z

    def ll_series(zg, zc, zl):                           # [L, K]
        return log_lik(constrain_z(program, assemble(zg, zc, zl)))

    def prior_l(zl):                                     # [L, K]
        return (log_prior_z_cols(program, zl, idx_l) * ml).sum(-1)

    def prior_gc(zg, zc):                                # [K]
        lp_g = (log_prior_z_cols(program, zg, idx_g) * mg).sum(-1)
        lp_c = (log_prior_z_cols(program, zc, idx_c) * mc).sum(-1).sum(0)
        return lp_g + lp_c

    n_warmup = n_sweeps // 2
    base_l = jnp.where(ml > 0, 1.0 / jnp.sqrt(qp_l), 0.0)

    def pot_grad(zg, zc, zl):
        def f(zl_):
            return (ll_series(zg, zc, zl_) + prior_l(zl_)).sum()
        return jax.grad(f)(zl) * ml

    def one_sweep(carry, inp):
        zg, zc, zl, ll, le_l, le_s, na_l, na_s, stats = carry
        key_t, t = inp
        k_mom, k_al, kg, kc, k_as = jax.random.split(key_t, 5)

        # ---- 1) locals | shared: per-series HMC -------------------------
        step = jnp.exp(le_l)[None, :, None] * base_l
        p0 = jax.random.normal(k_mom, zl.shape) * p_scale_l
        lp0 = prior_l(zl)

        p = p0 + 0.5 * step * pot_grad(zg, zc, zl)
        zl_n = zl
        for _ in range(n_leapfrog - 1):
            zl_n = zl_n + step * im_l * p
            p = p + step * pot_grad(zg, zc, zl_n)
        zl_n = zl_n + step * im_l * p
        p = p + 0.5 * step * pot_grad(zg, zc, zl_n)
        ll_n = ll_series(zg, zc, zl_n)
        h0 = -(ll + lp0) + 0.5 * (p0 ** 2 * im_l).sum(-1)
        h1 = -(ll_n + prior_l(zl_n)) + 0.5 * (p ** 2 * im_l).sum(-1)
        log_acc_l = jnp.nan_to_num(h0 - h1, nan=-jnp.inf)        # [L, K]
        acc_l = jnp.log(jax.random.uniform(k_al, (L, K))) < log_acc_l
        zl = jnp.where(acc_l[:, :, None], zl_n, zl)
        ll = jnp.where(acc_l, ll_n, ll)
        alpha_l = jnp.minimum(jnp.exp(log_acc_l), 1.0).mean(0)   # [K]

        # ---- 2) shared | locals: adaptive RW-MH -------------------------
        n_obs, s1g, s2g, s1c, s2c = stats
        var_g = jnp.maximum(s2g / n_obs - (s1g / n_obs) ** 2, 1e-12)
        var_c = jnp.maximum(s2c / n_obs - (s1c / n_obs) ** 2, 1e-12)
        ready = (n_obs >= 50.0 * K).astype(jnp.float32)
        pg_sig = ready * jnp.sqrt(var_g) + (1.0 - ready) * sig_g
        pc_sig = ready * jnp.sqrt(var_c) + (1.0 - ready) * sig_c
        e = jnp.exp(le_s)
        zg_n = zg + e[:, None] * pg_sig * mg * jax.random.normal(kg, zg.shape)
        zc_n = zc + e[None, :, None] * pc_sig * mc * jax.random.normal(kc, zc.shape)
        ll_s = ll_series(zg_n, zc_n, zl)
        log_acc_s = jnp.nan_to_num(
            (ll_s.sum(0) + prior_gc(zg_n, zc_n)) - (ll.sum(0) + prior_gc(zg, zc)),
            nan=-jnp.inf,
        )
        alpha_s = jnp.minimum(jnp.exp(log_acc_s), 1.0)
        acc_s = jnp.log(jax.random.uniform(k_as, (K,))) < log_acc_s
        zg = jnp.where(acc_s[:, None], zg_n, zg)
        zc = jnp.where(acc_s[None, :, None], zc_n, zc)
        ll = jnp.where(acc_s[None, :], ll_s, ll)

        # ---- adaptation (warmup only) -----------------------------------
        adapt = (t < n_warmup).astype(jnp.float32)
        le_l = le_l + adapt * 0.2 * (alpha_l - target_accept_local)
        le_s = le_s + adapt * 0.3 * (alpha_s - target_accept_shared)
        stats = (
            n_obs + adapt * K,
            s1g + adapt * zg.sum(0),
            s2g + adapt * (zg ** 2).sum(0),
            s1c + adapt * zc.sum(1, keepdims=True),
            s2c + adapt * (zc ** 2).sum(1, keepdims=True),
        )
        counted = (t >= n_warmup).astype(jnp.float32)
        tgt = ll.sum(0) + prior_gc(zg, zc) + prior_l(zl).sum(0)
        out = (jnp.median(tgt), zg, zc) if return_trace else jnp.median(tgt)
        carry = (
            zg, zc, zl, ll, le_l, le_s,
            na_l + counted * acc_l.astype(jnp.float32).mean(0),
            na_s + counted * acc_s.astype(jnp.float32),
            stats,
        )
        return carry, out

    ll0 = ll_series(zg0, zc0, zl0)
    # gradient-scaled initial local step (as in hmc_refine): a unit leapfrog
    # displacement should perturb the per-series energy by O(1) even from a
    # crude initialisation where |grad| can be astronomical
    g0l = pot_grad(zg0, zc0, zl0)
    g_scale_l = jnp.sqrt(((g0l * base_l) ** 2).sum(-1)).mean(0)  # [K]
    le_l0 = jnp.log(local_step_scale) - jnp.log1p(g_scale_l)
    le_s0 = jnp.full((K,), jnp.log(shared_step_scale))
    stats0 = (
        jnp.asarray(1e-6),
        jnp.zeros_like(zg0[0]),
        jnp.zeros_like(zg0[0]),
        jnp.zeros_like(zc0[:, :1, :]),
        jnp.zeros_like(zc0[:, :1, :]),
    )
    keys = jax.random.split(key, n_sweeps)
    carry0 = (zg0, zc0, zl0, ll0, le_l0, le_s0, jnp.zeros(K), jnp.zeros(K), stats0)
    (zg, zc, zl, ll, le_l, le_s, na_l, na_s, _), scanned = jax.lax.scan(
        one_sweep, carry0, (keys, jnp.arange(n_sweeps))
    )
    if return_trace:
        tgt_trace, g_trace, c_trace = scanned
    else:
        tgt_trace, g_trace, c_trace = scanned, None, None
    z = assemble(zg, zc, zl)
    out = AttrDict(
        theta=constrain_z(program, z),
        z=z,
        z_init=z0,
        state=dict(g=zg, c=zc, l=zl),
        accept_rate=na_s / max(n_sweeps - n_warmup, 1),
        accept_rate_local=na_l / max(n_sweeps - n_warmup, 1),
        step_size=jnp.exp(le_s),
        log_joint=ll.sum(0) + prior_gc(zg, zc) + prior_l(zl).sum(0),
        log_joint_trace=tgt_trace,
        n_warmup=n_warmup,
    )
    if return_trace:
        out["state_trace"] = dict(g=g_trace, c=c_trace)
    return out


# --------------------------------------------------------------------------- #
# Pseudo-marginal MH over the shared tier (locals integrated out)
# --------------------------------------------------------------------------- #
def pm_refine_shared(
    model,
    program,
    params,
    batch,
    key,
    devices=None,
    n_chains=8,
    n_steps=2000,
    n_particles=64,
    rho=0.98,
    step_scale=0.5,
    target_accept=0.3,
    return_trace=False,
):
    """Correlated pseudo-marginal MH targeting the exact MARGINAL posterior
    of the shared tier, p(globals, conditioned | all series), with the local
    sites integrated out by importance sampling from the trained amortised q.

    Why this exists: ``hmc_refine_pooled`` targets the full joint, where a
    shared coordinate can only move together with every series' locals — on
    ridge-coupled posteriors the joint chain random-walks (split-R-hat ~22
    observed at 3000 steps in reports/ar_mu_ground_truth).  Marginalising
    the locals collapses the problem to the shared block (27 dims on
    dr_constant), where an adaptive random-walk MH mixes routinely.

    Exactness: per series, p_hat(x_s | shared) = mean_k w_k with
    w_k = p(x_s | shared, l_k) p(l_k) / q(l_k | x_s), l_k ~ q — an unbiased
    estimator, so the chain targets EXACTLY p(shared) prod_s p(x_s | shared)
    [Andrieu & Roberts 2009], under the module's static-prior convention for
    dependent sites (the same target whose joint ``hmc_refine_pooled``
    samples).  q enters only as the importance proposal, never the target.

    Kernel: two alternating MH blocks on the EXTENDED target
    pi(z, u) ∝ p(z) p_hat(x | z, u) N(u; 0, I), whose u-marginal is the
    exact shared posterior (E_u[p_hat] = p(x|z)):

      A. shared move, u FIXED — the particles (locals are z-independent
         q draws driven by u) are identical on both sides, so the
         importance-sampling noise cancels exactly and the block behaves
         like plain adaptive RW-MH on a smooth surface;
      B. particle refresh u' = rho u + sqrt(1-rho^2) xi (Crank-Nicolson,
         reversible w.r.t. N(0, I)), shared FIXED, accepted INDEPENDENTLY
         per (series, chain) — the extended target factorises as
         p(z) prod_s p_hat_s(z, u_s) N(u_s), so each series' u-block is
         its own MH update given z, and one batched evaluation refreshes
         every series at once.  The acceptance ratio then carries only the
         per-series noise innovation sqrt(2(1-rho^2)) sigma_s instead of
         the sum over the dataset [Deligiannidis et al. 2018, the
         correlated pseudo-marginal method, blocked over independent
         observations].

    Both degenerate variants were measured to collapse on the trained
    dr_constant_one decoder: a single joint (z, u) proposal accepts at
    5e-4 (the full-dataset estimator innovation lands in every ratio), and
    a joint all-series u-refresh accepts at 3e-4 (same innovation, u side).
    The per-series B-step keeps the same two-evaluations-per-step cost and
    both blocks leave pi(z, u) invariant, so exactness is unchanged.

    Returns shared-state samples {g: [K, nG], c: [D, K, nC]}, optional
    per-step traces, and an assembled full-theta sample whose local
    coordinates are importance-resampled per (series, chain) from the
    final particle weights (a one-draw posterior sample, matching the
    other refiners' return contract).  Reference has no counterpart (it stops at the
    amortised posterior, /root/reference/vihds/training.py:283-322)."""
    L = batch.observations.shape[0]
    raw_dev = np.zeros(L, np.int32) if devices is None else np.asarray(devices, np.int32)
    _, dev_np = np.unique(raw_dev, return_inverse=True)
    dev_np = dev_np.astype(np.int32)
    dev_idx = jnp.asarray(dev_np)
    D = int(dev_np.max()) + 1
    first_row = np.array([np.flatnonzero(dev_np == d)[0] for d in range(D)])
    P, K = int(n_particles), int(n_chains)

    gsl, csl, lsl = program.global_slice, program.global_cond_slice, program.local_slice
    idx_g, idx_c, idx_l = (np.arange(program.n_theta)[s] for s in (gsl, csl, lsl))
    mov = (~program.is_constant).astype(np.float32)
    mg, mc, ml = jnp.asarray(mov[gsl]), jnp.asarray(mov[csl]), jnp.asarray(mov[lsl])
    nG, nC = len(idx_g), len(idx_c)

    log_lik = make_log_lik(model, program, params, batch)
    q = model.encoder(params["enc"], batch)
    q_mu, q_prec = q.mu, jnp.maximum(q.prec, 1e-12)     # [L, n_theta]
    mu_bb, prec_bb = q_mu[:, None, None, :], q_prec[:, None, None, :]
    q_sig = 1.0 / jnp.sqrt(q_prec)
    # random-walk proposal scales: q's (shared-row) sd per coordinate,
    # scaled toward the d-dimensional optimum by step_scale via adaptation
    sig_g = q_sig[:, gsl].mean(0)                        # [nG]
    sig_c = q_sig[jnp.asarray(first_row)][:, csl][:, None, :]  # [D, 1, nC]

    key, k0, ku0 = jax.random.split(key, 3)
    z0, _, _ = init_z_from_q(model, program, params, batch, k0, n_chains)
    zg0 = z0[0, :, gsl]                                  # [K, nG]
    zc0 = jnp.stack([z0[r, :, csl] for r in first_row])  # [D, K, nC]
    u0 = jax.random.normal(ku0, (L, K, P, program.n_theta), jnp.float32)

    def assemble(zg, zc, z_loc):
        z = z_loc                                        # [L, K, P, n]
        z = z.at[..., gsl].set(jnp.broadcast_to(zg[None, :, None, :], (L, K, P, nG)))
        z = z.at[..., csl].set(jnp.broadcast_to(zc[dev_idx][:, :, None, :], (L, K, P, nC)))
        return z

    def particle_weights(zg, zc, u):
        """Unnormalised particle log-weights log(p(x|th) p(z_l)/q(z_l)),
        [L, K, P].  log_lik takes CONSTRAINED theta (it applies clip +
        theta_dict directly), so z is mapped through constrain_z first —
        same contract as make_log_joint."""
        z_loc = z_from_u(program, u, mu_bb, prec_bb)     # [L, K, P, n]
        z = assemble(zg, zc, z_loc)
        theta = constrain_z(program, z)
        lp_th = log_lik(theta.reshape(L, K * P, program.n_theta)).reshape(L, K, P)
        lw_l = (
            (log_prior_z_cols(program, z_loc[..., lsl], idx_l)
             - log_q_z_sites(program, z_loc, mu_bb, prec_bb)[..., lsl]) * ml
        ).sum(-1)                                        # [L, K, P]
        return jnp.nan_to_num(lp_th + lw_l, nan=-jnp.inf)

    def ll_series(zg, zc, u):
        """Per-series log p_hat(x_s | shared), [L, K]."""
        w = particle_weights(zg, zc, u)
        return jax.scipy.special.logsumexp(w, axis=2) - math.log(P)

    def shared_prior(zg, zc):                            # [K]
        lp_g = (log_prior_z_cols(program, zg, idx_g) * mg).sum(-1)
        lp_c = (log_prior_z_cols(program, zc, idx_c) * mc).sum(-1).sum(0)
        return lp_g + lp_c

    n_warmup = n_steps // 2
    sq1r = math.sqrt(max(1.0 - rho * rho, 0.0))

    def one_step(carry, inp):
        zg, zc, u, ll, lp, log_eps, n_accept, n_accept_u, stats = carry
        key_t, t = inp
        kg, kc, ka, ku, kb = jax.random.split(key_t, 5)
        # Adaptive-Metropolis proposal shape [Haario et al. 2001]: during
        # warmup the per-coordinate scale follows the chains' own empirical
        # sd (cross-chain + cross-step second moments), falling back to q's
        # sd until enough draws accumulated; frozen after warmup (the carry
        # stops updating), so the post-warmup chain is a fixed-kernel MH.
        n_obs, s1g, s2g, s1c, s2c = stats
        var_g = jnp.maximum(s2g / n_obs - (s1g / n_obs) ** 2, 1e-12)
        var_c = jnp.maximum(s2c / n_obs - (s1c / n_obs) ** 2, 1e-12)
        ready = (n_obs >= 50.0 * K).astype(jnp.float32)
        pg_sig = ready * jnp.sqrt(var_g) + (1.0 - ready) * sig_g
        pc_sig = ready * jnp.sqrt(var_c) + (1.0 - ready) * sig_c
        # A: shared-block RW move, particles fixed (IS noise cancels)
        e = jnp.exp(log_eps)                             # [K]
        zg_n = zg + e[:, None] * pg_sig * mg * jax.random.normal(kg, zg.shape)
        zc_n = zc + e[None, :, None] * pc_sig * mc * jax.random.normal(kc, zc.shape)
        ll_n = ll_series(zg_n, zc_n, u)
        lp_n = shared_prior(zg_n, zc_n)
        log_alpha = jnp.nan_to_num(
            (ll_n.sum(0) + lp_n) - (ll.sum(0) + lp), nan=-jnp.inf
        )
        alpha = jnp.minimum(jnp.exp(log_alpha), 1.0)
        accept = jnp.log(jax.random.uniform(ka, (K,))) < log_alpha
        zg = jnp.where(accept[:, None], zg_n, zg)
        zc = jnp.where(accept[None, :, None], zc_n, zc)
        ll = jnp.where(accept[None, :], ll_n, ll)
        lp = jnp.where(accept, lp_n, lp)
        # B: Crank-Nicolson particle refresh, shared fixed, accepted
        # independently per (series, chain) — the u-blocks factorise
        u_n = rho * u + sq1r * jax.random.normal(ku, u.shape)
        ll_u = ll_series(zg, zc, u_n)
        log_beta = jnp.nan_to_num(ll_u - ll, nan=-jnp.inf)  # [L, K]
        accept_u = jnp.log(jax.random.uniform(kb, (L, K))) < log_beta
        u = jnp.where(accept_u[:, :, None, None], u_n, u)
        ll = jnp.where(accept_u, ll_u, ll)
        # adaptation (z-block scalar step + proposal-shape stats), warmup only
        adapt = (t < n_warmup).astype(jnp.float32)
        log_eps = log_eps + adapt * 0.3 * (alpha - target_accept)
        stats = (
            n_obs + adapt * K,
            s1g + adapt * zg.sum(0),
            s2g + adapt * (zg ** 2).sum(0),
            s1c + adapt * zc.sum(1, keepdims=True),
            s2c + adapt * (zc ** 2).sum(1, keepdims=True),
        )
        counted = (t >= n_warmup).astype(jnp.float32)
        tgt = ll.sum(0) + lp
        out = (jnp.median(tgt), zg, zc) if return_trace else jnp.median(tgt)
        carry = (
            zg, zc, u, ll, lp, log_eps,
            n_accept + counted * accept.astype(jnp.float32),
            n_accept_u + counted * accept_u.astype(jnp.float32).mean(0),
            stats,
        )
        return carry, out

    ll0 = ll_series(zg0, zc0, u0)
    lp0 = shared_prior(zg0, zc0)
    log_eps0 = jnp.full((K,), jnp.log(step_scale))
    keys = jax.random.split(key, n_steps)
    stats0 = (
        jnp.asarray(1e-6),
        jnp.zeros_like(zg0[0]),
        jnp.zeros_like(zg0[0]),
        jnp.zeros_like(zc0[:, :1, :]),
        jnp.zeros_like(zc0[:, :1, :]),
    )
    carry0 = (zg0, zc0, u0, ll0, lp0, log_eps0, jnp.zeros(K), jnp.zeros(K), stats0)
    (zg, zc, u, ll, lp, log_eps, n_accept, n_accept_u, _), scanned = jax.lax.scan(
        one_step, carry0, (keys, jnp.arange(n_steps))
    )
    if return_trace:
        tgt_trace, g_trace, c_trace = scanned
    else:
        tgt_trace, g_trace, c_trace = scanned, None, None
    # Assemble full theta with the LOCAL coordinates importance-resampled
    # per (series, chain) from the final particle weights — so the returned
    # locals are (one-draw) posterior samples like the other refiners',
    # not particle-0 q-draws.
    k_res = jax.random.fold_in(key, 0x7E5A)  # distinct from the scan keys
    w_fin = particle_weights(zg, zc, u)                  # [L, K, P]
    p_idx = jax.random.categorical(k_res, w_fin, axis=-1)  # [L, K]
    z_full = assemble(zg, zc, z_from_u(program, u, mu_bb, prec_bb))
    z_final = jnp.take_along_axis(
        z_full, p_idx[:, :, None, None], axis=2
    )[:, :, 0, :]
    out = AttrDict(
        theta=constrain_z(program, z_final),
        state=dict(g=zg, c=zc),
        state_init=dict(g=zg0, c=zc0),
        accept_rate=n_accept / max(n_steps - n_warmup, 1),
        accept_rate_u=n_accept_u / max(n_steps - n_warmup, 1),
        step_size=jnp.exp(log_eps),
        log_target=ll.sum(0) + lp,
        log_target_trace=tgt_trace,
        n_warmup=n_warmup,
    )
    if return_trace:
        # post-accept shared states per step: g [S, K, nG], c [S, D, K, nC]
        out["state_trace"] = dict(g=g_trace, c=c_trace)
    return out


# --------------------------------------------------------------------------- #
# SMC
# --------------------------------------------------------------------------- #
def _systematic_resample(key, log_w):
    """Systematic resampling indices for one datapoint's particles [K]."""
    K = log_w.shape[0]
    w = jax.nn.softmax(log_w)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ())
    pts = (u0 + jnp.arange(K)) / K
    return jnp.searchsorted(cdf, pts)


def smc_refine(
    model,
    program,
    params,
    batch,
    key,
    n_particles=64,
    n_temps=10,
    n_moves=1,
    n_leapfrog=3,
    step_scale=0.05,
    ess_threshold=0.5,
):
    """Annealed SMC from the amortised q to the posterior.

    Bridging targets pi_beta  ~  q(z)^(1-beta) [p(z) p(x|T(z))]^beta with a
    linear beta ladder; systematic resampling when ESS < threshold*K; HMC
    moves targeting pi_beta after each reweighting.  Also returns an unbiased
    log-evidence estimate per datapoint (the SMC normalising-constant
    telescope) — a quantity the reference cannot produce at all.
    """
    log_joint = make_log_joint(model, program, params, batch)
    mask = _sampled_mask(program)
    prior_prec = jnp.asarray(program.prior_prec)
    inv_mass = jnp.where(mask > 0, 1.0 / prior_prec, 0.0)
    step0 = step_scale * jnp.where(mask > 0, 1.0 / jnp.sqrt(prior_prec), 0.0)

    key, k0 = jax.random.split(key)
    z, _, q = init_z_from_q(model, program, params, batch, k0, n_particles)
    q_mu = q.mu[:, None, :]
    q_prec = q.prec[:, None, :]

    def log_q_z(z):
        return (log_q_z_sites(program, z, q_mu, q_prec) * mask).sum(-1)

    def log_pi(z, beta):
        return beta * log_joint(z) + (1.0 - beta) * log_q_z(z)

    grad_log_pi = jax.grad(lambda z, beta: log_pi(z, beta).sum(), argnums=0)

    def hmc_move(z, beta, key_t):
        k_mom, k_acc = jax.random.split(key_t)
        step = step0
        p = jax.random.normal(k_mom, z.shape) * jnp.sqrt(prior_prec) * mask
        lj0 = log_pi(z, beta)
        ke0 = 0.5 * (p ** 2 * inv_mass).sum(-1)
        g = grad_log_pi(z, beta) * mask
        p_h = p + 0.5 * step * g
        z_n = z
        for _ in range(n_leapfrog - 1):
            z_n = z_n + step * inv_mass * p_h
            p_h = p_h + step * (grad_log_pi(z_n, beta) * mask)
        z_n = z_n + step * inv_mass * p_h
        p_h = p_h + 0.5 * step * (grad_log_pi(z_n, beta) * mask)
        lj1 = log_pi(z_n, beta)
        ke1 = 0.5 * (p_h ** 2 * inv_mass).sum(-1)
        accept = jnp.log(jax.random.uniform(k_acc, lj0.shape)) < (lj1 - ke1) - (lj0 - ke0)
        return jnp.where(accept[:, :, None], z_n, z), accept

    betas = jnp.linspace(0.0, 1.0, n_temps + 1)

    def temp_step(carry, inp):
        z, log_w, log_Z = carry
        beta_prev, beta, key_t = inp
        # incremental weights: pi_beta / pi_beta_prev = [p(x,z)/q(z)]^(beta-beta_prev)
        incr = (beta - beta_prev) * (log_joint(z) - log_q_z(z))
        log_w = log_w + incr
        # normalise + record evidence increment
        lse = jax.scipy.special.logsumexp(log_w, axis=1, keepdims=True)
        log_Z = log_Z + lse[:, 0] - math.log(z.shape[1])
        log_w_n = log_w - lse
        # ESS <= n_particles mathematically; float32 logsumexp noise can push
        # the near-uniform-weight case a few 1e-4 over, so clamp.
        ess = jnp.minimum(1.0 / jnp.sum(jnp.exp(2.0 * log_w_n), axis=1), z.shape[1])  # [B]
        k_res, *k_moves = jax.random.split(key_t, 1 + n_moves)
        need = ess < ess_threshold * z.shape[1]
        idx = jax.vmap(_systematic_resample)(jax.random.split(k_res, z.shape[0]), log_w_n)
        z_res = jnp.take_along_axis(z, idx[:, :, None], axis=1)
        z = jnp.where(need[:, None, None], z_res, z)
        log_w = jnp.where(need[:, None], jnp.zeros_like(log_w), log_w - lse)
        acc_sum = jnp.zeros(z.shape[:2])
        for k_m in k_moves:
            z, acc = hmc_move(z, beta, k_m)
            acc_sum = acc_sum + acc
        return (z, log_w, log_Z), (ess, acc_sum.mean() / max(n_moves, 1))

    keys = jax.random.split(key, n_temps)
    init = (z, jnp.zeros(z.shape[:2]), jnp.zeros(z.shape[0]))
    (z, log_w, log_Z), (ess_trace, acc_trace) = jax.lax.scan(
        temp_step, init, (betas[:-1], betas[1:], keys)
    )
    return AttrDict(
        theta=constrain_z(program, z),
        z=z,
        log_w=log_w,
        log_evidence=log_Z,
        ess_trace=ess_trace,
        accept_trace=acc_trace,
    )
