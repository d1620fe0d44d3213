"""End-to-end VAE: encoder -> sample -> clip -> condition -> integrate -> observe.

Capability parity with reference vihds/vae.py + vihds/decoders.py, as pure
functions of an explicit param pytree so the whole forward (and its gradient)
compiles into one XLA program.  The latent draw u ~ N(0,1) comes from
``jax.random`` keys threaded through the step (the reference draws from the
*numpy* global RNG every forward, vihds/vae.py:22-24 — noted in SURVEY.md §2.5).
"""

import jax
import jax.numpy as jnp

from vihds_tpu import models
from vihds_tpu.nn.encoder import Encoder
from vihds_tpu.prob import ParamProgram, parse_parameters
from vihds_tpu.utils.attrdict import AttrDict


class VAE:
    """Static model assembly; all state lives in the params pytree."""

    def __init__(self, settings, data, program: ParamProgram):
        self.program = program
        self.encoder = Encoder(program, data, settings.params)
        if settings.model not in models.LOOKUP:
            raise ValueError(
                "Unknown model %r; available: %s"
                % (settings.model, ", ".join(sorted(models.LOOKUP)))
            )
        self.ode_model = models.LOOKUP[settings.model](settings)
        # Single-device specs disable decoder conditioning
        # (parity: vihds/vae.py:42-47).
        self.condition_on_device = settings.data.device_depth > 1
        if not self.condition_on_device:
            self.ode_model.conditioned_params = ()
        self.n_theta = program.n_theta
        self.state_names = self.ode_model.species
        self.use_laplace = self.ode_model.use_laplace

    def init_params(self, key):
        k_enc, k_dec = jax.random.split(key)
        return {
            "enc": self.encoder.init_params(k_enc),
            "dec": self.ode_model.init_params(k_dec),
        }

    def sample_u(self, key, n_batch, n_samples):
        from vihds_tpu import parallel

        u = jax.random.normal(key, (n_batch, n_samples, self.n_theta), jnp.float32)
        return parallel.constrain_u(u)

    def forward(self, params, batch, u, checkpoint=False, eval_mode=False, priors=None):
        """One forward pass.  ``batch``: AttrDict of device arrays
        (observations[B,S,T], inputs[B,C], dev_1hot[B,D], times[T]);
        ``u``: [B,K,n_theta] standard-normal draws.

        ``priors`` (optional): ``program.runtime_priors()`` arrays — when
        given, the +-4 sigma theta clip bounds come from the ARGUMENT
        instead of being baked into the trace, so models differing only in
        prior values share one compiled program.

        Returns AttrDict with x_states[B,K,S,T], x_predict[B,K,4,T],
        precisions (broadcastable to x_predict), theta[B,K,n_theta] (clipped),
        theta_cond (named view incl. conditioner outputs), q arrays.
        (parity: vihds/vae.py:26-36 + vihds/decoders.py:28-45)
        """
        q = self.encoder(params["enc"], batch)
        theta = self.program.sample(q, u)
        # Clip feeds the DECODER only (numerical protection for the ODE).
        # The IWAE weight evaluates log q / log p at the *sampled* theta: the
        # reference evaluates both at the clipped value (vihds/vae.py:34,
        # training.py:136-137), which leaves a runaway exploit — the encoder
        # can push its mean past the +-4 sigma clip bound, pinning theta at
        # the bound while -log q grows without limit (observed in practice:
        # ELBO -> +1e7 on dr_constant_one).  With log q at the sampled theta
        # the two formulations are identical whenever clipping is inactive
        # (any sample within +-4 prior sigmas) and the exploit is gone.
        clipped = self._clip(theta, priors)
        decoded = self.decode(params, clipped, batch, checkpoint=checkpoint, eval_mode=eval_mode)
        decoded["theta"] = theta  # sampled (unclipped): what log q / log p score
        decoded["q"] = q
        return decoded

    def _clip(self, theta, priors=None):
        """+-4 sigma prior clip: bounds from the runtime ``priors`` argument
        when given (shared-executable path), else baked from the program."""
        if priors is not None:
            return jnp.clip(theta, priors["clip_lo"], priors["clip_hi"])
        return self.program.clip(theta, stddevs=4)

    def decode(self, params, theta_clipped, batch, checkpoint=False, eval_mode=False):
        """Decoder-only pass for GIVEN clipped theta draws [B,K,n_theta]:
        condition -> simulate -> expand precisions -> observe.

        Besides being forward's tail, this is the counterfactual serving
        path (vihds_tpu.predict --treatments): posterior theta inferred from
        observed data is re-simulated under modified inputs, with the
        original importance weights still valid (theta's posterior does not
        depend on the counterfactual treatment)."""
        th = self.program.theta_dict(theta_clipped)
        if self.condition_on_device:
            th = self.ode_model.condition_theta(params["dec"], th, batch.dev_1hot)
        x_solution = self.ode_model.simulate(
            params["dec"],
            th,
            batch.times,
            batch.inputs,
            batch.dev_1hot,
            n_iwae=theta_clipped.shape[1],
            checkpoint=checkpoint,
            eval_mode=eval_mode,
        )
        x_states, precisions = self.ode_model.expand_precisions(
            params["dec"], th, batch.times.shape[0], x_solution
        )
        x_predict = self.ode_model.observe(x_states, th)
        return AttrDict(
            x_states=x_states,
            x_predict=x_predict,
            precisions=precisions,
            theta_clipped=theta_clipped,  # what the decoder integrated
            theta_cond=th,
        )


    def forward_logprob(self, params, batch, u, checkpoint=True, priors=None):
        """Training-objective forward: encode -> sample -> clip -> condition
        -> integrate with the observation log-likelihood accumulated ONLINE
        in the solver scan (OdeModel.simulate_logprob) — the [B,K,S,T]
        trajectory is never materialised.  Returns AttrDict with
        log_p_by_species[B,K,4], theta (sampled, what log q / log p score)
        and q.  Same latent pipeline as ``forward``; only the decoder tail
        differs."""
        q = self.encoder(params["enc"], batch)
        theta = self.program.sample(q, u)
        clipped = self._clip(theta, priors)
        th = self.program.theta_dict(clipped)
        if self.condition_on_device:
            th = self.ode_model.condition_theta(params["dec"], th, batch.dev_1hot)
        log_p_by_species = self.ode_model.simulate_logprob(
            params["dec"],
            th,
            batch.times,
            batch.inputs,
            batch.dev_1hot,
            n_iwae=u.shape[1],
            observations=batch.observations,
            use_laplace=self.use_laplace,
            checkpoint=checkpoint,
        )
        return AttrDict(log_p_by_species=log_p_by_species, theta=theta, q=q)


def build_model(args, settings, dataset, program=None):
    """Parse the spec's parameter tiers and assemble the VAE
    (parity: vihds/vae.py:39-51)."""
    if program is None:
        program = ParamProgram(parse_parameters(settings.params))
    return VAE(settings, dataset, program)
