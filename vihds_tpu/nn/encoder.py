"""Amortised posterior q(theta | x, d): encoder trunk + per-tier heads.

Capability parity with reference vihds/encoders.py, TPU-re-designed:

  * The trunk (Conv1d -> AvgPool1d -> Linear -> tanh over first-differenced
    observations; reference ConditionalEncoder, vihds/encoders.py:16-55) is the
    same architecture.
  * The reference creates one Linear(n_inputs -> 1) per free parameter per site
    and rebuilds a distribution object graph every forward
    (Q_Local/Q_Global_Cond, vihds/encoders.py:126-213).  Here all heads of a
    tier are ONE stacked matmul W[n_inputs, n_sites] per free-parameter kind
    (mu / log-prec) — mathematically identical, one MXU op instead of
    2 x n_sites tiny ones — and the output is flat arrays (mu, prec)[B, n_theta]
    consumed by the compiled ParamProgram.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vihds_tpu.nn import layers
from vihds_tpu.prob.program import ParamProgram
from vihds_tpu.utils.attrdict import AttrDict


def _tier_flags(sites_list):
    """(cond_treatments, cond_devices) for a tier (uniform across its sites)."""
    if not sites_list:
        return False, False
    t = sites_list[0]
    return bool(t.cond_treatments), bool(t.cond_devices)


class Encoder:
    """Static shape info + param init + pure apply."""

    def __init__(self, program: ParamProgram, data, params):
        """``data``: TimeSeriesDatasetPair; ``params``: settings.params."""
        self.program = program
        self.n_species = data.train.dataset.n_species
        self.n_times = data.train.dataset.n_times
        self.n_conditions = data.n_conditions
        self.depth = data.depth
        self.n_filters = params.n_filters
        self.filter_size = params.filter_size
        self.pool_size = params.pool_size
        self.n_hidden = params.n_hidden
        # fallback must track config.DEFAULT_PARAMS["q_global_init"]: params
        # objects not routed through apply_defaults_params would otherwise
        # silently train under the old init convention
        self.q_global_init = getattr(params, "q_global_init", "unit")
        if self.q_global_init not in ("prior", "unit"):
            raise ValueError("Unknown q_global_init %s" % self.q_global_init)
        if params.transfer_func != "tanh":
            raise ValueError("Unknown transfer_func %s" % params.transfer_func)

        n_obs = self.n_times - 1
        n_conv = n_obs - (self.filter_size - 1)
        n_pool = n_conv - (self.pool_size - 1)
        self.n_flat = n_pool * self.n_filters

        sites = program.sites
        self.n_local = len(sites.local)
        self.n_gc = len(sites.global_cond)
        self.n_global = len(sites.global_)
        self.loc_cond_treat, self.loc_cond_dev = _tier_flags(sites.local)
        self.gc_cond_treat, self.gc_cond_dev = _tier_flags(sites.global_cond)
        # Local heads always see the encoded data (reference Q_Local
        # condition_data=True, vihds/encoders.py:128-135).
        self.d_local = (
            self.n_hidden
            + (self.n_conditions if self.loc_cond_treat else 0)
            + (self.depth if self.loc_cond_dev else 0)
        )
        self.d_gc = (self.n_conditions if self.gc_cond_treat else 0) + (
            self.depth if self.gc_cond_dev else 0
        )

    # ---------------------------------------------------------------- params
    def init_params(self, key):
        ks = jax.random.split(key, 8)
        p = {
            "conv": layers.conv1d_init(ks[0], self.n_species, self.n_filters, self.filter_size),
            "lin": {
                "w": jax.nn.initializers.orthogonal()(ks[1], (self.n_flat, self.n_hidden)).astype(
                    jnp.float32
                ),
                "b": jax.random.uniform(
                    ks[2],
                    (self.n_hidden,),
                    minval=-1.0 / np.sqrt(self.n_flat),
                    maxval=1.0 / np.sqrt(self.n_flat),
                ).astype(jnp.float32),
            },
        }
        if self.n_local:
            # use_bias=True for local heads (reference vihds/encoders.py:291)
            p["loc_mu"] = layers.linear_init(ks[3], self.d_local, self.n_local, use_bias=True)
            p["loc_lp"] = layers.linear_init(ks[4], self.d_local, self.n_local, use_bias=True)
        if self.n_gc:
            # no bias for global-conditioned heads (reference vihds/encoders.py:293)
            p["gc_mu"] = layers.linear_init(ks[5], self.d_gc, self.n_gc, use_bias=False)
            p["gc_lp"] = layers.linear_init(ks[6], self.d_gc, self.n_gc, use_bias=False)
        if self.n_global:
            # free scalars, initialised from the spec (reference Q_Global,
            # vihds/encoders.py:216-239)
            g_sites = self.program.sites.global_
            p["glob_mu"] = jnp.array([s.init_free[0] for s in g_sites], jnp.float32)
            # "prior": q starts at the prior precision (spec sigma/prec);
            # "unit": log-prec 0 like the reference Q_Global (normal-family
            # sites only — Kumaraswamy's second free param is log b, not a
            # precision).  See config.DEFAULT_PARAMS["q_global_init"].
            from vihds_tpu.prob.sites import KUMARASWAMY

            p["glob_lp"] = jnp.array(
                [
                    s.init_free[1]
                    if (self.q_global_init == "prior" or s.kind == KUMARASWAMY)
                    else 0.0
                    for s in g_sites
                ],
                jnp.float32,
            )
        return p

    # ----------------------------------------------------------------- apply
    def trunk(self, p, observations):
        """First-difference the observations, then conv/pool/linear/tanh
        (reference vihds/encoders.py:49-55, 383-387)."""
        delta_obs = observations[:, :, 1:] - observations[:, :, :-1]
        x = layers.conv1d_apply(p["conv"], delta_obs)
        x = layers.avgpool1d(x, self.pool_size)
        x = x.reshape(x.shape[0], -1)
        x = jnp.tanh(layers.linear_apply(p["lin"], x))
        return x

    def __call__(self, p, data):
        """data: batch AttrDict -> q arrays {mu, prec, logprec} [B, n_theta].

        Non-merged multi-file batches carry ``enc_observations`` — the series
        snapped onto the shortest grid the trunk was built for — while
        ``observations`` stays on the file's native grid for the likelihood.
        """
        obs = data["enc_observations"] if "enc_observations" in data else data.observations
        B = obs.shape[0]
        encoded = self.trunk(p, obs)

        parts_mu, parts_lp = [], []
        if self.n_local:
            xs = [encoded]
            if self.loc_cond_treat:
                xs.append(data.inputs)
            if self.loc_cond_dev:
                xs.append(data.dev_1hot)
            x_loc = jnp.concatenate(xs, axis=1)
            parts_mu.append(layers.linear_apply(p["loc_mu"], x_loc))
            parts_lp.append(layers.linear_apply(p["loc_lp"], x_loc))
        if self.n_gc:
            xs = []
            if self.gc_cond_treat:
                xs.append(data.inputs)
            if self.gc_cond_dev:
                xs.append(data.dev_1hot)
            x_gc = jnp.concatenate(xs, axis=1)
            parts_mu.append(layers.linear_apply(p["gc_mu"], x_gc))
            parts_lp.append(layers.linear_apply(p["gc_lp"], x_gc))
        if self.n_global:
            parts_mu.append(jnp.broadcast_to(p["glob_mu"][None, :], (B, self.n_global)))
            parts_lp.append(jnp.broadcast_to(p["glob_lp"][None, :], (B, self.n_global)))
        n_const = len(self.program.sites.constant)
        if n_const:
            cvals = self.program.const_value[self.program.constant_slice]
            parts_mu.append(jnp.broadcast_to(jnp.asarray(cvals)[None, :], (B, n_const)))
            parts_lp.append(jnp.zeros((B, n_const), jnp.float32))

        mu = jnp.concatenate(parts_mu, axis=1)
        logprec = jnp.concatenate(parts_lp, axis=1)
        # Constrain free params: Normal family is (identity, positive);
        # Kumaraswamy is (positive, positive) — (a, b) ride the (mu, prec)
        # slots (reference constrain_parameter, vihds/encoders.py:94-101).
        if self.program.is_kumaraswamy.any():
            mu = jnp.where(self.program.is_kumaraswamy, jnp.exp(mu), mu)
        return AttrDict(mu=mu, logprec=logprec, prec=jnp.exp(logprec))
