"""Observation log-likelihoods (Gaussian / Laplace, precision-parameterised).

Parity: reference vihds/training.py:24-44.  The Laplace constant is computed
correctly here (the reference calls torch.log on a Python float at
training.py:37, a latent bug noted in SURVEY.md §2.5).

Everything is elementwise + a time-axis reduction; XLA fuses this into the
tail of the decoder, so no special kernel is needed — the precisions argument
may be a broadcastable view (e.g. [B,K,S,1]) and is never materialised at
[B,K,S,T].
"""

import math

import jax.numpy as jnp

_LOG_HALF = math.log(0.5)
_LOG_2PI = math.log(2.0 * math.pi)


def log_prob_gaussian(x_obs, x_predict, precisions):
    return -0.5 * (_LOG_2PI - jnp.log(precisions) + precisions * (x_predict - x_obs) ** 2)


def log_prob_laplace(x_obs, x_predict, precisions):
    return _LOG_HALF + jnp.log(precisions) - precisions * jnp.abs(x_predict - x_obs)


def log_prob_observations(x_predict, x_obs, precisions, use_laplace=False):
    """x_obs[B,S,T] vs x_predict[B,K,S,T] -> log-prob by species [B,K,S]
    (sum over the time axis; parity: vihds/training.py:24-33)."""
    x_obs_ = x_obs[:, None, :, :]
    lpfunc = log_prob_laplace if use_laplace else log_prob_gaussian
    log_prob = lpfunc(x_obs_, x_predict, precisions)
    return jnp.sum(log_prob, axis=3)
