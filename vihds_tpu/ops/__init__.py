"""Compute-path ops: ODE integrators, observation log-likelihoods."""

from vihds_tpu.ops.solvers import integrate, FIXED_GRID_SOLVERS  # noqa: F401
from vihds_tpu.ops.logprob import (  # noqa: F401
    log_prob_gaussian,
    log_prob_laplace,
    log_prob_observations,
)
