"""Probabilistic core: YAML parameter spec -> static, vectorised program.

The reference assembles a fresh ``ChainedDistribution`` object graph on every
forward pass and topologically sorts it at sample time
(reference vihds/distributions.py:94-142, vihds/encoders.py:383-404).
Here the spec is compiled ONCE into flat per-site static arrays; sampling,
log-probability and clipping are pure vectorised jnp functions over a single
``theta[B, K, n_theta]`` tensor — the shape XLA/TPU wants.
"""

from vihds_tpu.prob.sites import Site, ParamSites, parse_parameters  # noqa: F401
from vihds_tpu.prob.program import ParamProgram  # noqa: F401
