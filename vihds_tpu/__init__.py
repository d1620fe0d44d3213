"""VI-HDS-TPU: a TPU-native framework for amortised Bayesian inference in
hierarchical nonlinear dynamical systems.

Re-designed from scratch for JAX/XLA/Pallas on TPU, with the capability set of
microsoft/vi-hds (the PyTorch reference implementation of the ICML 2019 paper
"Efficient Amortised Bayesian Inference for Hierarchical and Nonlinear
Dynamical Systems").

Architecture (TPU-first, not a port):
  - The YAML parameter spec is *compiled once* into a static, vectorised
    probabilistic program (``vihds_tpu.prob``) instead of the reference's
    per-forward dynamic distribution-graph assembly
    (cf. reference vihds/encoders.py:383-404, vihds/distributions.py:94-142).
  - ODE models are pure functions (RHS / observe / init-state) integrated with
    ``lax.scan``/``lax.while_loop`` solvers under one end-to-end ``jit``-compiled
    IWAE-ELBO step (cf. reference vihds/ode.py, vihds/solvers.py).
  - Batch and IWAE-sample axes shard over a ``jax.sharding.Mesh``
    (``vihds_tpu.parallel``); collectives are inserted by XLA/GSPMD.
"""

__version__ = "0.1.0"
