"""Gradient health: one ELBO gradient through the full stack, no NaNs
(model: reference tests/test_grad_dr.py)."""

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

SPECS = [
    "dr_constant_one.yaml",
    "dr_constant_icml.yaml",
    "dr_constant_v2.yaml",
    "dr_constant_precisions.yaml",
    "dr_constant_precisions_v2.yaml",
    "dr_blackbox_icml.yaml",
    "dr_growthrate_xval.yaml",
    "auto_constant.yaml",
    "auto_constant_precisions.yaml",
    "prpr_constant.yaml",
    "prpr_constant_precisions.yaml",
    "relay_constant_precisions.yaml",
    "degrader_constant_precisions.yaml",
    "inducer_constant_precisions.yaml",
    "debug.yaml",
]


@pytest.mark.parametrize("spec_name", SPECS)
def test_no_nan_gradients(spec_name):
    args = make_args(spec(spec_name))
    settings = Config(args)
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    params = model.init_params(jax.random.PRNGKey(0))

    n = min(8, data.n_train)
    batch = batch_arrays(data.train.dataset.select(np.arange(n)))

    def loss(params):
        u = model.sample_u(jax.random.PRNGKey(1), n, 5)
        out = model.forward(params, batch, u)
        terms = iwae_elbo_terms(program, out, batch, model.use_laplace)
        return -iwae_elbo(terms)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val)), "ELBO not finite for %s" % spec_name
    flat, _ = jax.tree_util.tree_flatten(grads)
    for g in flat:
        assert np.isfinite(np.asarray(g)).all(), "NaN/inf gradient in %s" % spec_name
