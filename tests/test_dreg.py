"""DReG estimator: decoder gradients must equal the standard IWAE gradient;
encoder gradients must drop the score-function term (differ from standard,
finite, and correctly reweighted)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import make_args, spec
from vihds_tpu.config import Config
from vihds_tpu.data.datasets import build_datasets
from vihds_tpu.prob import ParamProgram, parse_parameters
from vihds_tpu.training import (
    batch_arrays,
    dreg_value_and_grad,
    iwae_elbo,
    iwae_elbo_terms,
)
from vihds_tpu.vae import VAE

N, K = 6, 7


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


def _standard(program, model, params, batch, mask, key):
    def loss(params):
        u = model.sample_u(key, N, K)
        out = model.forward(params, batch, u)
        terms = iwae_elbo_terms(program, out, batch, model.use_laplace)
        return -iwae_elbo(terms, mask)

    return jax.value_and_grad(loss)(params)


def test_dreg_decoder_matches_standard_and_encoder_differs(setup):
    program, model, params, batch = setup
    key = jax.random.PRNGKey(3)
    mask = jnp.ones((N,), jnp.float32)

    loss_std, g_std = _standard(program, model, params, batch, mask, key)
    vag = dreg_value_and_grad(model, program, K, model.use_laplace)
    loss_dreg, g_dreg = vag(params, batch, mask, key)

    # same bound value
    np.testing.assert_allclose(float(loss_std), float(loss_dreg), rtol=1e-5)

    # decoder grads: identical to the standard estimator
    f1, _ = jax.tree_util.tree_flatten(g_std["dec"])
    f2, _ = jax.tree_util.tree_flatten(g_dreg["dec"])
    assert len(f1) == len(f2)
    for a, b in zip(f1, f2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7)

    # encoder grads: finite everywhere and NOT identical (score term removed)
    f_enc, _ = jax.tree_util.tree_flatten(g_dreg["enc"])
    assert all(np.isfinite(np.asarray(g)).all() for g in f_enc)
    diffs = [
        np.max(np.abs(np.asarray(a) - np.asarray(b)))
        for a, b in zip(*[jax.tree_util.tree_leaves(g["enc"]) for g in (g_std, g_dreg)])
    ]
    assert max(diffs) > 1e-8, "DReG encoder gradient should differ from standard"


def test_dreg_training_step_runs(setup):
    """--dreg wired through Training._build_steps."""
    program, model, params, batch = setup
    import optax

    args = make_args(spec("dr_constant_one.yaml"))
    args.dreg = True
    settings = Config(args)
    data = build_datasets(args, settings)
    from vihds_tpu.training import Training

    settings.trainer = None
    training = Training(args, settings, data, program, model)
    opt_state = training.tx.init(params)
    mask = jnp.ones((batch.observations.shape[0],), jnp.float32)
    from vihds_tpu.utils.attrdict import AttrDict

    from vihds_tpu.training import split_device_data

    n_b = batch.observations.shape[0]
    data_dev = AttrDict(split_device_data(batch))
    stacks = AttrDict(
        idx=jnp.arange(n_b, dtype=jnp.int32)[None],
        mask=mask[None],
    )
    p2, o2, _, elbos = training._train_epoch(
        params, opt_state, jax.random.PRNGKey(0), stacks, data_dev, batch.times
    )
    assert np.isfinite(np.asarray(elbos)).all()
