"""Dataset / batch / encoder shape contracts
(model: reference tests/test_shapes.py)."""

import numpy as np
import jax

from tests.conftest import make_args, spec
from vihds_tpu.config import Config
from vihds_tpu.data.datasets import build_datasets
from vihds_tpu.nn.encoder import Encoder
from vihds_tpu.prob import ParamProgram, parse_parameters


def test_icml_dataset_shapes():
    args = make_args(spec("dr_constant_icml.yaml"))
    settings = Config(args)
    data = build_datasets(args, settings)
    # 312 series over 6 devices, 4-fold split (reference tests/test_shapes.py:31)
    assert data.n_train + data.n_test == 312
    assert data.n_test == 78
    ds = data.train.dataset
    assert ds.observations.shape == (312, 4, 86)
    assert ds.times.shape == (86,)
    assert ds.inputs.shape == (312, 2)
    assert ds.dev_1hot.shape == (312, 7)  # aR depth 3 + aS depth 4
    assert data.depth == 7


def test_batch_and_encoder_shapes():
    args = make_args(spec("dr_constant_icml.yaml"))
    settings = Config(args)
    data = build_datasets(args, settings)
    batch = data.train.dataset.select(np.arange(36))
    assert batch.observations.shape == (36, 4, 86)
    assert batch.dev_1hot.shape == (36, 7)
    assert batch.inputs.shape == (36, 2)

    program = ParamProgram(parse_parameters(settings.params))
    enc = Encoder(program, data, settings.params)
    params = enc.init_params(jax.random.PRNGKey(0))
    q = enc(params, batch)
    assert q.mu.shape == (36, program.n_theta)
    assert q.prec.shape == (36, program.n_theta)
    assert np.isfinite(np.asarray(q.mu)).all()
    assert (np.asarray(q.prec) > 0).all()
    encoded = enc.trunk(params, batch.observations)
    assert encoded.shape == (36, settings.params.n_hidden)


def test_scaling_and_onehots():
    args = make_args(spec("dr_constant_icml.yaml"))
    settings = Config(args)
    data = build_datasets(args, settings)
    ds = data.train.dataset
    # multi-hot cassette rows: one 1 per group block
    assert set(np.unique(ds.dev_1hot)) <= {0.0, 1.0}
    assert np.allclose(ds.dev_1hot.sum(1), 2.0)  # one per group (aR, aS)
    # per-series background subtraction makes the min 0
    assert np.allclose(ds.observations.min(axis=2), 0.0, atol=1e-6)
