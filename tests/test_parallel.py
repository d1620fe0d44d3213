"""Sharded execution: the (data, sample)-mesh train step must give the same
numbers as the single-device step, and the dry-run entry must work
(SURVEY.md §2.4/§5.8 — multi-chip capability the reference lacks)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tests.conftest import make_args, spec
from vihds_tpu import parallel
from vihds_tpu.config import Config
from vihds_tpu.data.datasets import build_datasets
from vihds_tpu.prob import ParamProgram, parse_parameters
from vihds_tpu.training import batch_arrays, iwae_elbo, iwae_elbo_terms
from vihds_tpu.vae import VAE

N_BATCH, N_SAMPLES = 4, 8


def _setup():
    args = make_args(spec("dr_constant_one.yaml"))
    settings = Config(args)
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    batch = batch_arrays(data.train.dataset.select(np.arange(N_BATCH)))
    return program, model, batch


def _make_step(model, program, tx, fold=False):
    def train_step(params, opt_state, batch, mask, key):
        def loss_fn(params):
            u = model.sample_u(key, batch.observations.shape[0], N_SAMPLES)
            if fold:
                # the production training objective (online log-lik scan)
                out = model.forward_logprob(params, batch, u)
                from vihds_tpu.utils.attrdict import AttrDict

                log_w = (
                    out.log_p_by_species.sum(axis=2)
                    + program.log_prob(program.prior_q(), out.theta)
                    - program.log_prob(out.q, out.theta)
                )
                terms = AttrDict(log_w=log_w)
            else:
                out = model.forward(params, batch, u)
                terms = iwae_elbo_terms(program, out, batch, model.use_laplace)
            return -iwae_elbo(terms, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, -loss

    return train_step


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("fold", [False, True], ids=["trajectory", "fold"])
def test_sharded_step_matches_single_device(fold):
    program, model, batch = _setup()
    tx = optax.adam(1e-2)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    mask = jnp.ones((N_BATCH,), jnp.float32)
    key = jax.random.PRNGKey(7)
    step = _make_step(model, program, tx, fold=fold)

    p1, _, elbo1 = jax.jit(step)(params, opt_state, batch, mask, key)

    mesh = parallel.make_mesh(n_data=2, devices=jax.devices()[:8])
    with parallel.use_mesh(mesh):
        sharded = parallel.shard_step(step, mesh)
        p2, _, elbo2 = sharded(params, opt_state, batch, mask, key)

    np.testing.assert_allclose(float(elbo1), float(elbo2), rtol=1e-4)
    flat1, _ = jax.tree_util.tree_flatten(p1)
    flat2, _ = jax.tree_util.tree_flatten(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_entry():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_refinement_runs_sharded():
    """HMC refinement executes under the (data, sample) mesh with the batch
    sharded over 'data' and chains over 'sample'."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vihds_tpu import refine

    program, model, batch = _setup()
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = parallel.make_mesh(n_data=2, devices=jax.devices()[:8])
    data_sh = NamedSharding(mesh, P("data"))
    sharded_batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sh) if x.ndim and x.shape[0] == N_BATCH else x, batch
    )
    with parallel.use_mesh(mesh):
        out = refine.hmc_refine(
            model, program, params, sharded_batch, jax.random.PRNGKey(1),
            n_chains=8, n_steps=4, n_leapfrog=2,
        )
    theta = np.asarray(out.theta)
    assert theta.shape == (N_BATCH, 8, program.n_theta)
    assert np.isfinite(theta).all()


def test_mesh_factory_shapes():
    devs = jax.devices()
    mesh = parallel.make_mesh(devices=devs)
    assert mesh.shape["data"] * mesh.shape["sample"] == len(devs)
    if len(devs) >= 8:
        mesh = parallel.make_mesh(n_data=4, devices=devs[:8])
        assert mesh.shape["data"] == 4 and mesh.shape["sample"] == 2


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >= 2 devices")
def test_vmap_folds_fold_sharded_matches_unsharded(tmp_path, monkeypatch):
    """--vmap_folds + --mesh shards the FOLD axis over mesh devices (folds
    are independent, so the partitioned program has zero collectives); the
    sharded run must reproduce the unsharded vmapped run."""
    from vihds_tpu import xfold
    from vihds_tpu.config import Trainer

    monkeypatch.setenv("INFERENCE_RESULTS_DIR", str(tmp_path))
    args = make_args(spec("dr_constant_one.yaml"), epochs=2, test_epoch=2, folds=2)
    args.train_samples = 4
    args.test_samples = 4

    def run(mesh, tag):
        args.experiment = "foldmesh_" + tag
        settings = Config(args)
        settings.trainer = Trainer(args, log_dir=str(tmp_path / tag))
        runner = xfold.VmapXval(args, settings, fold_mesh=mesh)
        return runner.run()

    res_plain = run(None, "plain")
    mesh = xfold.make_fold_mesh(2, devices=jax.devices()[:2])
    assert mesh is not None and mesh.shape["fold"] == 2
    res_sharded = run(mesh, "sharded")
    for a, b in zip(res_plain, res_sharded):
        np.testing.assert_allclose(np.asarray(a.elbo_list), np.asarray(b.elbo_list), rtol=1e-4)
        np.testing.assert_allclose(a.iw_predict_mu, b.iw_predict_mu, rtol=1e-3, atol=1e-5)
