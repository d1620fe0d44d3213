"""Multi-process execution: 2 jax.distributed CPU processes x 4 virtual
devices form one global (data=2, sample=4) mesh; each process feeds its own
host-local batch shard and the sharded IWAE value/grad must match the
single-process computation (SURVEY.md §4's multi-process recommendation —
collectives exercised without a pod)."""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

from tests.conftest import make_args, spec

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """The same ELBO/grad-norm computed in this (single-)process."""
    from vihds_tpu.config import Config
    from vihds_tpu.data.datasets import build_datasets
    from vihds_tpu.prob import ParamProgram, parse_parameters
    from vihds_tpu.training import batch_arrays, iwae_elbo, iwae_elbo_terms
    from vihds_tpu.vae import VAE

    args = make_args(spec("dr_constant_one.yaml"))
    settings = Config(args)
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = batch_arrays(data.train.dataset.select(np.arange(4)))

    def neg_elbo(params):
        u = model.sample_u(jax.random.PRNGKey(7), 4, 8)
        out = model.forward(params, batch, u)
        terms = iwae_elbo_terms(program, out, batch, model.use_laplace)
        return -iwae_elbo(terms, None)

    val, grads = jax.value_and_grad(neg_elbo)(params)
    gnorm = jax.tree_util.tree_reduce(lambda a, x: a + float((x ** 2).sum()), grads, 0.0) ** 0.5
    return -float(val), float(gnorm)


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, out[-2000:] + err[-2000:]
        outs.append(out)

    elbos, gnorms = {}, {}
    for out in outs:
        for pid, v in re.findall(r"MULTIHOST_ELBO (\d+) (\S+)", out):
            elbos[int(pid)] = float(v)
        for pid, v in re.findall(r"MULTIHOST_GNORM (\d+) (\S+)", out):
            gnorms[int(pid)] = float(v)
    assert set(elbos) == {0, 1}, outs
    # both processes see the same replicated outputs
    np.testing.assert_allclose(elbos[0], elbos[1], rtol=1e-6)
    np.testing.assert_allclose(gnorms[0], gnorms[1], rtol=1e-6)

    ref_elbo, ref_gnorm = _single_process_reference()
    np.testing.assert_allclose(elbos[0], ref_elbo, rtol=1e-4)
    np.testing.assert_allclose(gnorms[0], ref_gnorm, rtol=1e-3)
