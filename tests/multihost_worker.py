"""Worker process for the multi-host test (not a pytest module).

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices; together they form one
jax.distributed job with a global (data=2, sample=4) mesh.  Each process
contributes its local half of a 4-row batch via
``multihost.host_local_batch_to_global`` and runs one jitted
value-and-grad of the IWAE bound; the replicated outputs are printed so the
parent test can assert cross-process agreement with the single-process
value (SURVEY.md §4: exercise collectives without a pod).
"""

import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from vihds_tpu.parallel import multihost

    n_processes, process_index = multihost.initialize(
        coordinator_address="127.0.0.1:%s" % port, num_processes=nproc, process_id=pid
    )
    assert n_processes == nproc and process_index == pid
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np

    from vihds_tpu import parallel
    from vihds_tpu.config import Config
    from vihds_tpu.data.datasets import build_datasets
    from vihds_tpu.prob import ParamProgram, parse_parameters
    from vihds_tpu.run_xval import create_parser
    from vihds_tpu.training import batch_arrays, iwae_elbo, iwae_elbo_terms
    from vihds_tpu.vae import VAE

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = create_parser(True).parse_args([os.path.join(repo, "specs", "dr_constant_one.yaml")])
    args.seed = 0
    settings = Config(args)
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    params = model.init_params(jax.random.PRNGKey(0))  # deterministic: same on every process

    N_BATCH, K = 4, 8
    full = batch_arrays(data.train.dataset.select(np.arange(N_BATCH)))
    # rows this process feeds in: its contiguous slice of the 'data' axis
    rows = slice(pid * (N_BATCH // nproc), (pid + 1) * (N_BATCH // nproc))
    local = type(full)(
        observations=np.asarray(full.observations[rows]),
        inputs=np.asarray(full.inputs[rows]),
        dev_1hot=np.asarray(full.dev_1hot[rows]),
        times=np.asarray(full.times),
    )

    mesh = multihost.global_mesh(n_data=nproc, n_sample=4)
    batch_global = multihost.host_local_batch_to_global(mesh, local)

    def neg_elbo(params, batch, key):
        u = model.sample_u(key, N_BATCH, K)
        out = model.forward(params, batch, u)
        terms = iwae_elbo_terms(program, out, batch, model.use_laplace)
        return -iwae_elbo(terms, None)

    with parallel.use_mesh(mesh):
        val, grads = jax.jit(jax.value_and_grad(neg_elbo))(
            params, batch_global, jax.random.PRNGKey(7)
        )
        gnorm = jax.jit(lambda g: jax.tree_util.tree_reduce(
            lambda a, x: a + (x ** 2).sum(), g, 0.0) ** 0.5)(grads)
    print("MULTIHOST_ELBO %d %.6f" % (pid, -float(val)), flush=True)
    print("MULTIHOST_GNORM %d %.6f" % (pid, float(gnorm)), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
