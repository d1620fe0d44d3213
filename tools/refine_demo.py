"""Posterior-refinement demo on a TRAINED model.

Restores trained parameters from a run's checkpoint, then sharpens the
amortised posterior with annealed SMC and HMC on held-out data, reporting the
per-datapoint SMC log-evidence against the amortised IWAE bound.

Usage: python tools/refine_demo.py <checkpoints_dir> [spec] [n_particles]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("INFERENCE_RESULTS_DIR", "/tmp/vihds_tpu_results")


def main():
    ckpt_dir = sys.argv[1]
    spec = sys.argv[2] if len(sys.argv) > 2 else "specs/dr_constant_icml.yaml"
    n_particles = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vihds_tpu import checkpoint as ckpt
    from vihds_tpu import refine
    from vihds_tpu.config import Config
    from vihds_tpu.data.datasets import build_datasets
    from vihds_tpu.prob import ParamProgram, parse_parameters
    from vihds_tpu.run_xval import create_parser
    from vihds_tpu.training import batch_arrays, iwae_elbo_terms
    from vihds_tpu.vae import VAE

    args = create_parser(True).parse_args([spec])
    args.seed = 0
    settings = Config(args)
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    params = model.init_params(jax.random.PRNGKey(0))

    step, state = ckpt.restore(ckpt_dir, template=None)
    if state is None:
        raise SystemExit("no checkpoint under %s" % ckpt_dir)
    params = state["params"]
    print("restored params from epoch %s" % step)

    n = min(12, data.n_test)
    batch = batch_arrays(data.test.dataset.select(data.test.indices[:n]))
    key = jax.random.PRNGKey(7)

    # Amortised IWAE bound at K = n_particles (the baseline to beat)
    u = model.sample_u(key, n, n_particles)
    out = model.forward(params, batch, u)
    terms = iwae_elbo_terms(program, out, batch, model.use_laplace)
    iwae = np.asarray(
        jax.scipy.special.logsumexp(terms.log_w, axis=1) - np.log(n_particles)
    )

    smc = refine.smc_refine(
        model, program, params, batch, key, n_particles=n_particles, n_temps=16, n_moves=2
    )
    logZ = np.asarray(smc.log_evidence)

    hmc = refine.hmc_refine(
        model, program, params, batch, key, n_chains=n_particles, n_steps=60
    )

    print("\nper-datapoint bounds (first %d validation series):" % n)
    print("  amortised IWAE:  mean %9.2f" % iwae.mean())
    print("  SMC log-evidence: mean %9.2f  (tighter by %.2f nats/datapoint)"
          % (logZ.mean(), (logZ - iwae).mean()))
    print("  HMC accept rate:  %.2f (post-warmup mean)" % float(np.asarray(hmc.accept_rate).mean()))
    lj = np.asarray(hmc.log_joint_trace)
    print("  HMC median log-joint: start %.1f -> end %.1f" % (lj[0], lj[-1]))


if __name__ == "__main__":
    main()
