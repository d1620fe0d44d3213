"""Measure the fused Pallas integrators against the XLA scan forward on the
real chip, per model family (dr/relay/degrader ± precisions, blackbox).

Usage:  python tools/pallas_family_bench.py [n_batch] [n_iwae] [reps]

Prints one line per family: scan ms, pallas ms, speedup.  Forward
(eval-path) only — BASELINE.md records that training stays on the XLA
scan+remat path by measurement; these kernels ship as the eval/simulate
capability (`eval_solver: pallas_<method>`)."""

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vihds_tpu.config import Config
    from vihds_tpu.data.datasets import build_datasets
    from vihds_tpu.prob import ParamProgram, parse_parameters
    from vihds_tpu.run_xval import create_parser
    from vihds_tpu.training import batch_arrays
    from vihds_tpu.vae import VAE

    def spec(name):
        return os.path.join(REPO, "specs", name)

    def make_args(yaml_path):
        # tests/conftest has the same helper, but importing it would force
        # the CPU platform (its jax.config.update runs at import) — this
        # tool must run on the real chip.
        args = create_parser(True).parse_args([yaml_path])
        args.seed = 0
        return args

    n_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 36
    n_iwae = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    fams = [
        ("dr_constant", "dr_constant_one.yaml"),
        ("dr_constant_precisions", "dr_constant_precisions.yaml"),
        ("relay_constant_precisions", "relay_constant_precisions.yaml"),
        ("degrader_constant_precisions", "degrader_constant_precisions.yaml"),
        ("dr_blackbox", "dr_blackbox_icml.yaml"),
    ]
    print("device:", jax.devices()[0], "| B=%d K=%d reps=%d" % (n_batch, n_iwae, reps))
    for name, spec_name in fams:
        args = make_args(spec(spec_name))
        settings = Config(args)
        data = build_datasets(args, settings)
        program = ParamProgram(parse_parameters(settings.params))
        model = VAE(settings, data, program)
        params = model.init_params(jax.random.PRNGKey(0))
        n = min(n_batch, data.train.dataset.observations.shape[0])
        batch = batch_arrays(data.train.dataset.select(np.arange(n)))
        q = model.encoder(params["enc"], batch)
        u = model.sample_u(jax.random.PRNGKey(1), n, n_iwae)
        th = program.theta_dict(program.clip(program.sample(q, u), stddevs=4))
        th = model.ode_model.condition_theta(params["dec"], th, batch.dev_1hot)
        ode = model.ode_model

        def run(solver):
            old = ode.solver
            ode.solver = solver
            try:
                f = jax.jit(
                    lambda: ode.simulate(
                        params["dec"], th, batch.times, batch.inputs, batch.dev_1hot, n_iwae
                    )
                )
                f()[0].block_until_ready()  # compile
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = f()
                jax.block_until_ready(out)
                return (time.perf_counter() - t0) / reps * 1e3
            finally:
                ode.solver = old

        ms_scan = run("midpoint")
        ms_pal = run("pallas_midpoint")
        print(
            "%-28s scan %7.3f ms | pallas %7.3f ms | speedup %.2fx"
            % (name, ms_scan, ms_pal, ms_scan / ms_pal)
        )


if __name__ == "__main__":
    main()
