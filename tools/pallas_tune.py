"""Block-size search for the fused Pallas integrators (VERDICT r4 #4).

For each family kernel, times the forward at several ``block_rows`` values
(via the VIHDS_PALLAS_BLOCK hook read at trace time) against the XLA scan,
and prints a table naming the best block.  The winning defaults get baked
into vihds_tpu/ops/pallas_ode.py / pallas_blackbox.py; any family that
stays < 1.0x after the sweep is demoted to experimental in PARITY.md.

Usage:  python tools/pallas_tune.py [n_batch] [n_iwae] [reps] [blocks...]
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main():
    import numpy as np
    import jax

    from vihds_tpu.config import Config
    from vihds_tpu.data.datasets import build_datasets
    from vihds_tpu.prob import ParamProgram, parse_parameters
    from vihds_tpu.run_xval import create_parser
    from vihds_tpu.training import batch_arrays
    from vihds_tpu.vae import VAE

    n_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 36
    n_iwae = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    blocks = [int(b) for b in sys.argv[4:]] or [128, 256, 512, 1024, 2048]

    fams = [
        ("dr_constant", "dr_constant_one.yaml"),
        ("dr_constant_precisions", "dr_constant_precisions.yaml"),
        ("relay_constant_precisions", "relay_constant_precisions.yaml"),
        ("degrader_constant_precisions", "degrader_constant_precisions.yaml"),
        ("dr_blackbox", "dr_blackbox_icml.yaml"),
    ]
    print("device:", jax.devices()[0], "| B=%d K=%d reps=%d blocks=%s" % (n_batch, n_iwae, reps, blocks))
    for name, spec_name in fams:
        args = create_parser(True).parse_args([os.path.join(REPO, "specs", spec_name)])
        args.seed = 0
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
                f()[0].block_until_ready()
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = f()
                jax.block_until_ready(out)
                return (time.perf_counter() - t0) / reps * 1e3
            finally:
                ode.solver = old

        ms_scan = run("midpoint")
        rows = []
        for b in blocks:
            os.environ["VIHDS_PALLAS_BLOCK"] = str(b)
            try:
                rows.append((b, run("pallas_midpoint")))
            except Exception as e:  # compile-time VMEM OOM etc.
                rows.append((b, None))
                print("  block %4d failed: %s" % (b, str(e).splitlines()[0][:100]))
            finally:
                os.environ.pop("VIHDS_PALLAS_BLOCK", None)
        ok = [(b, ms) for b, ms in rows if ms is not None]
        best_b, best_ms = min(ok, key=lambda x: x[1]) if ok else (None, float("nan"))
        detail = " ".join(
            "%d:%.2f" % (b, ms) if ms is not None else "%d:OOM" % b for b, ms in rows
        )
        print(
            "%-28s scan %7.3f ms | best block %s -> %7.3f ms | speedup %.2fx | %s"
            % (name, ms_scan, best_b, best_ms, ms_scan / best_ms, detail)
        )


if __name__ == "__main__":
    main()
