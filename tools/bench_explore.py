"""On-chip training-step throughput exploration (dr_constant_icml, B=36,
K=200 — the BASELINE.md regime): dispatch-size sweep and the Pallas fused
integrator as the training solver.

Usage: python tools/bench_explore.py [repeats]
Prints one JSON line per configuration.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("INFERENCE_RESULTS_DIR", "/tmp/vihds_tpu_results")


def measure(training, model, n_steps, repeats):
    import jax
    import jax.numpy as jnp

    from vihds_tpu.utils.attrdict import AttrDict

    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    opt_state = training.tx.init(params)
    host = training.train_data
    from vihds_tpu.training import split_device_data

    data_dev = AttrDict(
        (k, jnp.asarray(v)) for k, v in split_device_data(host).items()
    )
    stacks = AttrDict(
        idx=jnp.broadcast_to(jnp.arange(36, dtype=jnp.int32)[None], (n_steps, 36)),
        mask=jnp.ones((n_steps, 36), jnp.float32),
    )
    times = jnp.asarray(host.times)
    fn = lambda p, o, k, s: training._train_epoch(p, o, k, s, data_dev, times)
    p, o, k, e = fn(params, opt_state, key, stacks)
    jax.block_until_ready(e)
    assert np.isfinite(np.asarray(e)).all()
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        p, o, k, e = fn(p, o, k, stacks)
        jax.block_until_ready(e)
        rates.append(n_steps / (time.perf_counter() - t0))
    return {
        "median": round(float(np.median(rates)), 1),
        "min": round(float(np.min(rates)), 1),
        "max": round(float(np.max(rates)), 1),
    }


def build(solver=None):
    from __graft_entry__ import _build
    from vihds_tpu.training import Training

    args, settings, data, program, model = _build(train_samples=200)
    if solver:
        settings.params.solver = solver
        model.ode_model.solver = solver
    args.epochs = 1
    args.test_epoch = 10 ** 9
    settings.trainer = None
    return Training(args, settings, data, program, model), model


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    for solver in (None, "pallas_midpoint"):
        training, model = build(solver)
        for n_steps in (50, 140):
            r = measure(training, model, n_steps, repeats)
            print(
                json.dumps(
                    {"solver": solver or "midpoint(xla)", "steps_per_dispatch": n_steps, **r}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
