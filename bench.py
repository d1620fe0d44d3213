"""Benchmark: IWAE-ELBO training steps/sec on dr_constant_icml.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Regime matches the reference default training loop (n_batch=36, K=200 IWAE
samples, midpoint solver on the 86-point grid — reference vihds/run_xval.py:
27-35, vihds/config.py:59-84): each step is forward + IWAE bound + gradient +
Adam update.

The baseline denominator is the reference PyTorch implementation measured on
this machine's CPU at the identical regime (see BASELINE.md "Measured" —
steps/sec over full epochs, python bench_reference.py).
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("INFERENCE_RESULTS_DIR", "/tmp/vihds_tpu_results")

# Reference (microsoft/vi-hds, torch CPU, solver=midpoint, B=36, K=200):
# measured on this machine — see BASELINE.md and bench_reference.py.
# RE-MEASURED round 3 (2026-08-19): 1.93 steps/s (30 steps, 4 threads, idle
# Xeon @2.10GHz) vs the 0.092 recorded in round 1 — a ~21x denominator
# correction (environment changed between rounds; the TPU-side numbers were
# stable throughout).  BASELINE.md "Measured" has the full history.
REFERENCE_CPU_STEPS_PER_SEC = 1.93


def main():
    import jax
    import jax.numpy as jnp

    from vihds_tpu.profiling import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _build
    from vihds_tpu.training import Training

    n_batch, n_samples = 36, 200
    args, settings, data, program, model = _build(train_samples=n_samples)
    args.epochs = 1
    args.test_epoch = 10**9
    settings.trainer = None
    training = Training(args, settings, data, program, model)

    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    opt_state = training.tx.init(params)
    host = training.train_data
    from vihds_tpu.utils.attrdict import AttrDict

    from vihds_tpu.training import split_device_data

    data_dev = AttrDict(
        (k, jnp.asarray(v)) for k, v in split_device_data(host).items()
    )
    times = jnp.asarray(host.times)

    # Measure the fused multi-epoch path exactly as Training.run dispatches
    # it: all epochs to the next eval boundary ride ONE device call.  At the
    # reference default regime (test_epoch=20) on dr_constant_icml that is
    # 20 epochs x 7 batches = 140 steps per dispatch.  Throughput is
    # dispatch-size dependent through the tunnel's ~30 ms per-call latency
    # (measured: 50-step dispatches ~690 steps/s, 140-step ~939 steps/s —
    # see BASELINE.md), so the benchmark pins the production dispatch size.
    n_steps = 140
    stacks = AttrDict(
        idx=jnp.broadcast_to(jnp.arange(n_batch, dtype=jnp.int32)[None], (n_steps, n_batch)),
        mask=jnp.ones((n_steps, n_batch), jnp.float32),
    )

    epoch_fn = lambda p, o, k, s: training._train_epoch(p, o, k, s, data_dev, times)
    p, o, key, elbos = epoch_fn(params, opt_state, key, stacks)
    jax.block_until_ready(elbos)
    assert np.isfinite(np.asarray(elbos)).all(), "warmup ELBOs not finite"

    # Production dispatch pattern (Training.run round 3): dispatches are
    # PIPELINED — each chunk's ELBO fetch (the NaN check) is deferred one
    # boundary so it overlaps the next chunk's device execution instead of
    # serializing a ~30 ms tunnel round-trip between dispatches.  Measure
    # per-call rates under that pattern (fetch of call i-1 between dispatch
    # of call i and i+1), median over calls against tunnel jitter.
    rates = []
    pending = None
    t_prev = time.perf_counter()
    for _ in range(6):
        p, o, key, elbos = epoch_fn(p, o, key, stacks)
        if pending is not None:
            assert np.isfinite(np.asarray(pending)).all(), "ELBOs not finite"
            t_now = time.perf_counter()
            rates.append(n_steps / (t_now - t_prev))
            t_prev = t_now
        pending = elbos
    jax.block_until_ready(pending)
    t_now = time.perf_counter()
    rates.append(n_steps / (t_now - t_prev))
    steps_per_sec = float(np.median(rates))

    # On-device ms/step (VERDICT r3 #10 roofline anchor): drain a DEEP queue
    # of the same compiled dispatch — dispatches are async, so the device
    # executes the queue back-to-back and the per-call tunnel latency
    # amortizes away; the drained rate approaches the pure device rate
    # (xplane-measured 0.716 ms/step on v5e for this program).
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        p, o, key, elbos = epoch_fn(p, o, key, stacks)
    jax.block_until_ready(elbos)
    ms_per_step_device = (time.perf_counter() - t0) * 1000.0 / (reps * n_steps)

    vs = steps_per_sec / REFERENCE_CPU_STEPS_PER_SEC if REFERENCE_CPU_STEPS_PER_SEC else None
    print(
        json.dumps(
            {
                "metric": "elbo_steps_per_sec_dr_constant_icml_B36_K200",
                "value": round(steps_per_sec, 4),
                "unit": "steps/s",
                "vs_baseline": round(vs, 2) if vs else None,
                "spread_min": round(float(np.min(rates)), 1),
                "spread_max": round(float(np.max(rates)), 1),
                "steps_per_dispatch": n_steps,
                "on_device_ms_per_step": round(ms_per_step_device, 4),
                # roofline: the solver is elementwise VPU algebra (no matmuls
                # in the hot loop), so MXU MFU ~0 BY DESIGN; the backward
                # rematerializes the scan instead of streaming residuals
                # through HBM.  Op-level evidence: reports/trainstep_profile.
                "roofline": "VPU-bound elementwise ODE scan; MXU MFU ~0 by design",
            }
        )
    )


if __name__ == "__main__":
    main()
