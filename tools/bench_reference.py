"""Measure the reference implementation's training throughput on this CPU.

Runs the UNMODIFIED reference (mounted at /root/reference) with two tiny
dependency shims (munch, torchdiffeq-fixed-grid) since those packages are not
installed in this image.  The result is the denominator recorded in
BASELINE.md and bench.py.

Usage: python tools/bench_reference.py [n_steps] [train_samples]
"""

import os
import sys
import time
import types
from collections import OrderedDict

REFERENCE = "/root/reference"

# --------------------------------------------------------------------- shims
munch = types.ModuleType("munch")


class Munch(OrderedDict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


def munchify(obj):
    if isinstance(obj, dict):
        return Munch((k, munchify(v)) for k, v in obj.items())
    if isinstance(obj, (list, tuple)):
        return type(obj)(munchify(v) for v in obj)
    return obj


munch.Munch = Munch
munch.munchify = munchify
sys.modules["munch"] = munch

torchdiffeq = types.ModuleType("torchdiffeq")


def _odeint(func, y0, t, method="midpoint", **kw):
    import torch

    ys = [y0]
    y = y0
    for i in range(len(t) - 1):
        t0, t1 = t[i], t[i + 1]
        h = t1 - t0
        if method == "midpoint":
            k1 = func(t0, y)
            k2 = func(t0 + 0.5 * h, y + 0.5 * h * k1)
            y = y + h * k2
        elif method == "euler":
            y = y + h * func(t0, y)
        elif method == "rk4":
            k1 = func(t0, y)
            k2 = func(t0 + 0.5 * h, y + 0.5 * h * k1)
            k3 = func(t0 + 0.5 * h, y + 0.5 * h * k2)
            k4 = func(t1, y + h * k3)
            y = y + h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        else:
            raise NotImplementedError(method)
        ys.append(y)
    import torch

    return torch.stack(ys)


torchdiffeq.odeint = _odeint
torchdiffeq.odeint_adjoint = _odeint
sys.modules["torchdiffeq"] = torchdiffeq

# ------------------------------------------------------------------ benchmark


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    train_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    sys.path.insert(0, REFERENCE)
    os.environ["INFERENCE_DATA_DIR"] = os.path.join(REFERENCE, "data")

    import torch
    import numpy as np
    import vihds.datasets as ref_datasets
    from vihds.config import Config
    from vihds.datasets import build_datasets
    from vihds.parameters import Parameters
    from vihds.training import Training
    from vihds.vae import build_model
    from vihds.run_xval import create_parser

    # numpy>=1.24 rejects ragged np.asarray; reimplement the reference's
    # merge_observations (vihds/datasets.py:136-145) with identical semantics.
    def merge_observations(times_list, observations_list):
        times_arr = list(times_list)
        obs_arr = list(observations_list)
        loc = int(np.argmin([len(t) for t in times_arr]))
        chosen_times = times_arr[loc]
        for i, (t, obs) in enumerate(zip(times_arr, obs_arr)):
            locs = [ref_datasets.find_nearest(t, ti) for ti in chosen_times]
            obs_arr[i] = obs[:, :, locs]
        return chosen_times, np.concatenate(obs_arr)

    ref_datasets.merge_observations = merge_observations

    args = create_parser(True).parse_args(
        [os.path.join(REFERENCE, "specs", "dr_constant_icml.yaml")]
    )
    args.seed = 0
    args.epochs = 1
    args.train_samples = train_samples
    args.test_samples = train_samples
    args.heldout = None
    settings = Config(args)
    settings.trainer = None
    data = build_datasets(args, settings)
    parameters = Parameters(settings.params)
    model = build_model(args, settings, data, parameters)
    training = Training(args, settings, data, parameters, model)

    batches = list(training.train_loader)
    batch = batches[0]
    print(
        "batch: obs %s K=%d solver=%s"
        % (tuple(batch.observations.shape), train_samples, settings.params.solver)
    )

    def one_step():
        batch_results, theta, q, p = model(batch, args.train_samples)
        elbo = training.cost(batch, batch_results, theta, q, p).elbo
        elbo.backward()
        training.optimizer.step()
        training.optimizer.zero_grad()
        return float(elbo)

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_steps):
        e = one_step()
    dt = time.perf_counter() - t0
    print("elbo=%.3f" % e)
    print(
        "reference CPU: %.4f steps/s  (%.3f s/step, %d steps, K=%d)"
        % (n_steps / dt, dt / n_steps, n_steps, train_samples)
    )


if __name__ == "__main__":
    main()
