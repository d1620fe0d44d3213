"""Train the UNMODIFIED reference for a few epochs on CPU and print its
train/valid IWAE-ELBO trajectory — the comparison band for BASELINE.md's
"converged to reference ELBO within MC error" gate.

Usage: python tools/train_reference.py [spec_basename] [epochs] [test_epoch]
"""

import os
import sys

# reuse the dependency shims (munch, fixed-grid torchdiffeq, ragged-merge fix)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_reference  # noqa: F401  (installs sys.modules shims on import)

REFERENCE = bench_reference.REFERENCE


def main():
    spec = sys.argv[1] if len(sys.argv) > 1 else "dr_constant_one.yaml"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    test_epoch = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    sys.path.insert(0, REFERENCE)
    os.environ["INFERENCE_DATA_DIR"] = os.path.join(REFERENCE, "data")

    import numpy as np
    import vihds.datasets as ref_datasets

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

    from vihds.config import Config
    from vihds.run_xval import create_parser, run_on_split

    args = create_parser(True).parse_args([os.path.join(REFERENCE, "specs", spec)])
    args.seed = 0
    args.epochs = epochs
    args.test_epoch = test_epoch
    args.plot_epoch = 0
    args.train_samples = 200
    args.test_samples = 1000
    settings = Config(args)
    settings.trainer = None
    run_on_split(args, settings)


if __name__ == "__main__":
    main()
