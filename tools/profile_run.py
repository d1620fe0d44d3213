"""Manual profiling harness: time a short training run and capture an XLA
device trace (parity with the reference's cProfile harness,
reference tests/profile_run.py:41-52, upgraded to jax.profiler).

Usage: python tools/profile_run.py [spec] [epochs] [trace_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("INFERENCE_RESULTS_DIR", "/tmp/vihds_tpu_results")


def main():
    spec = sys.argv[1] if len(sys.argv) > 1 else "specs/dr_constant_one.yaml"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    trace_dir = sys.argv[3] if len(sys.argv) > 3 else None

    from vihds_tpu.run_xval import create_parser, run_on_split
    from vihds_tpu.config import Config

    args = create_parser(True).parse_args([spec])
    args.seed = 0
    args.epochs = epochs
    args.test_epoch = epochs
    args.plot_epoch = 0
    args.train_samples = 200
    args.test_samples = 200
    if trace_dir:
        args.profile_dir = trace_dir
    settings = Config(args)
    t0 = time.perf_counter()
    run_on_split(args, settings)
    dt = time.perf_counter() - t0
    print("total %.2fs for %d epochs (%.3f s/epoch incl. compile)" % (dt, epochs, dt / epochs))
    if trace_dir:
        print("trace written to %s (open with TensorBoard or xprof)" % trace_dir)


if __name__ == "__main__":
    main()
