"""Offline regeneration of xval report figures from saved artifacts
(parity with the reference's manual harness, reference tests/xval_plotting.py).

Usage: python tools/xval_plotting.py <results_dir> <spec.yaml>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    location, spec = sys.argv[1], sys.argv[2]

    from vihds_tpu.config import Config, Trainer
    from vihds_tpu.run_xval import create_parser
    from vihds_tpu.xval import XvalMerge

    args = create_parser(True).parse_args([spec])
    args.experiment = os.path.basename(location.rstrip("/"))
    args.seed = 0
    settings = Config(args)
    settings.trainer = Trainer(args, log_dir=location)
    xm = XvalMerge(args, settings)
    xm.load(location)
    xm.make_writer(location)
    xm.make_images()
    xm.close_writer()
    print("figures regenerated in %s" % location)


if __name__ == "__main__":
    main()
