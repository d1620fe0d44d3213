"""k-fold cross-validation driver: run every split, merge, render figures.

Parity: reference vihds/call_run_xval.py.
"""

from vihds_tpu.config import Config, Trainer
from vihds_tpu.run_xval import create_parser, run_on_split
from vihds_tpu.xval import XvalMerge


def execute(args, settings):
    xval_merge = XvalMerge(args, settings)
    fold_results = None
    if getattr(args, "vmap_folds", False):
        # all folds as ONE batched compiled program (jax.vmap over the fold
        # axis); returns None — with a printed reason — when this
        # configuration needs the sequential driver
        from vihds_tpu import xfold

        fold_results = xfold.run_all_folds(args, settings)
    if fold_results is not None:
        for split_idx, data_pair, val_results in fold_results:
            if val_results is not None:
                xval_merge.add(split_idx, data_pair, val_results)
    else:
        for split_idx in range(1, args.folds + 1):
            print("================================================================")
            print("    FOLD %d of %d" % (split_idx, args.folds))
            print("---------------------------")
            data_pair, val_results = run_on_split(args, settings, split=split_idx)
            if val_results is not None:
                xval_merge.add(split_idx, data_pair, val_results)
    print("================================================================")
    if len(xval_merge.elbo) > 0:
        xval_merge.finalize()
        xval_merge.save()
        xval_merge.make_writer()
        xval_merge.make_images()
        xval_merge.close_writer()
        xval_merge.mark_completed(args.experiment)
        print("Completed")
    else:
        print("No results in xval. Exiting...")


def main(argv=None):
    from vihds_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    parser = create_parser(False)
    args = parser.parse_args(argv)
    settings = Config(args)
    settings.trainer = Trainer(args, add_timestamp=True)
    execute(args, settings)


if __name__ == "__main__":
    main()
