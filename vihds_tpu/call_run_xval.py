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
    if len(xval_merge.elbo) > 0 and settings.trainer is not None:
        # settings.trainer is None on non-main processes of a --distributed
        # launch: they train in lockstep but write no artifacts.
        xval_merge.finalize()
        xval_merge.save()
        xval_merge.make_writer()
        xval_merge.make_images()
        xval_merge.close_writer()
        xval_merge.mark_completed(args.experiment)
        print("Completed")
    elif len(xval_merge.elbo) == 0:
        print("No results in xval. Exiting...")


def main(argv=None):
    parser = create_parser(False)
    args = parser.parse_args(argv)

    from vihds_tpu.parallel import multihost

    process_count, process_index = multihost.initialize_from_args(args)
    if process_count > 1 and getattr(args, "vmap_folds", False):
        # the vmapped fold driver builds its own fold mesh; under a
        # multi-process launch every process runs the sequential driver on
        # the global mesh instead (same decision on all processes: lockstep)
        print("--vmap_folds is single-process; using the sequential driver")
        args.vmap_folds = False
    from vihds_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    settings = Config(args)
    settings.trainer = Trainer(args, add_timestamp=True) if process_index == 0 else None
    execute(args, settings)


if __name__ == "__main__":
    main()
