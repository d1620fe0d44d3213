"""Single-split CLI: train one train/validation split of a spec.

Usage parity with the reference entry point
(``python -m vihds_tpu.run_xval specs/dr_constant_one.yaml --experiment X
--epochs N ...``; reference vihds/run_xval.py).
"""

import argparse

from vihds_tpu.config import Config, Trainer
from vihds_tpu.data.datasets import build_datasets
from vihds_tpu.prob import ParamProgram, parse_parameters
from vihds_tpu.training import Training
from vihds_tpu.vae import VAE
from vihds_tpu.xval import XvalMerge


def create_parser(with_split: bool):
    """CLI flags (parity: vihds/run_xval.py:17-57)."""
    parser = argparse.ArgumentParser(description="VI-HDS-TPU")
    parser.add_argument("yaml", type=str, help="Name of yaml spec file")
    parser.add_argument(
        "--experiment",
        type=str,
        default="unnamed",
        help="Name for experiment, also location of tensorboard and saved results",
    )
    parser.add_argument("--seed", type=int, default=None, help="Random seed (default: 0)")
    parser.add_argument("--epochs", type=int, default=1000, help="Training epochs")
    parser.add_argument("--test_epoch", type=int, default=20, help="Frequency of calling test")
    parser.add_argument("--plot_epoch", type=int, default=100, help="Frequency of plotting figures")
    parser.add_argument(
        "--train_samples",
        type=int,
        default=200,
        help="Number of samples from q, per datapoint, during training",
    )
    parser.add_argument(
        "--test_samples",
        type=int,
        default=1000,
        help="Number of samples from q, per datapoint, during testing",
    )
    parser.add_argument("--dreg", action="store_true", default=False, help="Use DReG estimator")
    parser.add_argument(
        "--precision_hidden_layers",
        type=int,
        default=None,
        help="Number of hidden layers to use in neural precisions",
    )
    parser.add_argument(
        "--grad_clip_norm",
        type=float,
        default=None,
        help="Global-norm gradient clipping (params.grad_clip_norm override); "
        "the stabiliser for neural-precision blowups",
    )
    parser.add_argument(
        "--q_global_init",
        type=str,
        default=None,
        choices=["prior", "unit"],
        help="Override the GLOBAL q-site precision init: 'unit' = log-prec 0 "
        "(the reference's Q_Global convention; measured better optima), "
        "'prior' = start q at the prior precision.  Default: the spec / "
        "config.DEFAULT_PARAMS value.",
    )
    parser.add_argument(
        "--verbose", action="store_true", default=False, help="Print more information"
    )
    parser.add_argument(
        "--gpu", type=int, default=None, help="Ignored (accelerator selection is JAX-level)"
    )
    parser.add_argument(
        "--checkpoint_epoch",
        type=int,
        default=0,
        help="Save a full training checkpoint (params+optimizer+RNG) every N epochs (0 = off)",
    )
    parser.add_argument(
        "--resume_from",
        type=str,
        default=None,
        help="Path to a checkpoints directory to resume training from",
    )
    parser.add_argument(
        "--profile_dir",
        type=str,
        default=None,
        help="Capture a jax.profiler device trace of one post-compile epoch into this directory",
    )
    parser.add_argument(
        "--distributed",
        type=str,
        default=None,
        help="Multi-process (pod-slice) launch: 'auto' discovers the "
        "coordinator from the TPU pod environment (run the same command on "
        "every host), or 'HOST:PORT,NPROC,PID' explicitly for CPU/GPU "
        "clusters.  Combine with --mesh auto (or --mesh_data/--mesh_sample "
        "over the GLOBAL device count); process 0 writes all artifacts. "
        "Env fallback: VIHDS_DISTRIBUTED.",
    )
    parser.add_argument(
        "--mesh",
        type=str,
        default="off",
        choices=["off", "auto"],
        help="'auto': shard training and evaluation over ALL visible devices "
        "on a (data, sample) mesh (IWAE samples on the larger axis). "
        "The reference is single-device only (vihds/config.py:161-178).",
    )
    parser.add_argument(
        "--mesh_data",
        type=int,
        default=None,
        help="Devices on the 'data' (batch) mesh axis; combine with --mesh_sample",
    )
    parser.add_argument(
        "--mesh_sample",
        type=int,
        default=None,
        help="Devices on the 'sample' (IWAE) mesh axis; combine with --mesh_data",
    )
    if with_split:
        group = parser.add_mutually_exclusive_group()
        group.add_argument("--heldout", type=str, help="name of held-out device, e.g. R33S32_Y81C76")
        group.add_argument(
            "--split", type=int, default=1, help="Specify split in 1:folds for cross-validation"
        )
        group.add_argument(
            "--figures", action="store_true", default=False, help="Create figures (default: False)"
        )
    parser.add_argument("--folds", type=int, default=4, help="Cross-validation folds")
    parser.add_argument(
        "--vmap_folds",
        action="store_true",
        default=False,
        help="(call_run_xval) train ALL folds as one batched compiled program "
        "(jax.vmap over a fold axis) instead of serial per-fold runs — "
        "collapses k folds' worth of device dispatches/transfers into one "
        "stream; falls back to the sequential driver for configurations the "
        "batched program cannot express",
    )
    parser.add_argument(
        "--rerun_outliers",
        action="store_true",
        default=False,
        help="(call_run_xval --vmap_folds) after the batched run, retrain any "
        "fold whose best-val ELBO lands > --outlier_nats below the sibling "
        "median (a slow-basin optimum) through the sequential driver under a "
        "fresh training RNG, keeping the better result",
    )
    parser.add_argument(
        "--outlier_nats",
        type=float,
        default=50.0,
        help="Slow-basin fold threshold: nats below the sibling-fold median "
        "best-val ELBO at which a fold is flagged (and rerun under "
        "--rerun_outliers)",
    )
    return parser


def make_mesh_from_args(args):
    """Build the (data, sample) device mesh requested on the CLI, or None.

    --mesh_data/--mesh_sample pick an explicit factorisation; --mesh auto
    puts every visible device on the 'sample' axis (IWAE samples are the
    larger parallel axis at the reference's K=200/1000 regimes).
    """
    n_data = getattr(args, "mesh_data", None)
    n_sample = getattr(args, "mesh_sample", None)
    if n_data or n_sample:
        from vihds_tpu import parallel

        return parallel.make_mesh(n_data=n_data, n_sample=n_sample)
    if getattr(args, "mesh", "off") == "auto":
        import jax

        from vihds_tpu import parallel

        if len(jax.devices()) > 1:
            return parallel.make_mesh()
    return None


def run_on_split(args, settings, split=None):
    """Run one train-test split (parity: vihds/run_xval.py:60-72)."""
    if getattr(args, "heldout", None):
        print("Heldout device is %s" % args.heldout)
    else:
        args.heldout = None
        if split is not None:
            args.split = split
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    mesh = make_mesh_from_args(args)
    if mesh is not None:
        print("Device mesh: data=%d x sample=%d" % (mesh.shape["data"], mesh.shape["sample"]))
    training = Training(args, settings, data, program, model, mesh=mesh)
    return data, training.run()


def main(argv=None):
    parser = create_parser(True)
    args = parser.parse_args(argv)

    # Multi-process first (jax.distributed must precede any backend use),
    # then the compile cache.
    from vihds_tpu.parallel import multihost

    _, process_index = multihost.initialize_from_args(args)
    from vihds_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    settings = Config(args)
    # Artifacts (results dir, TensorBoard, xval set, figures) are written by
    # process 0 only; the other processes train in lockstep without a trainer.
    settings.trainer = Trainer(args, add_timestamp=True) if process_index == 0 else None
    data_pair, val_results = run_on_split(args, settings)

    if (val_results is not None) and settings.trainer is not None:
        xval_merge = XvalMerge(args, settings)
        xval_merge.add(1, data_pair, val_results)
        xval_merge.finalize()
        xval_merge.save()
        xval_merge.mark_completed(args.experiment)
        if args.figures:
            xval_merge.make_writer()
            xval_merge.make_images()
            xval_merge.close_writer()


if __name__ == "__main__":
    main()
