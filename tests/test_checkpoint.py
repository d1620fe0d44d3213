"""Checkpoint/resume: save params+opt+RNG, restore bit-exact, resume a run."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tests.conftest import make_args, spec
from vihds_tpu import checkpoint as ckpt
from vihds_tpu.config import Config
from vihds_tpu.data.datasets import build_datasets
from vihds_tpu.prob import ParamProgram, parse_parameters
from vihds_tpu.vae import VAE


def test_save_restore_roundtrip(tmp_path):
    args = make_args(spec("dr_constant_one.yaml"))
    settings = Config(args)
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    params = model.init_params(jax.random.PRNGKey(0))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(42)

    d = str(tmp_path / "ckpts")
    ckpt.save(d, 3, params, opt_state, key, extra={"epoch": 3})
    assert ckpt.latest_epoch(d) == 3

    template = {"params": params, "opt_state": opt_state, "key": np.asarray(key), "extra": {"epoch": 0}}
    step, state = ckpt.restore(d, template=template)
    assert step == 3
    assert int(state["extra"]["epoch"]) == 3
    np.testing.assert_array_equal(np.asarray(state["key"]), np.asarray(key))
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(state["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(opt_state), jax.tree_util.tree_leaves(state["opt_state"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_empty_dir(tmp_path):
    step, state = ckpt.restore(str(tmp_path / "nothing_here"))
    assert step is None and state is None


def test_training_resume_continues(tmp_path, monkeypatch):
    """Run 2 epochs with checkpointing, resume, and confirm training continues
    from the checkpointed epoch."""
    monkeypatch.setenv("INFERENCE_RESULTS_DIR", str(tmp_path))
    from vihds_tpu.config import Trainer
    from vihds_tpu.run_xval import run_on_split

    args = make_args(spec("dr_constant_one.yaml"), epochs=2, test_epoch=2)
    args.checkpoint_epoch = 2
    args.experiment = "ckpt_run"
    settings = Config(args)
    settings.trainer = Trainer(args, add_timestamp=False)
    run_on_split(args, settings)
    ckpt_dir = os.path.join(settings.trainer.tb_log_dir, "checkpoints_1_of_4")
    assert ckpt.latest_epoch(ckpt_dir) == 2

    # Resume for 2 more epochs
    args2 = make_args(spec("dr_constant_one.yaml"), epochs=4, test_epoch=2)
    args2.resume_from = ckpt_dir
    args2.checkpoint_epoch = 4
    args2.experiment = "ckpt_run2"
    settings2 = Config(args2)
    settings2.trainer = Trainer(args2, add_timestamp=False)
    data, results = run_on_split(args2, settings2)
    assert results is not None
    ckpt_dir2 = os.path.join(settings2.trainer.tb_log_dir, "checkpoints_1_of_4")
    assert ckpt.latest_epoch(ckpt_dir2) == 4


def test_resume_is_trajectory_faithful(tmp_path, monkeypatch):
    """4 epochs straight vs 2 + checkpoint + resume + 2 must produce the SAME
    validation-ELBO trajectory: the batch-permutation stream is derived from
    (seed, epoch), so a resumed run replays exactly the batch orders the
    uninterrupted run would have seen."""
    monkeypatch.setenv("INFERENCE_RESULTS_DIR", str(tmp_path))
    from vihds_tpu.config import Trainer
    from vihds_tpu.run_xval import run_on_split

    def run(experiment, epochs, resume_from=None, ckpt_epoch=0):
        a = make_args(spec("dr_constant_one.yaml"), epochs=epochs)
        a.experiment = experiment
        a.checkpoint_epoch = ckpt_epoch
        a.resume_from = resume_from
        s = Config(a)
        s.trainer = Trainer(a, add_timestamp=False)
        _, res = run_on_split(a, s)
        return s, res

    s1, res_straight = run("straight", 4)
    s2, res_half = run("half", 2, ckpt_epoch=2)
    ckpt_dir = os.path.join(s2.trainer.tb_log_dir, "checkpoints_1_of_4")
    _, res_resumed = run("resumed", 4, resume_from=ckpt_dir)

    assert len(res_straight.elbo_list) == 2  # evals at epochs 2 and 4
    np.testing.assert_allclose(res_half.elbo_list, res_straight.elbo_list[:1], rtol=1e-6)
    np.testing.assert_allclose(res_resumed.elbo_list, res_straight.elbo_list[1:], rtol=1e-6)


def test_checkpoint_never_saves_nan_state(tmp_path, monkeypatch, capsys):
    """A checkpoint boundary whose just-finished chunk went NaN must NOT
    persist the NaN params/opt_state (a resumed run would restore them):
    the ckpt branch checks that chunk SYNCHRONOUSLY even though the abort
    pipeline otherwise lags one chunk (round-3 advisor finding)."""
    import jax.numpy as jnp

    from vihds_tpu.config import Trainer
    from vihds_tpu.run_xval import run_on_split
    from vihds_tpu.training import Training

    monkeypatch.setenv("INFERENCE_RESULTS_DIR", str(tmp_path))
    args = make_args(spec("dr_constant_one.yaml"), epochs=8, test_epoch=2)
    args.checkpoint_epoch = 2
    args.experiment = "nan_ckpt"
    args.seed = 0
    settings = Config(args)
    settings.trainer = Trainer(args, add_timestamp=False)

    calls = {"n": 0}
    orig_build = Training._build_steps

    def build_then_wrap(self):
        orig_build(self)
        inner = self._train_epoch

        def nan_on_second(params, opt_state, key, stacks, data, times):
            calls["n"] += 1
            params, opt_state, key, elbos = inner(params, opt_state, key, stacks, data, times)
            if calls["n"] == 2:  # epochs 3-4: poison this chunk's ELBOs
                elbos = jnp.full_like(elbos, jnp.nan)
            return params, opt_state, key, elbos

        self._train_epoch = nan_on_second

    monkeypatch.setattr(Training, "_build_steps", build_then_wrap)
    data, results = run_on_split(args, settings)

    out = capsys.readouterr().out
    assert out.count("Cannot proceed with ELBO = nan. Exiting.") == 1
    ckpt_dir = os.path.join(settings.trainer.tb_log_dir, "checkpoints_1_of_4")
    # epoch-2 checkpoint exists; the epoch-4 boundary (NaN chunk) refused
    assert ckpt.latest_epoch(ckpt_dir) == 2
    step, state = ckpt.restore(ckpt_dir)
    assert step == 2
    for leaf in jax.tree_util.tree_leaves(state["params"]):
        assert np.isfinite(np.asarray(leaf)).all()
    # the NaN chunk's boundary eval is discarded: no NaN validation entries
    assert results is not None
    assert np.isfinite(np.asarray(results.elbo_list)).all()


def test_vmap_folds_resume_is_trajectory_faithful(tmp_path, monkeypatch):
    """Vmapped-driver mirror of test_resume_is_trajectory_faithful: 4 epochs
    straight vs 2 + checkpoint + resume + 2 must produce the SAME per-fold
    validation-ELBO trajectories — the batched fold state (params, opt, RNG,
    NaN-freeze mask) round-trips through one stacked orbax checkpoint and
    epoch_perm replays the exact batch orders (VERDICT r3 #3)."""
    monkeypatch.setenv("INFERENCE_RESULTS_DIR", str(tmp_path))
    from vihds_tpu import xfold
    from vihds_tpu.config import Config, Trainer

    def run(experiment, epochs, resume_from=None, ckpt_epoch=0):
        a = make_args(spec("dr_constant_one.yaml"), epochs=epochs, folds=2)
        a.experiment = experiment
        a.checkpoint_epoch = ckpt_epoch
        a.resume_from = resume_from
        s = Config(a)
        s.trainer = Trainer(a, add_timestamp=False)
        out = xfold.run_all_folds(a, s)
        assert out is not None, "vmapped driver must not fall back"
        return s, [res.elbo_list for _, _, res in out]

    s1, straight = run("vstraight", 4)
    s2, half = run("vhalf", 2, ckpt_epoch=2)
    ckpt_dir = os.path.join(s2.trainer.tb_log_dir, "checkpoints_vmap")
    assert ckpt.latest_epoch(ckpt_dir) == 2
    _, resumed = run("vresumed", 4, resume_from=ckpt_dir)

    for f in range(2):
        assert len(straight[f]) == 2  # evals at epochs 2 and 4
        np.testing.assert_allclose(half[f], straight[f][:1], rtol=1e-6)
        np.testing.assert_allclose(resumed[f], straight[f][1:], rtol=1e-6)
