"""Determinism and robustness: same-seed runs are bit-identical; ragged
(NaN-aborted) folds survive the merge round-trip; TruncatedNormal and
Kumaraswamy sites train end-to-end."""

import numpy as np
import yaml

from tests.conftest import make_args, spec
from vihds_tpu.config import Config
from vihds_tpu.run_xval import run_on_split


def _run(tmp_path, monkeypatch, seed=0):
    monkeypatch.setenv("INFERENCE_RESULTS_DIR", str(tmp_path))
    args = make_args(spec("dr_constant_one.yaml"), epochs=2, test_epoch=2)
    args.seed = seed
    settings = Config(args)
    settings.trainer = None
    data, results = run_on_split(args, settings)
    return results


def test_same_seed_bit_identical(tmp_path, monkeypatch):
    r1 = _run(tmp_path, monkeypatch, seed=0)
    r2 = _run(tmp_path, monkeypatch, seed=0)
    np.testing.assert_array_equal(r1.elbo, r2.elbo)
    np.testing.assert_array_equal(r1.iw_predict_mu, r2.iw_predict_mu)
    r3 = _run(tmp_path, monkeypatch, seed=1)
    assert not np.array_equal(r1.elbo, r3.elbo)


def test_ragged_fold_merge_roundtrip(tmp_path):
    """Folds aborted early (NaN) have shorter ELBO trajectories; the merge +
    save + load cycle must survive them."""
    from vihds_tpu.xval import XvalMerge
    from vihds_tpu.config import Trainer

    args = make_args(spec("dr_constant_one.yaml"))
    args.experiment = "ragged"

    class FakeResults:
        def __init__(self, n_evals, n, T):
            rng = np.random.RandomState(n_evals)
            self.q_names = ["r.mu", "r.prec"]
            self.q_values = np.array([rng.rand(n), 1 + rng.rand(n)], dtype=object)
            self.species_names = ["OD", "RFP", "YFP", "CFP"]
            self.elbo = float(n_evals)
            self.elbo_list = list(range(n_evals))  # ragged across folds
            self.theta = rng.rand(2, n, 3)
            self.iw_predict_mu = rng.rand(n, 4, T)
            self.iw_predict_std = rng.rand(n, 4, T)
            self.iw_states = rng.rand(n, 8, T)

    class FakeSubset:
        def __init__(self, ds, idx):
            self.dataset = ds
            self.indices = idx

        def batch(self):
            return self.dataset.select(self.indices)

    from vihds_tpu.data.datasets import build_datasets

    settings = Config(args)
    data = build_datasets(args, settings)
    import os

    os.environ["INFERENCE_RESULTS_DIR"] = str(tmp_path)
    settings.trainer = Trainer(args, log_dir=str(tmp_path))
    xm = XvalMerge(args, settings)
    T = data.train.dataset.n_times

    class Pair:
        pass

    for split, n_evals in ((1, 3), (2, 1)):  # fold 2 aborted after 1 eval
        pair = Pair()
        pair.train = data.train
        pair.test = FakeSubset(data.train.dataset, np.arange((split - 1) * 5, split * 5))
        pair.n_test = 5
        xm.add(split, pair, FakeResults(n_evals, 5, T))
    xm.finalize()
    xm.save()
    xm2 = XvalMerge(args, settings)
    xm2.load(str(tmp_path))
    assert len(xm2.elbo_list[0]) == 3 and len(xm2.elbo_list[1]) == 1
    assert xm2.iw_predict_mu.shape[0] == 10


def test_truncnormal_kumaraswamy_train_end_to_end(tmp_path, monkeypatch):
    """A spec using TruncNormal and Kumaraswamy sites trains with finite
    ELBOs (both distributions are NotImplementedError stubs in the
    reference, vihds/distributions.py:442-446,498-507)."""
    base = yaml.safe_load(open(spec("dr_constant_one.yaml")))
    # extra latent sites exercising both families end-to-end (sampled,
    # scored, trained) without perturbing the ODE dynamics
    base["params"]["local"]["tn_site"] = {
        "distribution": "TruncNormal", "mu": 1.0, "sigma": 0.25, "a": 0.2, "b": 3.0,
    }
    base["params"]["global"]["one_sided"] = {
        "distribution": "TruncNormal", "mu": 0.0, "sigma": 1.0, "a": 0.0,
    }
    base["params"]["global"]["mix"] = {"distribution": "Kumaraswamy", "a": 2.0, "b": 2.0}
    p = tmp_path / "trunc_kuma.yaml"
    p.write_text(yaml.dump(base))

    monkeypatch.setenv("INFERENCE_RESULTS_DIR", str(tmp_path))
    args = make_args(str(p), epochs=2, test_epoch=2)
    settings = Config(args)
    settings.trainer = None
    data, results = run_on_split(args, settings)
    assert results is not None
    assert np.isfinite(np.asarray(results.elbo)).all()
    assert "tn_site.mu" in results.q_names and "mix.mu" in results.q_names
    # theta artifact order: local|gc|global|const; tn_site is the last local
    i = 4  # r,K,tlag,rc,tn_site
    tn = np.asarray(results.theta)[i]
    assert (tn >= 0.2 - 1e-4).all() and (tn <= 3.0 + 1e-4).all()


def test_folds_partition_without_seed():
    """With the CLI default --seed (None) every fold must still draw the SAME
    permutation, so the k validation chunks partition the dataset."""
    from vihds_tpu.data.datasets import build_datasets

    val_ids = []
    n = None
    for split in (1, 2, 3, 4):
        args = make_args(spec("dr_constant_icml.yaml"), folds=4, split=split)
        args.seed = None  # the CLI default
        settings = Config(args)
        pair = build_datasets(args, settings)
        val_ids.append(np.asarray(pair.test.indices))
        n = len(pair.test.dataset)
    merged = np.sort(np.concatenate(val_ids))
    np.testing.assert_array_equal(merged, np.arange(n))


def test_fold1_abort_merge_metadata_and_boxing(tmp_path):
    """A fold-1 NaN abort (no add() for split 1) must not lose the merge
    metadata, and equal-shape folds must merge as one object PER FOLD (not a
    fully element-boxed object ndarray)."""
    from vihds_tpu.config import Trainer
    from vihds_tpu.data.datasets import build_datasets
    from vihds_tpu.xval import XvalMerge
    import os

    args = make_args(spec("dr_constant_one.yaml"))
    args.experiment = "fold1_abort"
    settings = Config(args)
    data = build_datasets(args, settings)
    os.environ["INFERENCE_RESULTS_DIR"] = str(tmp_path)
    settings.trainer = Trainer(args, log_dir=str(tmp_path))
    xm = XvalMerge(args, settings)
    T = data.train.dataset.n_times

    class FakeResults:
        def __init__(self, n, T):
            rng = np.random.RandomState(0)
            self.q_names = ["r.mu", "r.prec"]
            self.q_values = np.array([rng.rand(n), 1 + rng.rand(n)], dtype=object)
            self.species_names = ["OD", "RFP", "YFP", "CFP"]
            self.elbo = 1.0
            self.elbo_list = [1.0, 2.0]  # equal length across folds
            self.theta = rng.rand(2, n, 3)
            self.iw_predict_mu = rng.rand(n, 4, T)
            self.iw_predict_std = rng.rand(n, 4, T)
            self.iw_states = rng.rand(n, 8, T)

    class FakeSubset:
        def __init__(self, ds, idx):
            self.dataset = ds
            self.indices = idx

        def batch(self):
            return self.dataset.select(self.indices)

    class Pair:
        pass

    for split in (2, 3):  # fold 1 hit the NaN abort; add() never ran for it
        pair = Pair()
        pair.train = data.train
        pair.test = FakeSubset(data.train.dataset, np.arange((split - 2) * 5, (split - 1) * 5))
        pair.n_test = 5
        xm.add(split, pair, FakeResults(5, T))
    assert xm.species_names is not None and xm.times is not None
    xm.finalize()
    xm.save()
    theta = np.load(os.path.join(settings.trainer.tb_log_dir, "xval_theta.npy"), allow_pickle=True)
    assert theta.shape == (2,) and theta[0].shape == (2, 5, 3)
    assert theta[0].dtype == np.float64  # payload stays a real float array
    elbos = np.load(os.path.join(settings.trainer.tb_log_dir, "xval_elbo_list.npy"), allow_pickle=True)
    assert elbos.shape == (2,) and list(elbos[0]) == [1.0, 2.0]
    xm2 = XvalMerge(args, settings)
    xm2.load(settings.trainer.tb_log_dir)
    assert list(xm2.species_names) == ["OD", "RFP", "YFP", "CFP"]


def test_deferred_nan_abort_semantics(tmp_path, monkeypatch, capsys):
    """The pipelined NaN check (training.py deferred-abort loop) must: fire
    exactly once, lag exactly ONE chunk (the chunk after the NaN one still
    dispatches before the loop exits), and still return the pre-NaN best-val
    results (the NaN chunk's boundary eval never updates the cache)."""
    import jax.numpy as jnp

    from vihds_tpu.training import Training

    monkeypatch.setenv("INFERENCE_RESULTS_DIR", str(tmp_path))
    args = make_args(spec("dr_constant_one.yaml"), epochs=8, test_epoch=2)
    args.seed = 0
    settings = Config(args)
    settings.trainer = None

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
    # chunk 3 (epochs 5-6) dispatches before chunk 2's NaN is seen; chunk 4 never runs
    assert calls["n"] == 3
    # the epoch-2 eval (pre-NaN) survives as the best-val result
    assert results is not None
    assert np.isfinite(np.asarray(results.elbo)).all()
    assert len(results.elbo_list) < 4  # aborted: fewer evals than the full run's


def test_pipelined_eval_matches_sync(tmp_path, monkeypatch):
    """The eval pipeline (dispatch at the boundary, complete after the next
    chunk's dispatch) must be BIT-identical to completing each eval at its
    own boundary: the pending handle pins the dispatched device outputs, so
    best-val selection, trajectories, and cached arrays cannot depend on
    when the fetches run (VERDICT r3 #1 regression gate)."""
    def run(sync):
        if sync:
            monkeypatch.setenv("VIHDS_SYNC_EVAL", "1")
        else:
            monkeypatch.delenv("VIHDS_SYNC_EVAL", raising=False)
        monkeypatch.setenv("INFERENCE_RESULTS_DIR", str(tmp_path))
        args = make_args(spec("dr_constant_one.yaml"), epochs=8, test_epoch=2)
        args.seed = 0
        settings = Config(args)
        settings.trainer = None
        _, results = run_on_split(args, settings)
        return results

    piped = run(sync=False)
    synced = run(sync=True)
    np.testing.assert_array_equal(piped.elbo, synced.elbo)
    np.testing.assert_array_equal(piped.elbo_list, synced.elbo_list)
    np.testing.assert_array_equal(piped.iw_predict_mu, synced.iw_predict_mu)
    np.testing.assert_array_equal(piped.iw_predict_std, synced.iw_predict_std)
    np.testing.assert_array_equal(piped.theta, synced.theta)
    for a, b in zip(piped.q_values, synced.q_values):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
