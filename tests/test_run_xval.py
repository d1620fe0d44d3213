"""End-to-end integration via subprocess, reference-style
(model: reference tests/test_run_xval.py — run the CLI at a tiny regime,
assert finite iwae-elbo lines and the results-dir layout)."""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import spec

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Force-CPU bootstrap for subprocesses (the TPU plugin overrides JAX_PLATFORMS)
_SITECUSTOMIZE = "import jax; jax.config.update('jax_platforms', 'cpu')"


def run_cli(module, args, tmp_path, epochs=4, test_epoch=2, env_extra=None):
    boot = tmp_path / "boot"
    boot.mkdir(exist_ok=True)
    (boot / "sitecustomize.py").write_text(_SITECUSTOMIZE)
    env = dict(os.environ)
    env["INFERENCE_RESULTS_DIR"] = str(tmp_path)
    env["PYTHONPATH"] = "%s%s%s" % (boot, os.pathsep, REPO)
    env["JAX_PLATFORMS"] = "cpu"
    if env_extra:
        env.update(env_extra)
    cmd = [
        sys.executable,
        "-m",
        module,
        *args,
        "--seed=0",
        "--epochs=%d" % epochs,
        "--test_epoch=%d" % test_epoch,
        "--train_samples=10",
        "--test_samples=10",
        "--plot_epoch=0",
    ]
    return subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO, timeout=900)


def scrape_elbos(stdout):
    """Pull every iwae-elbo value printed during evaluation."""
    return [float(m) for m in re.findall(r"iwae-elbo = (\S+?)[,)]", stdout)]


def assert_split_artifacts(tmp_path, experiment):
    (exp_dir,) = [d for d in os.listdir(tmp_path) if d.startswith(experiment)]
    contents = os.listdir(os.path.join(tmp_path, exp_dir))
    assert "completed.txt" in contents
    for base in ("xval_elbo", "xval_q_values", "xval_theta", "xval_iw_predict_mu", "xval_times"):
        assert base + ".npy" in contents, "missing %s.npy" % base
    assert any(c.startswith("train_") for c in contents)
    assert any(c.startswith("valid_") for c in contents)
    return os.path.join(tmp_path, exp_dir)


@pytest.mark.slow
@pytest.mark.parametrize(
    "spec_name",
    ["auto_constant.yaml", "dr_constant_one.yaml", "dr_blackbox_icml.yaml"],
)
def test_run_xval_end_to_end(spec_name, tmp_path):
    exp = "e2e_" + spec_name.split(".")[0]
    r = run_cli("vihds_tpu.run_xval", [spec(spec_name), "--experiment=" + exp], tmp_path)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    elbos = scrape_elbos(r.stdout)
    # 2 eval epochs x (train + valid) = 4 finite iwae-elbo lines
    assert len(elbos) == 4, r.stdout[-2000:]
    assert np.isfinite(elbos).all()
    assert_split_artifacts(tmp_path, exp)


@pytest.mark.slow
def test_call_run_xval_two_folds(tmp_path):
    """2-fold driver + merged artifacts + figures
    (model: reference tests/test_run_xval.py test_folds2)."""
    r = run_cli(
        "vihds_tpu.call_run_xval",
        [spec("dr_constant_one.yaml"), "--experiment=folds2", "--folds=2"],
        tmp_path,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    elbos = scrape_elbos(r.stdout)
    assert len(elbos) == 8  # 2 folds x 2 eval epochs x (train+valid)
    assert np.isfinite(elbos).all()
    loc = assert_split_artifacts(tmp_path, "folds2")
    contents = os.listdir(loc)
    for fig in ("xval_fit", "xval_species", "xval_treatments"):
        assert fig + ".png" in contents, "missing %s.png" % fig
        assert fig + ".pdf" in contents
    # per-device figures
    assert any(c.startswith("xval_summary_") and c.endswith(".png") for c in contents)
    assert any(c.startswith("xval_individual_") and c.endswith(".png") for c in contents)
    # both folds' validation sets cover all 48 series exactly once
    ids = np.load(os.path.join(loc, "xval_ids.npy"), allow_pickle=True)
    assert sorted(ids.tolist()) == list(range(48))


@pytest.mark.slow
def test_run_xval_mesh_cli_matches_single_device(tmp_path):
    """--mesh_data/--mesh_sample shard the CLI train+eval path over an
    8-virtual-device (data, sample) mesh; results must match the
    single-device run (GSPMD reduction reordering only)."""
    env8 = {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    r1 = run_cli(
        "vihds_tpu.run_xval",
        [spec("dr_constant_one.yaml"), "--experiment=nomesh"],
        tmp_path,
        env_extra=env8,
    )
    assert r1.returncode == 0, r1.stdout[-2000:] + r1.stderr[-2000:]
    r2 = run_cli(
        "vihds_tpu.run_xval",
        [spec("dr_constant_one.yaml"), "--experiment=mesh", "--mesh_data=2", "--mesh_sample=4"],
        tmp_path,
        env_extra=env8,
    )
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert "Device mesh: data=2 x sample=4" in r2.stdout
    e1, e2 = scrape_elbos(r1.stdout), scrape_elbos(r2.stdout)
    assert len(e1) == len(e2) == 4
    np.testing.assert_allclose(e1, e2, rtol=1e-2)
    loc1 = assert_split_artifacts(tmp_path, "nomesh")
    loc2 = assert_split_artifacts(tmp_path, "mesh_")
    a1 = np.load(os.path.join(loc1, "xval_elbo.npy"))
    a2 = np.load(os.path.join(loc2, "xval_elbo.npy"))
    np.testing.assert_allclose(a1, a2, rtol=1e-2)


@pytest.mark.slow
def test_run_xval_unknown_model_message(tmp_path):
    # (dr_growthrate itself is buildable here since the round-2
    # reconstruction — use a genuinely unknown name)
    text = open(spec("dr_constant_one.yaml")).read().replace(
        "model: dr_constant", "model: no_such_model"
    )
    bad = os.path.join(tmp_path, "bad_model.yaml")
    with open(bad, "w") as f:
        f.write(text)
    r = run_cli("vihds_tpu.run_xval", [bad, "--experiment=bad"], tmp_path)
    assert r.returncode != 0
    assert "Unknown model" in r.stderr and "no_such_model" in r.stderr


@pytest.mark.slow
def test_vmap_folds_matches_sequential(tmp_path):
    """--vmap_folds trains every fold inside ONE batched compiled program
    (jax.vmap over the fold axis); per-fold ELBO trajectories and merged
    artifacts must match the sequential driver up to float32 reassociation."""
    r_seq = run_cli(
        "vihds_tpu.call_run_xval",
        [spec("dr_constant_one.yaml"), "--experiment=seqf", "--folds=2"],
        tmp_path,
    )
    assert r_seq.returncode == 0, r_seq.stdout[-2000:] + r_seq.stderr[-2000:]
    r_v = run_cli(
        "vihds_tpu.call_run_xval",
        [spec("dr_constant_one.yaml"), "--experiment=vmapf", "--folds=2", "--vmap_folds"],
        tmp_path,
    )
    assert r_v.returncode == 0, r_v.stdout[-2000:] + r_v.stderr[-2000:]
    assert "falling back to sequential" not in r_v.stdout

    loc_seq = assert_split_artifacts(tmp_path, "seqf")
    loc_v = assert_split_artifacts(tmp_path, "vmapf")
    el_seq = np.load(os.path.join(loc_seq, "xval_elbo_list.npy"), allow_pickle=True)
    el_v = np.load(os.path.join(loc_v, "xval_elbo_list.npy"), allow_pickle=True)
    for f in range(2):
        np.testing.assert_allclose(
            np.asarray(el_v[f], float), np.asarray(el_seq[f], float), rtol=1e-3
        )
    mu_seq = np.load(os.path.join(loc_seq, "xval_iw_predict_mu.npy"))
    mu_v = np.load(os.path.join(loc_v, "xval_iw_predict_mu.npy"))
    np.testing.assert_allclose(mu_v, mu_seq, atol=1e-4)
    ids_seq = np.load(os.path.join(loc_seq, "xval_ids.npy"), allow_pickle=True)
    ids_v = np.load(os.path.join(loc_v, "xval_ids.npy"), allow_pickle=True)
    np.testing.assert_array_equal(ids_v, ids_seq)


def test_vmap_folds_fallback_semantics(capsys, tmp_results):
    """run_all_folds falls back (returns None) exactly for the configurations
    the batched program cannot express: an explicit (data, sample) mesh
    factorisation, and fold layouts whose common eval chunk grid would change
    per-fold eval RNG streams vs the sequential driver."""
    from tests.conftest import make_args
    from vihds_tpu import xfold
    from vihds_tpu.config import Config

    # explicit --mesh_data/--mesh_sample: the sequential driver shards each
    # fold over that mesh; the fold-axis sharding cannot honour it
    args = make_args(spec("dr_constant_one.yaml"), folds=2)
    args.mesh_data = 2
    settings = Config(args)
    assert xfold.run_all_folds(args, settings) is None
    assert "explicit --mesh_data/--mesh_sample" in capsys.readouterr().out

    # unequal VALID eval chunk counts (48 series, 5 folds, n_batch=9: valid
    # sizes 10,10,10,9,9 -> ceil(n/9) chunk counts {2,1}); eval_split does
    # split(key, n_chunks), so padding to a common grid would change those
    # folds' eval u-draws
    args = make_args(spec("dr_constant_one.yaml"), folds=5)
    settings = Config(args)
    settings.params.n_batch = 9
    assert xfold.run_all_folds(args, settings) is None
    assert "eval chunk counts" in capsys.readouterr().out

    # --mesh auto with no device count > 1 dividing folds (11 is prime and
    # above the 8-device pool): sequential driver still uses every device
    # via its own (data, sample) mesh
    args = make_args(spec("dr_constant_one.yaml"), folds=11)
    args.mesh = "auto"
    settings = Config(args)
    assert xfold.run_all_folds(args, settings) is None
    assert "no device count > 1 divides folds=11" in capsys.readouterr().out


def test_vmap_folds_mesh_auto_single_device(capsys, tmp_results, monkeypatch):
    """--vmap_folds --mesh auto on a SINGLE-device host (the real one-chip
    TPU) must run the batched program unsharded — regression: the 'Fold
    mesh' banner dereferenced the None fold_mesh and crashed."""
    import jax

    from tests.conftest import make_args
    from vihds_tpu import xfold
    from vihds_tpu.config import Config

    one = jax.devices()[:1]
    monkeypatch.setattr(xfold.jax, "devices", lambda: one)
    seen = {}

    class StubRunner:
        def __init__(self, args, settings, fold_mesh=None):
            seen["fold_mesh"] = fold_mesh
            self.pairs = [None] * args.folds

        def run(self):
            return [None] * len(self.pairs)

    monkeypatch.setattr(xfold, "VmapXval", StubRunner)
    args = make_args(spec("dr_constant_one.yaml"), folds=2)
    args.mesh = "auto"
    settings = Config(args)
    out = xfold.run_all_folds(args, settings)
    assert out is not None and len(out) == 2
    assert seen["fold_mesh"] is None
    printed = capsys.readouterr().out
    assert "single device; running the batched program unsharded" in printed
    assert "Fold mesh:" not in printed


def test_vmap_folds_nan_freeze(capsys, tmp_results):
    """A fold whose fused train dispatch returns non-finite ELBOs is frozen
    (mirroring the sequential driver's per-fold NaN abort): later dispatches
    carry it as a dead slice, its eval merge/plot work is skipped, its
    results slot is None, and the surviving folds complete normally."""
    from tests.conftest import make_args
    from vihds_tpu import training as T
    from vihds_tpu.config import Config
    from vihds_tpu.xfold import VmapXval

    T._STEP_CACHE.clear()
    args = make_args(spec("dr_constant_one.yaml"), folds=2)
    settings = Config(args)
    settings.trainer = None
    runner = VmapXval(args, settings)
    orig = runner._train_v
    calls = dict(n=0)

    def poisoned(params_v, opt_v, keys_v, stacks_v, data_v, times, priors):
        p, o, k, e = orig(params_v, opt_v, keys_v, stacks_v, data_v, times, priors)
        calls["n"] += 1
        e = np.asarray(e).copy()
        if calls["n"] == 1:
            e[0] = np.nan  # fold 1 "diverges" on the first fused dispatch
        return p, o, k, e

    runner._train_v = poisoned
    results = runner.run()
    out = capsys.readouterr().out
    assert "Fold 1: ELBO = nan, freezing this fold." in out
    # the second boundary's dispatch still runs (fold 2 is alive) with
    # fold 1 riding as a dead slice
    assert calls["n"] == 2
    # fold 1 froze before its first eval: no cached results, no eval lines
    assert results[0] is None
    assert "Fold 1: no results in cache" in out
    assert "| fold 1 |" not in out
    # fold 2 is untouched: two eval boundaries, finite cached results
    assert out.count("| fold 2 |") == 2
    assert results[1] is not None and np.isfinite(results[1].elbo)


def test_vmap_folds_config_errors_not_swallowed(tmp_results):
    """A genuine config error raised while VmapXval builds datasets/model
    must surface as the error it is — not be misreported as a
    fall-back-to-sequential condition."""
    from tests.conftest import make_args
    from vihds_tpu import xfold
    from vihds_tpu.config import Config

    args = make_args(spec("dr_constant_one.yaml"), folds=2)
    settings = Config(args)
    settings.params.transfer_func = "no_such_activation"
    with pytest.raises(ValueError, match="transfer_func"):
        xfold.run_all_folds(args, settings)


def test_outlier_fold_detection_and_rerun(monkeypatch, capsys):
    """Slow-basin fold affordance (VERDICT r3 #5): folds landing far below
    the sibling median are flagged loudly; --rerun_outliers retrains exactly
    those folds sequentially (fresh training seed, same data split) and
    keeps the better result, re-dumping the winner's cache."""
    from types import SimpleNamespace

    from tests.conftest import make_args
    from vihds_tpu import xfold

    assert xfold.detect_outlier_folds([1000.0, 1005.0, 995.0, 870.0], 50) == [3]
    assert xfold.detect_outlier_folds([1000.0, 1005.0, 995.0, None], 50) == [3]
    assert xfold.detect_outlier_folds([1000.0, 1005.0, 995.0, 990.0], 50) == []
    assert xfold.detect_outlier_folds([float("nan"), 1000.0], 50) == [0]

    class FakeRes:
        def __init__(self, elbo):
            self.elbo = elbo
            self.dumped = []

        def dump(self, d):
            self.dumped.append(d)

    runner = SimpleNamespace(cache_dirs=["c0", "c1"])
    settings = SimpleNamespace(seed=0)

    # without the flag: diagnosis prints, nothing reruns
    args = make_args(spec("dr_constant_one.yaml"), folds=2)
    results = [FakeRes(1000.0), FakeRes(870.0)]
    out = xfold._handle_outlier_folds(args, settings, runner, results)
    msg = capsys.readouterr().out
    assert "fold 2: best-val 870.0" in msg and "--rerun_outliers" in msg
    assert out[1].elbo == 870.0 and out[1].dumped == []

    # with the flag: fold 2 reruns under a bumped seed and recovers
    args.rerun_outliers = True
    called = {}

    def fake_run_on_split(a, s, split=None):
        called["split"] = split
        called["seed"] = s.seed
        return None, FakeRes(990.0)

    monkeypatch.setattr("vihds_tpu.run_xval.run_on_split", fake_run_on_split)
    out = xfold._handle_outlier_folds(args, settings, runner, results)
    assert called["split"] == 2 and called["seed"] != 0
    assert out[0].elbo == 1000.0 and out[1].elbo == 990.0
    assert out[1].dumped == ["c1"]  # the winner's cache is re-dumped

    # a rerun that does NOT improve keeps the original (and re-dumps it)
    results = [FakeRes(1000.0), FakeRes(870.0)]

    def fake_worse(a, s, split=None):
        return None, FakeRes(700.0)

    monkeypatch.setattr("vihds_tpu.run_xval.run_on_split", fake_worse)
    out = xfold._handle_outlier_folds(args, settings, runner, results)
    assert out[1].elbo == 870.0 and out[1].dumped == ["c1"]


def test_vmap_folds_profile_dir(tmp_path, monkeypatch):
    """--profile_dir no longer forces the vmapped driver to fall back
    (round 5): it captures one post-compile batched train dispatch, writing
    a jax.profiler trace that covers every fold."""
    import glob as _glob

    from tests.conftest import make_args, spec
    from vihds_tpu import xfold
    from vihds_tpu.config import Config, Trainer

    monkeypatch.setenv("INFERENCE_RESULTS_DIR", str(tmp_path))
    prof = tmp_path / "prof"
    a = make_args(spec("dr_constant_one.yaml"), epochs=4, folds=2)
    a.experiment = "vprof"
    a.profile_dir = str(prof)
    s = Config(a)
    assert xfold.unsupported_reason(a, s) is None
    s.trainer = Trainer(a, add_timestamp=False)
    out = xfold.run_all_folds(a, s)
    assert out is not None, "vmapped driver must not fall back under --profile_dir"
    traces = _glob.glob(str(prof / "**" / "*.xplane.pb"), recursive=True)
    assert traces, "no profiler trace written under --profile_dir"
