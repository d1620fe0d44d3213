"""Amortised serving (vihds_tpu.predict): checkpoint restore + prediction on
new CSVs must reproduce the trained model's coordinates exactly — same time
grid, same normalisation, same q — with clean errors on vocabulary misses.
(Capability beyond the reference, which never saves model weights.)"""

import os

import numpy as np
import jax
import pytest

from tests.conftest import make_args, spec
from vihds_tpu import checkpoint as ckpt
from vihds_tpu import predict as P
from vihds_tpu.config import Config
from vihds_tpu.data.datasets import build_datasets
from vihds_tpu.prob import ParamProgram, parse_parameters
from vihds_tpu.training import Training
from vihds_tpu.vae import VAE

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(HERE, "data")


def _checkpointed_model(tmp_path, spec_name="dr_constant_one.yaml"):
    args = make_args(spec(spec_name))
    settings = Config(args)
    settings.trainer = None
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    training = Training(args, settings, data, program, model)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    ckpt_dir = str(tmp_path / "ckpts")
    ckpt.save(ckpt_dir, 3, params, training.tx.init(params), key, extra={"epoch": 3})
    return args, settings, data, program, model, training, params, ckpt_dir


def test_predict_matches_direct_eval_on_training_file(tmp_path):
    """Serving the training CSV as 'new data' must produce exactly the q the
    trained encoder produces on the dataset rows: the loader re-applies the
    training scales and grid, and q is deterministic given (params, x)."""
    args, settings, data, program, model, training, params, ckpt_dir = _checkpointed_model(tmp_path)

    pargs = make_args(spec("dr_constant_one.yaml"))
    pargs.checkpoint = ckpt_dir
    pargs.data = [os.path.join(DATA, "proc141006.csv")]
    pargs.test_samples = 8
    out = P.predict(pargs)
    assert out.epoch == 3

    # direct evaluation of the full dataset in CSV row order
    full = data.train.dataset
    host = full.select(np.arange(len(full)))
    merged, _ = training.evaluate(params, host, 8, jax.random.PRNGKey(42))

    np.testing.assert_allclose(out.merged.q_mu, merged.q_mu, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out.merged.q_prec, merged.q_prec, rtol=1e-5, atol=1e-6)
    # host batch reproduces the training preprocessing bit-for-bit
    np.testing.assert_array_equal(out.host.observations, host.observations)
    np.testing.assert_array_equal(out.host.inputs, host.inputs)
    np.testing.assert_array_equal(out.host.dev_1hot, host.dev_1hot)

    # predictive outputs: finite, right shapes
    B, S, T = host.observations.shape
    assert out.merged.iw_predict_mu.shape == (B, 4, T)
    assert np.isfinite(out.merged.iw_predict_mu).all()
    assert np.isfinite(out.merged.per_item_elbo).all()
    assert out.results.species_names is not None


def test_predict_is_deterministic(tmp_path):
    *_, ckpt_dir = _checkpointed_model(tmp_path)
    pargs = make_args(spec("dr_constant_one.yaml"))
    pargs.checkpoint = ckpt_dir
    pargs.data = [os.path.join(DATA, "proc141006.csv")]
    pargs.test_samples = 4
    a = P.predict(pargs)
    b = P.predict(pargs)
    np.testing.assert_array_equal(a.merged.iw_predict_mu, b.merged.iw_predict_mu)
    np.testing.assert_array_equal(a.merged.per_item_elbo, b.merged.per_item_elbo)


def test_predict_vocabulary_miss_is_clean(tmp_path):
    *_, ckpt_dir = _checkpointed_model(tmp_path)
    pargs = make_args(spec("dr_constant_one.yaml"))
    pargs.checkpoint = ckpt_dir
    # proc141021.csv has no Pcat_Y81C76 rows
    pargs.data = [os.path.join(DATA, "proc141021.csv")]
    pargs.test_samples = 4
    with pytest.raises(SystemExit, match="No rows .* match the spec's devices"):
        P.predict(pargs)


def test_predict_missing_checkpoint_is_clean(tmp_path):
    pargs = make_args(spec("dr_constant_one.yaml"))
    pargs.checkpoint = str(tmp_path / "nothing_here")
    pargs.data = [os.path.join(DATA, "proc141006.csv")]
    pargs.test_samples = 4
    with pytest.raises(SystemExit, match="No checkpoint found"):
        P.predict(pargs)


def test_save_predictions_npz(tmp_path):
    *_, ckpt_dir = _checkpointed_model(tmp_path)
    pargs = make_args(spec("dr_constant_one.yaml"))
    pargs.checkpoint = ckpt_dir
    pargs.data = [os.path.join(DATA, "proc141006.csv")]
    pargs.test_samples = 4
    pargs.save_theta = True
    settings = Config(pargs)
    out = P.predict(pargs, settings)
    path = str(tmp_path / "pred.npz")
    P.save_predictions(path, out, pargs, settings)
    z = np.load(path, allow_pickle=True)
    for k in (
        "iw_predict_mu", "iw_predict_std", "iw_states", "iw_variance",
        "per_item_elbo", "elbo", "q_mu", "q_prec", "q_names",
        "species_names", "devices", "device_names", "inputs",
        "observations", "times", "scales", "checkpoint_epoch", "theta",
    ):
        assert k in z, k
    assert z["theta"].shape[2] == 4  # K
    assert len(z["scales"]) == 4


@pytest.mark.slow
def test_predict_cli_end_to_end(tmp_path):
    """Full serving loop through both CLIs: train with --checkpoint_epoch,
    then python -m vihds_tpu.predict on a 'new' CSV with figures."""
    import glob

    from tests.test_run_xval import run_cli

    r = run_cli(
        "vihds_tpu.run_xval",
        [spec("dr_constant_one.yaml"), "--experiment=svc", "--checkpoint_epoch=2"],
        tmp_path,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    (ckpt_dir,) = glob.glob(str(tmp_path / "svc_*" / "checkpoints_*"))

    out = str(tmp_path / "pred.npz")
    r2 = run_cli(
        "vihds_tpu.predict",
        [
            spec("dr_constant_one.yaml"),
            "--checkpoint=" + ckpt_dir,
            "--data=" + os.path.join(DATA, "proc141006.csv"),
            "--output=" + out,
            "--figures",
        ],
        tmp_path,
    )
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    z = np.load(out, allow_pickle=True)
    assert np.isfinite(z["iw_predict_mu"]).all()
    assert np.isfinite(float(z["elbo"]))
    # --checkpoint_epoch=2 over 4 epochs saves at 2 and 4; restore = latest
    assert int(z["checkpoint_epoch"]) == 4
    assert os.path.exists(str(tmp_path / "pred.png"))
    assert os.path.exists(str(tmp_path / "pred.pdf"))


def test_decode_is_forwards_tail():
    """VAE.decode on forward's clipped theta must reproduce forward's
    decoder outputs exactly (the counterfactual path is forward's tail)."""
    args = make_args(spec("dr_constant_one.yaml"))
    settings = Config(args)
    settings.trainer = None
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    params = model.init_params(jax.random.PRNGKey(0))
    from vihds_tpu.training import batch_arrays

    batch = batch_arrays(data.train.dataset.select(np.arange(6)))
    u = model.sample_u(jax.random.PRNGKey(1), 6, 5)
    fwd = model.forward(params, batch, u)
    dec = model.decode(params, fwd.theta_clipped, batch)
    np.testing.assert_array_equal(np.asarray(fwd.x_predict), np.asarray(dec.x_predict))
    np.testing.assert_array_equal(np.asarray(fwd.x_states), np.asarray(dec.x_states))


def test_counterfactual_matches_factual_at_observed_treatments(tmp_path):
    """Overriding treatments with a row's OWN observed values must reproduce
    that row's factual predictive moments; a different override must not."""
    *_, ckpt_dir = _checkpointed_model(tmp_path)
    pargs = make_args(spec("dr_constant_one.yaml"))
    pargs.checkpoint = ckpt_dir
    pargs.data = [os.path.join(DATA, "proc141006.csv")]
    pargs.test_samples = 6
    settings = Config(pargs)
    base = P.predict(pargs, settings)

    conditions = list(settings.data.conditions)
    raw = np.expm1(base.host.inputs)  # undo log1p
    row = 0
    spec_str = ";".join("%s=%.10g" % (c, raw[row, i]) for i, c in enumerate(conditions))

    pargs2 = make_args(spec("dr_constant_one.yaml"))
    pargs2.checkpoint = ckpt_dir
    pargs2.data = [os.path.join(DATA, "proc141006.csv")]
    pargs2.test_samples = 6
    pargs2.treatments = [spec_str, "C6=0;C12=0"]
    out = P.predict(pargs2, Config(pargs2))
    cf_same, cf_zero = out.counterfactuals

    np.testing.assert_allclose(
        cf_same.iw_predict_mu[row], out.merged.iw_predict_mu[row], rtol=2e-4, atol=1e-5
    )
    assert np.isfinite(cf_zero.iw_predict_mu).all()
    # zeroed treatments must actually change rows that had nonzero treatment
    hot = np.flatnonzero(raw.sum(1) > 1.0)
    assert np.abs(cf_zero.iw_predict_mu[hot] - out.merged.iw_predict_mu[hot]).max() > 1e-3


def test_counterfactual_unknown_condition_is_clean(tmp_path):
    *_, ckpt_dir = _checkpointed_model(tmp_path)
    pargs = make_args(spec("dr_constant_one.yaml"))
    pargs.checkpoint = ckpt_dir
    pargs.data = [os.path.join(DATA, "proc141006.csv")]
    pargs.test_samples = 4
    pargs.treatments = ["IPTG=5"]
    with pytest.raises(SystemExit, match="not in the spec's conditions"):
        P.predict(pargs)


def test_predict_on_unmerged_trained_model(tmp_path):
    """Serving a model trained on merge:false data: new CSVs land on the
    encoder (shortest) grid with enc_observations, and the whole pipeline
    stays finite with the right shapes."""
    args, settings, data, program, model, training, params, ckpt_dir = _checkpointed_model(
        tmp_path, "dr_constant_icml_unmerged.yaml"
    )
    pargs = make_args(spec("dr_constant_icml_unmerged.yaml"))
    pargs.checkpoint = ckpt_dir
    pargs.data = [os.path.join(DATA, "proc141006.csv")]
    pargs.test_samples = 4
    out = P.predict(pargs)
    assert "enc_observations" in out.host
    B, S, T = out.host.observations.shape
    assert T == training.train_data.observations.shape[-1]  # encoder grid
    assert out.merged.iw_predict_mu.shape == (B, 4, T)
    assert np.isfinite(out.merged.iw_predict_mu).all()
    assert np.isfinite(out.merged.per_item_elbo).all()


def test_predict_typo_checkpoint_does_not_create_dir(tmp_path):
    """A mistyped --checkpoint must not leave a spurious orbax directory
    behind (CheckpointManager is built with create=True)."""
    typo = tmp_path / "does" / "not" / "exist"
    pargs = make_args(spec("dr_constant_one.yaml"))
    pargs.checkpoint = str(typo)
    pargs.data = [os.path.join(DATA, "proc141006.csv")]
    pargs.test_samples = 4
    with pytest.raises(SystemExit, match="No checkpoint found"):
        P.predict(pargs)
    assert not typo.exists()


def test_counterfactual_step_is_compiled_once(tmp_path):
    """Every --treatments entry must reuse ONE jitted decode program."""
    *_, ckpt_dir = _checkpointed_model(tmp_path)
    pargs = make_args(spec("dr_constant_one.yaml"))
    pargs.checkpoint = ckpt_dir
    pargs.data = [os.path.join(DATA, "proc141006.csv")]
    pargs.test_samples = 4
    pargs.treatments = ["C6=1;C12=0", "C6=10;C12=0", "C6=100;C12=0"]
    out = P.predict(pargs)
    assert len(out.counterfactuals) == 3


def test_malformed_serving_inputs_fail_with_named_errors(tmp_path):
    """Serving is a product surface: every malformed-input class — empty
    file, non-plate CSV, missing/ragged signal columns, bad condition
    strings, unseen devices, an incompatible time grid, a missing file —
    must fail with a NAMED, actionable error, never a shape traceback
    (VERDICT r3 #9)."""
    import pandas as pd

    from vihds_tpu.data import procdata

    args = make_args(spec("dr_constant_one.yaml"))
    settings = Config(args)
    settings.trainer = None
    data = build_datasets(args, settings)
    train_ds = data.train.dataset
    src = pd.read_csv(os.path.join(DATA, "proc141006.csv"), na_filter=False)

    def write(name, frame):
        p = str(tmp_path / name)
        frame.to_csv(p, index=False)
        return p

    # empty file
    p = tmp_path / "empty.csv"
    p.write_text("")
    with pytest.raises(ValueError, match="is empty"):
        procdata.load(str(p), settings.data)

    # not plate-reader shaped
    p = tmp_path / "short.csv"
    p.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="does not look like plate-reader data"):
        procdata.load(str(p), settings.data)

    # missing file
    with pytest.raises(FileNotFoundError, match="not found"):
        procdata.load(str(tmp_path / "nope.csv"), settings.data)

    # missing signal columns (drop every EYFP reading)
    keep = [c for c in src.columns if "(EYFP)" not in c]
    p = write("no_eyfp.csv", src[keep])
    with pytest.raises(ValueError, match=r"no reading columns for signal\(s\) \['EYFP'\]"):
        procdata.load(p, settings.data)

    # ragged per-signal column counts (drop ONE ECFP reading)
    ecfp = [c for c in src.columns if "(ECFP)" in c]
    p = write("ragged.csv", src[[c for c in src.columns if c != ecfp[0]]])
    with pytest.raises(ValueError, match="unequal reading-column counts"):
        procdata.load(p, settings.data)

    # unparseable condition string
    bad = src.copy()
    bad.iloc[1:, 4] = "C6=abc"
    p = write("badcond.csv", bad)
    with pytest.raises(ValueError, match="Unparseable condition string"):
        procdata.load(p, settings.data)

    # unseen device names: named exit listing what the file DOES contain
    alien = src.copy()
    alien.iloc[1:, 0] = "NotADevice"
    p = write("alien.csv", alien)
    with pytest.raises(SystemExit, match="NotADevice"):
        P.load_new_data([p], settings, train_ds)

    # incompatible (too-short) time grid: keep only readings before t=4
    t0 = src.iloc[0, 5:].astype(float)
    keep = list(src.columns[:5]) + [c for c, tv in zip(src.columns[5:], t0) if tv <= 4.0]
    p = write("shortgrid.csv", src[keep])
    with pytest.raises(SystemExit, match="incompatible with the training grid"):
        P.load_new_data([p], settings, train_ds)
