"""Figure-function smoke tests on synthetic inputs (the slow end-to-end xval
test covers the full families; these catch regressions cheaply)."""

import numpy as np
import pytest

from vihds_tpu import plotting
from vihds_tpu.utils.attrdict import AttrDict


@pytest.fixture()
def synth():
    rng = np.random.RandomState(0)
    B, S, T = 8, 4, 20
    res = AttrDict(
        settings=AttrDict(
            devices=["devA", "devB"],
            pretty_devices=["A", "B"],
            signals=["OD", "RFP", "YFP", "CFP"],
            conditions=["C6", "C12"],
            separate_conditions=True,
        ),
        devices=np.array([0, 0, 0, 0, 1, 1, 1, 1]),
        treatments=np.log1p(rng.rand(B, 2) * 100),
        times=np.linspace(0, 17, T),
        X_obs=rng.rand(B, S, T),
        iw_predict_mu=rng.rand(B, S, T),
        iw_predict_std=0.1 * rng.rand(B, S, T),
        iw_states=rng.rand(B, 6, T),
        ids=np.arange(B),
        chunk_sizes=np.array([4, 4], dtype=object),
        q_names=["r.mu", "r.prec", "e76.mu", "e76.prec"],
        q_values=[rng.rand(B), 1 + rng.rand(B), rng.rand(2), 1 + rng.rand(2)],
    )
    return res


def test_prediction_summary(synth):
    f = plotting.plot_prediction_summary(
        synth.settings.devices,
        synth.settings.signals,
        synth.times,
        synth.X_obs,
        synth.iw_predict_mu,
        synth.iw_predict_std,
        synth.devices,
        "-",
    )
    assert f is not None


def test_prediction_summary_accepts_full_species_list(synth):
    """xval.make_images passes the FULL species-name list (8 names for
    dr_constant) while the prediction grid has only the 4 observed signal
    columns — the extra names must be ignored, not crash (regression:
    IndexError in the 2-fold e2e run)."""
    f = plotting.plot_prediction_summary(
        synth.settings.devices,
        ["OD", "RFP", "YFP", "CFP", "F530", "F480", "LuxR", "LasR"],
        synth.times,
        synth.X_obs,
        synth.iw_predict_mu,
        synth.iw_predict_std,
        synth.devices,
        "-",
    )
    assert f is not None


def test_species_summary(synth):
    f = plotting.species_summary(
        ["OD", "RFP", "YFP", "CFP"],
        synth.treatments,
        synth.devices,
        synth.times,
        synth.iw_states,
        [0, 1],
        synth.settings,
    )
    assert f is not None


def test_xval_figures(synth):
    assert plotting.xval_treatments(synth, [0, 1]) is not None
    assert plotting.xval_fit_summary(synth, 0, separatedInputs=True) is not None
    assert plotting.xval_individual_2treatments(synth, 0) is not None
    assert plotting.xval_global_parameters(synth) is not None
    assert plotting.xval_variable_parameters(synth) is not None


def test_weighted_theta(synth):
    rng = np.random.RandomState(1)
    B, K, n = 8, 10, 3
    iws = rng.rand(B, K)
    iws /= iws.sum(1, keepdims=True)
    theta = rng.rand(n, B, K)
    f = plotting.plot_weighted_theta(
        ["a", "b", "c"],
        iws,
        theta,
        synth.devices,
        columns=["a", "b"],
    )
    assert f is not None


def test_combined_treatments(synth):
    rng = np.random.RandomState(2)
    B, S, K, T = 8, 4, 6, 20
    res = AttrDict(
        devices=synth.devices,
        treatments=synth.treatments,
        X_obs=np.transpose(synth.X_obs, (0, 2, 1)),  # [L, T, S] final-row slicing
        importance_weights=np.full((B, K), 1.0 / K),
        PREDICT=rng.rand(B, K, S),  # [L, K, S] (reference contract)
        STD=0.1 * rng.rand(B, K, S),
        pretty_devices=["A", "B"],
        label="m1",
    )
    f = plotting.combined_treatments([res], [0, 1])
    assert f is not None


def test_gen_treatment_str():
    s = plotting.gen_treatment_str(["C6", "C12"], np.log1p(np.array([25000.0, 0.0])))
    assert "C6 = 25000" in s and "C12 = 0" in s
