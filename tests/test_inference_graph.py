"""Inference-graph DAG: staging, prior propagation from upstream posteriors,
resume markers, and end-to-end execution of a tiny 2-node graph."""

import os

import numpy as np
import pytest
import yaml

from tests.conftest import make_args, spec
from vihds_tpu import inference_graph as ig
from vihds_tpu import run_inference_graph as rig


def write_graph(tmp_path, epochs=2):
    doc = {
        "nodes": {
            "up": {
                "spec": spec("dr_constant_one.yaml"),
                "experiment": "up",
                "seed": 0,
                "epochs": epochs,
                "test_epoch": epochs,
                "train_samples": 5,
                "test_samples": 5,
                "plot_epoch": 0,
            },
            "down": {
                "spec": spec("dr_constant_one.yaml"),
                "experiment": "down",
                "seed": 0,
                "epochs": epochs,
                "test_epoch": epochs,
                "train_samples": 5,
                "test_samples": 5,
                "plot_epoch": 0,
            },
        },
        "edges": [
            {
                "from": {"node": "up", "parameter": "r"},
                "to": {"node": "down", "parameter": "r"},
            }
        ],
    }
    path = tmp_path / "graph.yaml"
    path.write_text(yaml.dump(doc))
    return str(path)


def test_graph_staging(tmp_path):
    g = ig.create_inference_graph(write_graph(tmp_path), "tg")
    assert g["up"].stage == 0
    assert g["down"].stage == 1
    stages = ig.arrange_by_stage(g.values())
    assert [n.name for n in stages[0]] == ["up"]
    assert [n.name for n in stages[1]] == ["down"]


def test_node_args_expose_driver_features(tmp_path):
    """Graph-node YAML reaches every driver feature: folds / vmap_folds /
    mesh / dreg / heldout parse through the run_xval parser per node."""
    doc = {
        "nodes": {
            "a": {
                "spec": spec("dr_constant_one.yaml"),
                "experiment": "a",
                "folds": 2,
                "vmap_folds": True,
                "mesh": "auto",
                "dreg": True,
                "grad_clip_norm": 10.0,
                "q_global_init": "prior",
            },
            "b": {
                "spec": spec("dr_constant_one.yaml"),
                "experiment": "b",
                "heldout": "R33S32_Y81C76",
                "mesh_data": 2,
                "mesh_sample": 4,
            },
        },
        "edges": [],
    }
    path = tmp_path / "graph_features.yaml"
    path.write_text(yaml.dump(doc))
    g = ig.create_inference_graph(str(path), "tf")
    a = g["a"].args
    assert a.folds == 2 and a.vmap_folds is True and a.mesh == "auto" and a.dreg is True
    assert a.grad_clip_norm == 10.0 and a.q_global_init == "prior"
    b = g["b"].args
    assert b.heldout == "R33S32_Y81C76" and b.mesh_data == 2 and b.mesh_sample == 4
    assert b.vmap_folds is False


def test_propagate_params_rule(tmp_path):
    """mean(mu) + pooled precision -> downstream LogNormal prior
    (parity: vihds/run_inference_graph.py:28-67)."""
    upstream = tmp_path / "updir"
    upstream.mkdir()
    q_names = ["r.mu", "r.prec", "K.mu", "K.prec"]
    mus = np.array([1.0, 3.0])
    precs = np.array([2.0, 4.0])
    q_values = np.array([mus, precs, mus * 0, precs * 0 + 1], dtype=object)
    np.save(upstream / "xval_q_values.npy", q_values)
    (upstream / "xval_q_names.txt").write_text("\n".join(q_names))

    g = ig.create_inference_graph(write_graph(tmp_path), "tg")
    from vihds_tpu.config import Config

    settings = Config(g["down"].args)
    rig.propagate_params(g["down"], settings, {"up": str(upstream)})
    newdist = settings.params["local"]["r"]
    assert newdist["distribution"] == "LogNormal"
    np.testing.assert_allclose(newdist["mu"], 2.0)
    # pooled precision: 2 / (1/2 + 1/4) = 8/3; sigma = 1/sqrt(prec)
    # (the reference stores the precision in the sigma field — a units bug)
    np.testing.assert_allclose(newdist["sigma"], 1.0 / np.sqrt(8.0 / 3.0))


@pytest.mark.slow
def test_graph_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setenv("INFERENCE_RESULTS_DIR", str(tmp_path))
    graph = write_graph(tmp_path)
    rig.main([graph, "--graph", "tg"])
    root = tmp_path / "tg"
    subdirs = sorted(os.listdir(root))
    assert any(d.startswith("up") for d in subdirs)
    assert any(d.startswith("down") for d in subdirs)
    for d in subdirs:
        contents = os.listdir(root / d)
        assert "completed.txt" in contents
        assert "xval_q_values.npy" in contents
    # the downstream node recorded the propagated prior
    (down_dir,) = [d for d in subdirs if d.startswith("down")]
    prop = (root / down_dir / "propagatedParams.txt").read_text()
    assert "LogNormal" in prop
    # resume: a second invocation must skip both completed nodes untouched
    mtimes = {d: os.path.getmtime(root / d / "completed.txt") for d in subdirs}
    rig.main([graph, "--graph", "tg"])
    for d, m in mtimes.items():
        assert os.path.getmtime(root / d / "completed.txt") == m
