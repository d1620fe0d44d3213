"""Small utilities: AttrDict pytree behaviour, profiling hooks, config env."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from vihds_tpu import profiling
from vihds_tpu.utils.attrdict import AttrDict, attrdictify


def test_attrdict_is_pytree():
    d = AttrDict(a=jnp.ones(3), b=AttrDict(c=jnp.zeros(2)))
    leaves, treedef = jax.tree_util.tree_flatten(d)
    assert len(leaves) == 2
    d2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(d2, AttrDict) and isinstance(d2.b, AttrDict)
    # crosses jit boundaries intact
    out = jax.jit(lambda x: AttrDict(y=x.a * 2))(d)
    np.testing.assert_allclose(np.asarray(out.y), 2.0)


def test_attrdictify_recursive():
    d = attrdictify({"x": {"y": [1, {"z": 2}]}})
    assert d.x.y[1].z == 2


def test_profiling_trace_noop_and_capture(tmp_path):
    with profiling.trace(None):
        pass  # no-op without a directory
    with profiling.trace(str(tmp_path / "tr")):
        jax.block_until_ready(jnp.ones(4) * 2)
    produced = []
    for root, _, files in os.walk(tmp_path / "tr"):
        produced.extend(files)
    assert any(f.endswith(".xplane.pb") for f in produced)


def test_step_timer():
    t = profiling.StepTimer()
    x = jnp.ones(8)
    with t.measure(x):
        y = x * 2
    s = t.summary()
    assert s["n"] == 1 and s["mean_s"] >= 0


def test_data_directory_env(monkeypatch, tmp_path):
    from vihds_tpu import config

    monkeypatch.setenv("INFERENCE_DATA_DIR", str(tmp_path))
    assert config.get_data_directory() == str(tmp_path)
    monkeypatch.delenv("INFERENCE_DATA_DIR")
    assert config.get_data_directory().endswith("data")
