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


def test_enable_compile_cache(monkeypatch, tmp_path):
    """Persistent-compile-cache plumbing: env off disables; explicit dir and
    env dir are honoured and created; jitted work lands entries on disk."""
    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("VIHDS_COMPILE_CACHE", "off")
        assert profiling.enable_compile_cache() is None

        # CPU backend (the test environment): no-op without force — reading
        # persisted XLA:CPU AOT executables can segfault on this image.
        monkeypatch.setenv("VIHDS_COMPILE_CACHE", str(tmp_path / "via_env"))
        assert profiling.enable_compile_cache() is None

        path = profiling.enable_compile_cache(force=True)
        assert path == str(tmp_path / "via_env") and os.path.isdir(path)
        assert jax.config.jax_compilation_cache_dir == path

        explicit = str(tmp_path / "explicit")
        assert profiling.enable_compile_cache(explicit, force=True) == explicit

        # Functional: a fresh compile is persisted (threshold lowered so the
        # tiny CPU program qualifies).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.jit(lambda x: jnp.sin(x) * 3 + 1)(jnp.arange(7.0)).block_until_ready()
        assert os.listdir(explicit), "no cache entry written"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
