"""Test config: force CPU with 8 virtual devices so sharding/collective tests
run without TPU hardware (SURVEY.md §4's multi-host test recommendation)."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment's TPU plugin prepends itself to jax_platforms regardless of
# the env var; force CPU explicitly so tests never touch (or wait for) the TPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def reference_available():
    return os.path.isdir(REFERENCE)


@pytest.fixture()
def tmp_results(tmp_path, monkeypatch):
    monkeypatch.setenv("INFERENCE_RESULTS_DIR", str(tmp_path))
    return tmp_path


def make_args(yaml_path, **kw):
    from vihds_tpu.run_xval import create_parser

    args = create_parser(True).parse_args([yaml_path])
    args.seed = 0
    args.epochs = 4
    args.test_epoch = 2
    args.plot_epoch = 0
    args.train_samples = 10
    args.test_samples = 10
    for k, v in kw.items():
        setattr(args, k, v)
    return args


def spec(name):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(here, "specs", name)


@pytest.fixture(autouse=True)
def _bound_mapped_regions():
    """Keep the test process under vm.max_map_count (default 65530).

    Every distinct heavy XLA:CPU compile maps ~2-3k regions of JIT code
    (measured: one training-step compile = +2778 entries in
    /proc/self/maps), and a full-suite process accumulates enough that
    LLVM's allocateMappedMemory starts failing with ENOMEM and aborts the
    interpreter ("LLVM compilation error: Cannot allocate memory",
    observed as a suite-wide segfault at ~51%).  RAM is irrelevant — it is
    the per-process map-count limit.  jax.clear_caches() releases the
    mapped executables (3572 -> 1136 measured), so drop the caches
    whenever the count nears the limit; subsequent tests recompile
    transparently."""
    yield
    try:
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n > 30000:
        jax.clear_caches()
        from vihds_tpu import training as _training

        _training._STEP_CACHE.clear()
