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
