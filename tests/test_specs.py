"""Every shipped spec parses, compiles to a program, and builds its model
(data loading + encoder shapes included) — a schema regression net."""

import glob
import os

import pytest

from tests.conftest import make_args
from vihds_tpu.config import Config
from vihds_tpu.data.datasets import build_datasets
from vihds_tpu.prob import ParamProgram, parse_parameters
from vihds_tpu.vae import VAE

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_SPECS = sorted(os.path.basename(p) for p in glob.glob(os.path.join(HERE, "specs", "*.yaml")))
# dr_growthrate_xval names a model that never existed in the reference's
# registry (models/__init__.py:19-35) — dead upstream; buildable here via the
# documented reconstruction in vihds_tpu/models/dr_growthrate.py.
BUILDABLE = ALL_SPECS


def test_spec_inventory():
    # 16 = parity with the reference's specs/ dir; +1 repo-native spec
    # (dr_constant_icml_unmerged.yaml, the merge:false path dead upstream)
    assert len(ALL_SPECS) == 17
    assert "dr_constant_icml_unmerged.yaml" in ALL_SPECS


@pytest.mark.parametrize("spec_name", BUILDABLE)
def test_spec_builds(spec_name):
    import jax

    args = make_args(os.path.join(HERE, "specs", spec_name))
    settings = Config(args)
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    assert program.n_theta > 0
    model = VAE(settings, data, program)
    params = model.init_params(jax.random.PRNGKey(0))
    assert "enc" in params and "dec" in params
    assert model.n_theta == program.n_theta
    assert len(model.state_names) == model.ode_model.n_species
