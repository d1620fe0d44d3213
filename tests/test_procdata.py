"""CSV parser parity: our arrays must match the reference parser bit-for-bit
on the same CSVs (SURVEY.md §7 step 1 validation)."""

import os
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE, make_args, reference_available, spec
from vihds_tpu.config import Config
from vihds_tpu.data import procdata


@pytest.mark.skipif(not reference_available(), reason="reference checkout not present")
@pytest.mark.parametrize(
    "spec_name,csv",
    [
        ("dr_constant_icml.yaml", "proc140916.csv"),
        ("dr_constant_icml.yaml", "proc141028.csv"),
        ("auto_constant.yaml", "proc_EC10G_EtOH.csv"),
        ("degrader_constant_precisions.yaml", "proc_degrader_RemovedDuplicates.csv"),
    ],
)
def test_parser_matches_reference(spec_name, csv):
    args = make_args(spec(spec_name))
    settings = Config(args)

    sys.path.insert(0, REFERENCE)
    try:
        import importlib.util

        ref_spec = importlib.util.spec_from_file_location(
            "ref_procdata", os.path.join(REFERENCE, "data", "procdata.py")
        )
        ref_procdata = importlib.util.module_from_spec(ref_spec)
        ref_spec.loader.exec_module(ref_procdata)
    finally:
        sys.path.pop(0)

    ref_settings = settings.data.copy()
    ref_settings.data_dir = os.path.join(REFERENCE, "data")
    ref = ref_procdata.load(csv, ref_settings)
    ours = procdata.load(csv, settings.data)

    assert ref is not None and ours is not None
    for i, name in enumerate(["devices", "treatments", "times", "observations"]):
        np.testing.assert_array_equal(np.asarray(ours[i]), np.asarray(ref[i]), err_msg=name)
