"""Data layer: plate-reader CSV parsing and array dataset pipeline."""

from vihds_tpu.data.procdata import load  # noqa: F401
from vihds_tpu.data.datasets import (  # noqa: F401
    TimeSeriesDataset,
    TimeSeriesDatasetPair,
    build_datasets,
)
