"""Plate-reader CSV parser.

Produces the same (devices, treatments, times, observations) arrays as the
reference parser (reference data/procdata.py:122-187) from the same CSV layout:

  row 0 after the header holds the observation times ("timesall") from column 5
  on; every later row is one well: [device, colony, well-col, well-row,
  condition-string, <readings...>].  Reading columns are named
  ``<n> (SIGNAL)`` so the signal is recovered from the text between the first
  pair of parentheses.  The condition string looks like ``C6=25000;C12=0``.
"""

import os
from collections import OrderedDict
from typing import List

import numpy as np
import pandas as pd


def process_condition(row: str) -> "OrderedDict[str, float]":
    """``'a=b;c=d'`` -> ``{'a': b, 'c': d}`` with float values
    (parity: data/procdata.py:15-27)."""
    d = OrderedDict()
    if "=" not in row:
        return d
    for cond in row.split(";"):
        key, _, val = cond.partition("=")
        d[key] = float(val)
    return d


def expand_conditions(treatments: List[OrderedDict], conditions) -> np.ndarray:
    """Give every treatment dict the same key set, zero-filling the named
    experiment conditions (parity: data/procdata.py:38-49)."""
    zero = OrderedDict((cond, 0.0) for cond in conditions)
    return np.array([OrderedDict(zero, **tr) for tr in treatments])


def find_conditions(expanded, conditions):
    """Keep only wells whose *unspecified* conditions are all zero; return their
    indices plus the filtered per-well condition dicts
    (parity: data/procdata.py:52-60)."""
    treatments = list(expanded[0].keys())
    removes = list(set(treatments) - set(conditions))
    locs = [i for i, ex in enumerate(expanded) if all(ex[r] == 0.0 for r in removes)]
    filtered = [OrderedDict((k, ex[k]) for k in conditions) for ex in expanded[locs]]
    return locs, filtered


def extract_signal(s: str) -> str:
    """Text between the first pair of parentheses, else the whole string
    (parity: data/procdata.py:63-73)."""
    loc0 = s.find("(")
    if loc0 >= 0:
        loc1 = s.find(")")
        if loc1 >= 0:
            return s[loc0 + 1 : loc1]
    return s


def load(csv_file, settings):
    """Parse one CSV under ``settings.data_dir``.

    Returns ``(devices[L] int, treatments[L,C], times[T], observations[L,S,T])``
    with dtype from ``settings.dtype`` (parity: data/procdata.py:122-187).
    Returns None when no row matches the requested devices.
    """
    data_path = os.path.join(settings.data_dir, csv_file)
    loaded = pd.read_csv(data_path, sep=",", na_filter=False)
    timesall = loaded.iloc[0, 5:]  # observation times
    obs_rows = loaded.iloc[1:, :]
    rows = obs_rows.iloc[np.isin(obs_rows.iloc[:, 0], settings.devices), :]

    devices = np.array([settings.device_map[dev] for dev in rows.iloc[:, 0]], dtype=int)

    treatment_values = [process_condition(cond) for cond in rows.iloc[:, 4]]
    if len(treatment_values) == 0:
        return None

    expanded = expand_conditions(treatment_values, settings.conditions)
    locs, filtered = find_conditions(expanded, settings.conditions)
    treatments = np.array([list(cond.values()) for cond in filtered])

    X = rows.iloc[locs, 5:]
    headers = np.array([v.split(".")[0] for v in X.columns.values])
    header_signals = np.array([extract_signal(h) for h in headers])
    x_values = [
        [row.iloc[header_signals == signal].values for signal in settings.signals]
        for _, row in X.iterrows()
    ]
    observations = np.array(x_values)
    times = timesall.iloc[header_signals == "OD"].values

    dtype = {"float32": np.float32, "float64": np.float64}.get(settings.dtype)
    if dtype is None:
        raise ValueError("Unknown dtype %s" % settings.dtype)
    return (
        devices,
        treatments.astype(dtype),
        times.astype(dtype),
        observations.astype(dtype),
    )
