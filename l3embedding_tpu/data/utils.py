"""Small host-side data utilities (reference data/utils.py:5-32)."""

from __future__ import annotations

import csv
from multiprocessing import Pool


def read_csv_as_dicts(path):
    with open(path, "r") as f:
        return list(csv.DictReader(f))


def map_iterate_in_parallel(iterable, function, processes=8):
    """mp.Pool map wrapper. With processes<=1, maps inline (useful on
    single-core hosts and under test)."""
    if processes <= 1:
        return [function(x) for x in iterable]
    with Pool(processes=processes) as pool:
        return list(pool.map(function, iterable))


def flatten_dict(dct, parent_key=None):
    out = type(dct)()
    for k, v in dct.items():
        key = f"{parent_key}_{k}" if parent_key is not None else k
        if isinstance(v, dict):
            out.update(flatten_dict(v, parent_key=key))
        else:
            out[key] = v
    return out
