"""Shared column-type inference for the dependency-free small-path
readers (xlsx, avro): given decoded python values, pick the pandas
dtype Spark's createDataFrame maps cleanly — int64 when every present
value is an integer, float64 for mixed/missing numerics, bool when
uniformly boolean, object otherwise."""

from __future__ import annotations

from typing import Any, Sequence

import pandas as pd


def series_for(vals: Sequence[Any]) -> pd.Series:
    present = [v for v in vals if v is not None]
    if present and all(isinstance(v, bool) for v in present):
        dtype = "bool" if len(present) == len(vals) else "object"
    elif present and all(
        isinstance(v, int) and not isinstance(v, bool) for v in present
    ):
        dtype = "int64" if len(present) == len(vals) else "float64"
    elif present and all(
        isinstance(v, (int, float)) and not isinstance(v, bool)
        for v in present
    ):
        dtype = "float64"
    else:
        dtype = "object"
    return pd.Series(vals, dtype=dtype)
