"""Shared type plumbing for the small-path sources (xlsx, avro,
python datasources) — ONE home for the three ladders that otherwise
drift: decoded-values → pandas dtype, pandas dtype → Spark type,
pyarrow type → Spark type, plus the scalar-safe missing check."""

from __future__ import annotations

from typing import Any, Sequence

import pandas as pd


def is_missing(v: Any) -> bool:
    """None / float NaN / pd.NA — scalar-safe: never calls pd.isna on
    container values (an object cell holding a list would make the
    truthiness ambiguous)."""
    return (
        v is None
        or v is pd.NA
        or (isinstance(v, float) and v != v)
    )


def spark_type_for_pandas(dtype) -> "T.DataType":
    """pandas dtype string → Spark type (small-path mapping: ints to
    long, floats to double, bools to boolean, everything else
    string)."""
    from pyspark.sql import types as T

    k = str(dtype).lower()
    if k.startswith(("int", "uint")):
        return T.LongType()
    if k.startswith("float"):
        return T.DoubleType()
    if k in ("bool", "boolean"):
        return T.BooleanType()
    return T.StringType()


def spark_type_for_arrow(t) -> "T.DataType":
    """pyarrow type → Spark type, timezone-aware: tz-naive parquet
    timestamps map to TIMESTAMP_NTZ, tz-aware to TIMESTAMP."""
    import pyarrow.types as pa_t
    from pyspark.sql import types as T

    if pa_t.is_timestamp(t):
        return T.TimestampType() if t.tz else T.TimestampNTZType()
    if pa_t.is_integer(t):
        return T.LongType()
    if pa_t.is_floating(t):
        return T.DoubleType()
    if pa_t.is_boolean(t):
        return T.BooleanType()
    if pa_t.is_binary(t) or pa_t.is_large_binary(t):
        # raw bytes must stay bytes: a StringType fallback would make
        # the Arrow converter emit Python repr text ("b'\\x01'")
        return T.BinaryType()
    if pa_t.is_date(t):
        return T.DateType()
    if pa_t.is_decimal(t):
        return T.DecimalType(t.precision, t.scale)
    return T.StringType()


def series_for(vals: Sequence[Any]) -> pd.Series:
    present = [v for v in vals if v is not None]
    if present and all(isinstance(v, bool) for v in present):
        dtype = "bool" if len(present) == len(vals) else "object"
    elif present and all(
        isinstance(v, int) and not isinstance(v, bool) for v in present
    ):
        # nullable Int64 (not float64) when values are missing: the
        # float widening silently corrupts int64 ids above 2^53
        dtype = "int64" if len(present) == len(vals) else "Int64"
    elif present and all(
        isinstance(v, (int, float)) and not isinstance(v, bool)
        for v in present
    ):
        dtype = "float64"
    else:
        dtype = "object"
    return pd.Series(vals, dtype=dtype)
