"""litexpr: SQL-text literal arrays must be bit-exact twins of the
element-wise ``F.array(*[F.lit(x) ...])`` construction they replace
(r16 driver-side optimization — see ``parquet_editor_spark/litexpr``).
"""

import math
import struct

import pytest
from pyspark.sql import functions as F

from parquet_editor_spark.litexpr import (
    lit_double_matrix,
    lit_doubles,
    lit_longs,
    sql_double,
    sql_int,
)


def _bits(v: float) -> bytes:
    return struct.pack("<d", v)


EDGE_DOUBLES = [
    0.0,
    -0.0,
    0.1,
    -1.5e-5,
    3.0000000000000004,
    123456789.123456789,
    1e20,
    1e-308,
    5e-324,  # min subnormal
    -2.2250738585072014e-308,
    1.7976931348623157e308,  # max double
]


def test_lit_doubles_bit_exact_vs_elementwise(spark):
    df = spark.range(1)
    old = df.select(
        F.array(*[F.lit(float(x)) for x in EDGE_DOUBLES]).alias("a")
    )
    new = df.select(lit_doubles(EDGE_DOUBLES).alias("a"))
    assert old.schema["a"].dataType == new.schema["a"].dataType
    o, n = old.first()["a"], new.first()["a"]
    assert [_bits(x) for x in o] == [_bits(x) for x in n]


def test_lit_doubles_specials(spark):
    vals = [float("nan"), float("inf"), float("-inf")]
    got = spark.range(1).select(lit_doubles(vals).alias("a")).first()["a"]
    assert math.isnan(got[0])
    assert got[1] == float("inf") and got[2] == float("-inf")


def test_lit_longs_extremes(spark):
    vals = [0, 1, -1, 2**62, -(2**63), 2**63 - 1]
    df = spark.range(1)
    old = df.select(
        F.array(*[F.lit(int(x)).cast("long") for x in vals]).alias("a")
    )
    new = df.select(lit_longs(vals).alias("a"))
    assert old.schema["a"].dataType == new.schema["a"].dataType
    assert old.first()["a"] == new.first()["a"]


@pytest.mark.parametrize(
    "v", [0, 2**31 - 1, -(2**31), 2**31, -(2**31) - 1, 2**40]
)
def test_sql_int_typing_matches_f_lit(spark, v):
    df = spark.range(1)
    o_t = df.select(F.lit(v).alias("x")).schema["x"].dataType
    n_t = df.select(F.expr(sql_int(v)).alias("x")).schema["x"].dataType
    assert o_t == n_t


def test_lit_double_matrix(spark):
    m = [[0.1, -2.5], [3.25, 4e-9]]
    df = spark.range(1)
    old = df.select(
        F.array(
            *[F.array(*[F.lit(float(x)) for x in r]) for r in m]
        ).alias("a")
    )
    new = df.select(lit_double_matrix(m).alias("a"))
    assert old.schema["a"].dataType == new.schema["a"].dataType
    assert old.first()["a"] == new.first()["a"]


def test_sql_double_round_trips_repr():
    # the fragment is repr-based: shortest round-trip decimal + D
    assert sql_double(0.1) == "0.1D"
    assert sql_double(5e-324) == "5e-324D"
    assert sql_double(float("nan")) == "CAST('NaN' AS DOUBLE)"


def test_empty_arrays_match_f_array(spark):
    df = spark.range(1)
    assert (
        df.select(lit_doubles([]).alias("a")).schema["a"].dataType
        == df.select(F.array().alias("a")).schema["a"].dataType
    )


def test_values_df_bit_exact_vs_createdataframe(spark):
    """r17: the JVM VALUES relation must hold the same IEEE doubles
    (and the declared column types) as the createDataFrame local
    relation it replaces in the index metadata writes."""
    from parquet_editor_spark.litexpr import (
        sql_double_array,
        values_df,
    )

    rows = [(i, list(EDGE_DOUBLES)) for i in range(3)]
    old = spark.createDataFrame(rows, "cell int, centroid array<double>")
    new = values_df(
        spark,
        [f"({sql_int(i)},{sql_double_array(c)})" for i, c in rows],
        "col1 AS cell, col2 AS centroid",
    )
    # dataTypes must match; VALUES literals are (correctly) marked
    # non-nullable where createDataFrame said nullable — the values
    # and the parquet round-trip are what the contract pins
    assert [f.name for f in old.schema.fields] == [
        f.name for f in new.schema.fields
    ]
    assert [f.dataType.simpleString() for f in old.schema.fields] == [
        f.dataType.simpleString() for f in new.schema.fields
    ]
    o = {r["cell"]: r["centroid"] for r in old.collect()}
    n = {r["cell"]: r["centroid"] for r in new.collect()}
    for i in o:
        assert [_bits(x) for x in o[i]] == [_bits(x) for x in n[i]]
    # the relation is JVM-local: no Python evaluation in its plan
    from parquet_editor_spark.plans.explain import formatted_plan

    assert "LocalTableScan" in formatted_plan(new)
