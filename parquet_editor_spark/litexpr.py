"""SQL-text builders for bounded-metadata literal arrays.

Why this module exists (r16, optimization guide §5 — the driver can be
the bottleneck): constructing a literal array element-by-element with
``F.array(*[F.lit(x) for x in vals])`` pays one Py4J round-trip per
scalar, ~1 ms each — a 22-centroid × 64-dim table costs ~1.7 s of
driver wall PER EXPRESSION BUILD, and the trainer loops rebuild these
expressions every iteration.  Rendering the same constant as SQL text
and parsing it with ONE ``F.expr`` call yields the IDENTICAL analyzed
expression (same ``CreateArray``/``Literal`` nodes, same dtypes, same
results — pinned by ``tests/test_litexpr.py``) in ~7 ms: the string
crosses Py4J once and the parse happens in the JVM.

Formatting contracts (exactness, not convenience):

* doubles render via ``repr(float(x))`` — Python's shortest
  round-trip representation — suffixed ``D`` so the parser produces a
  DOUBLE literal (bare ``0.1`` would parse as DECIMAL).  Java's
  ``Double.parseDouble`` is correctly rounded, so the parsed IEEE
  bits equal the Python float's.  NaN/±Infinity (no SQL literal form)
  render as ``CAST('NaN' AS DOUBLE)`` etc.
* integers mirror ``F.lit``'s typing: INT when the value fits in
  32 bits, else a ``L``-suffixed BIGINT.
* empty input falls back to ``F.array()`` so the corner dtype
  (``array<void>``) matches the element-wise construction exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_INT32_MIN, _INT32_MAX = -(2**31), 2**31 - 1


def sql_double(x) -> str:
    """One DOUBLE literal as SQL text, bit-exact vs ``F.lit(float(x))``."""
    v = float(x)
    if math.isnan(v):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(v):
        return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
    return repr(v) + "D"


def sql_int(x) -> str:
    """One integral literal as SQL text with ``F.lit`` typing parity:
    INT if the value fits in 32 bits, else BIGINT (``L`` suffix)."""
    v = int(x)
    return str(v) if _INT32_MIN <= v <= _INT32_MAX else f"{v}L"


def sql_double_array(vals) -> str:
    """``array(…D, …D)`` fragment (caller guarantees non-empty)."""
    return "array(" + ",".join(sql_double(v) for v in vals) + ")"


def sql_long_array(vals) -> str:
    """``array(…L, …L)`` fragment — every element BIGINT."""
    return "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"


def lit_doubles(vals) -> Column:
    """``array<double>`` literal column — one ``F.expr`` call."""
    vals = list(vals)
    if not vals:
        return F.array()
    return F.expr(sql_double_array(vals))


def lit_longs(vals) -> Column:
    """``array<bigint>`` literal column — one ``F.expr`` call."""
    vals = list(vals)
    if not vals:
        return F.array()
    return F.expr(sql_long_array(vals))


def values_df(spark, rows_sql, select_sql: str):
    """JVM-local literal relation:
    ``SELECT <select_sql> FROM (VALUES <rows>)`` — for
    bounded-metadata tables (trained centroids/codebooks, probe
    tables) that get WRITTEN or joined as a unit.

    Why not ``spark.createDataFrame(rows)``: that path parallelizes
    the rows over ``defaultParallelism`` Python-RDD slices, and any
    single-task action over it — a ``coalesce(1)`` parquet write of
    an 8-row metadata table — then pays one sequential Python-worker
    interaction per slice (~6 s measured at 32 cores for 8 rows).  A
    VALUES relation is a single-partition JVM LocalRelation: the same
    write is ~0.4 s, and the literal doubles are bit-exact by the
    same repr/parse contract as :func:`lit_doubles` (pinned by
    tests/test_litexpr.py)."""
    return spark.sql(
        f"SELECT {select_sql} FROM (VALUES {','.join(rows_sql)})"
    )


def lit_double_matrix(rows) -> Column:
    """``array<array<double>>`` literal column — one ``F.expr`` call."""
    rows = [list(r) for r in rows]
    if not rows:
        return F.array()
    return F.expr(
        "array(" + ",".join(sql_double_array(r) for r in rows) + ")"
    )
