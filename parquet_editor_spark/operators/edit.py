"""Positional editor operators over an explicit ``__rid`` ordinal.

The reference addresses every cell positionally — ``df.iloc[row, col]``
for reads/writes (main.py:29,35; main.pyc:63,71-74), ``df.index[pos]``
for row drops (main.py:50; main.pyc:125), 1-based positions in the
vertical header (main.pyc:85-86). Spark has no stable row positions,
so positional identity is materialized as a ``__rid`` LongType column
and every editor op is a pure transformation keyed on it.

Scale design (SURVEY.md §4 "custom work"):

* ``with_rid`` NEVER uses a global ``row_number()`` window — that is a
  single-partition sort, the canonical 100 TB anti-pattern. Instead it
  uses the zip-with-index decomposition: per-partition counts (a
  #partitions-row aggregate), cumulative offsets broadcast to every
  task, then a no-shuffle per-partition local rank. O(n) work, two
  narrow passes, no data shuffle.
* ``ordered_rid`` (rank by key columns) range-partitions first —
  Spark's sampled range partitioner — then applies the same offset
  trick, so even a total order never serializes through one task.
* Point edits compose as ``when()`` projections (an edit OVERLAY).
  Chained edits deepen the plan, not the data; ``compact()``
  checkpoints the overlay into a materialized DataFrame when the
  chain gets deep (SURVEY.md §4 edit-overlay compaction).
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_editor_spark.litexpr import lit_longs

RID = "__rid"


# ---------------------------------------------------------------------------
# ordinal maintenance
# ---------------------------------------------------------------------------

def _rid_from_partition_offsets(df: DataFrame) -> DataFrame:
    """Zip-with-index: rid = cumulative-offset(partition) + local index.

    One narrow ``mapInPandas`` pass annotates each row with its
    partition id and local row number; that result is PERSISTED so the
    partition layout is pinned (``spark_partition_id`` is NOT stable
    across separate evaluations of an unpinned plan — e.g. a local
    collection can re-split differently per job). A #partitions-row
    aggregate then yields cumulative offsets, joined back broadcast.
    No data shuffle, no sort, O(n) work; the per-partition scan order
    defines the ordinal, matching the reference's "order = load order"
    model. On a cluster the persist would be MEMORY_AND_DISK over
    executors — the same code path."""
    from pyspark import StorageLevel, TaskContext

    spark = df.sparkSession
    ann_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("__pid", T.IntegerType(), False),
            T.StructField("__lrn", T.LongType(), False),
        ]
    )

    def add_lrn(batches):
        # TaskContext gives the real partition index inside the worker;
        # spark_partition_id() is unreliable across re-evaluations of
        # local/Arrow plans.
        pid = TaskContext.get().partitionId()
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["__pid"] = pid
            pdf["__lrn"] = range(seen, seen + len(pdf))
            seen += len(pdf)
            yield pdf

    annotated = df.mapInPandas(add_lrn, schema=ann_schema).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    counts = annotated.groupBy("__pid").agg(F.count("*").alias("__n")).collect()
    offsets, acc = [], 0
    for r in sorted(counts, key=lambda r: r["__pid"]):
        offsets.append((r["__pid"], acc))
        acc += r["__n"]
    if not offsets:
        offsets = [(0, 0)]
    # JVM VALUES relation (r17 — litexpr.values_df): the broadcast of
    # a Python-parallelized local relation runs one job over
    # defaultParallelism python slices per with_rid call; a JVM
    # LocalRelation broadcasts driver-side
    from parquet_editor_spark.litexpr import values_df

    off_df = values_df(
        spark,
        [f"({int(p)},{int(o)}L)" for p, o in offsets],
        "col1 AS ___pid, col2 AS __off",
    )
    out = (
        annotated.join(F.broadcast(off_df), annotated["__pid"] == off_df["___pid"], "left")
        .withColumn(RID, F.coalesce(F.col("__off"), F.lit(0)) + F.col("__lrn"))
        .select(RID, *df.columns)
    )
    # expose the pinned cache so a session-level owner can release it
    # when the rid'd frame is discarded (EditorSession does on rebind);
    # without this handle every with_rid call leaks one persisted copy
    out._pes_rid_base = annotated
    return out


def with_rid(df: DataFrame, order: Optional[Sequence[str]] = None) -> DataFrame:
    """Attach a dense 0-based ``__rid`` ordinal.

    ``order=None`` → scan order (cheap, no shuffle — the editor's
    "row N as loaded" identity). ``order=[cols...]`` → total order by
    those columns via ``ordered_rid``.
    Idempotent: an existing ``__rid`` is trusted and kept.
    """
    if RID in df.columns:
        return df
    if order:
        return ordered_rid(df, order)
    return _rid_from_partition_offsets(df)


def ordered_rid(df: DataFrame, order: Sequence[str]) -> DataFrame:
    """Dense ordinal following a total order WITHOUT a single-partition
    window: range-repartition on the keys (sampled range partitioner →
    balanced partitions), sort within partitions, then partition-offset
    arithmetic. Equivalent to ``row_number().over(orderBy(...))`` but
    scales to arbitrary row counts."""
    if RID in df.columns:
        df = df.drop(RID)
    arranged = df.repartitionByRange(*[F.col(c) for c in order]).sortWithinPartitions(*order)
    return _rid_from_partition_offsets(arranged)


def strip_rid(df: DataFrame) -> DataFrame:
    return df.drop(RID) if RID in df.columns else df


def compact(df: DataFrame) -> DataFrame:
    """Edit-overlay compaction (SURVEY.md §4): localCheckpoint
    materializes the chained-``when`` plan so analysis time stays
    bounded after long edit sessions. On a cluster this is a
    checkpoint to reliable storage: set SPARK_GRAFT_CHECKPOINT_DIR
    (``parquet_editor_spark.boundary``)."""
    from parquet_editor_spark.boundary import stage_boundary

    return stage_boundary(df)


# ---------------------------------------------------------------------------
# typed cell write (PandasModel.setData, main.pyc:68-79)
# ---------------------------------------------------------------------------

class CellEditRejected(ValueError):
    """The v2 reference rejects edits whose string can't coerce to the
    column dtype (``dtype.type(value)`` → ValueError → ``return False``,
    main.pyc:70-79). Same contract, surfaced as an exception."""


_PY_COERCE = {
    T.LongType: int,
    T.IntegerType: int,
    T.ShortType: int,
    T.ByteType: int,
    T.DoubleType: float,
    T.FloatType: float,
}


def validate_cast(value, dtype: T.DataType):
    """Eager driver-side validation matching numpy coercion semantics
    (SURVEY.md §7d): ``int("3.5")`` fails, ``float("3")`` succeeds,
    bool accepts the checkbox-delegate literals (main.pyc:24-42)."""
    if value is None:
        return None
    for spark_t, py_t in _PY_COERCE.items():
        if isinstance(dtype, spark_t):
            try:
                return py_t(value)
            except (ValueError, TypeError) as e:
                raise CellEditRejected(f"cannot coerce {value!r} to {dtype.simpleString()}") from e
    if isinstance(dtype, T.BooleanType):
        if isinstance(value, bool):
            return value
        s = str(value).strip().lower()
        if s in ("true", "1"):
            return True
        if s in ("false", "0"):
            return False
        raise CellEditRejected(f"cannot coerce {value!r} to boolean")
    if isinstance(dtype, T.StringType):
        return str(value)
    if isinstance(dtype, (T.TimestampType, T.DateType, T.DecimalType)):
        return value  # validated lazily by the cast below
    return value


def set_cell(df: DataFrame, rid: int, column: str, value) -> DataFrame:
    """Point write with dtype-preserving coercion (main.pyc:68-79).

    Plans as a single ``when()`` projection over the table — no
    shuffle, no action; the edit applies lazily wherever the row
    lives. Invalid input raises :class:`CellEditRejected` eagerly,
    mirroring the reference's rejected-edit path."""
    if RID not in df.columns:
        raise ValueError("set_cell requires a __rid column; call with_rid first")
    dtype = df.schema[column].dataType
    coerced = validate_cast(value, dtype)
    if coerced is not None and isinstance(
        dtype, (T.TimestampType, T.TimestampNTZType, T.DateType, T.DecimalType)
    ):
        # authoritative eager probe: evaluate the cast on one literal
        # row NOW — under the session's default ANSI mode an invalid
        # timestamp/date/decimal literal otherwise throws LAZILY on
        # every later action, poisoning the bound table instead of
        # raising the reference's immediate rejected-edit error
        try:
            df.sparkSession.range(1).select(
                F.lit(coerced).cast(dtype)
            ).collect()
        except Exception as e:
            raise CellEditRejected(
                f"cannot coerce {value!r} to {dtype.simpleString()}"
            ) from e
    return df.withColumn(
        column,
        F.when(F.col(RID) == rid, F.lit(coerced).cast(dtype)).otherwise(F.col(column)),
    )


def get_cell(df: DataFrame, rid: int, column: str):
    """Point read (main.py:25-31): served by a pushdown-friendly filter;
    at scale this is a partition-pruned single-row scan."""
    rows = df.filter(F.col(RID) == rid).select(column).collect()
    return rows[0][0] if rows else None


# ---------------------------------------------------------------------------
# row ops (delete / cut / paste splice) — main.py:48-65, main.pyc:122-126
# ---------------------------------------------------------------------------

def _shift_expr(rids: Sequence[int]) -> Column:
    """How many of ``rids`` sit at-or-below each row — computed with a
    broadcast array literal + higher-order filter, so deleting k rows
    costs one narrow projection (k is edit-sized, not data-sized).
    The literal renders as ONE SQL expression (r17 — litexpr: one
    Py4J round-trip per edit batch instead of one per rid)."""
    return F.size(
        F.filter(lit_longs(int(r) for r in rids), lambda x: x < F.col(RID))
    )


def delete_rows(df: DataFrame, rids: Iterable[int]) -> DataFrame:
    """Positional delete (main.pyc:122-126) + dense re-rank.

    Re-rank is ordinal arithmetic (rid minus deleted-below count), not
    a re-sort: no shuffle, stays a narrow projection."""
    rids = sorted(set(int(r) for r in rids))
    if not rids:
        return df
    kept = df.filter(~F.col(RID).isin(rids))
    return kept.withColumn(RID, F.col(RID) - _shift_expr(rids))


def cut_rows(df: DataFrame, rids: Iterable[int]) -> tuple[DataFrame, DataFrame]:
    """Cut = clipboard extract + delete (main.py:53-56). The clipboard
    is just another DataFrame (re-ranked 0..k-1 in cut order)."""
    rids = sorted(set(int(r) for r in rids))
    clip = (
        df.filter(F.col(RID).isin(rids))
        .withColumn(
            RID,
            # litexpr (r17): one expression parse per cut
            F.size(
                F.filter(lit_longs(rids), lambda x: x < F.col(RID))
            ),
        )
    )
    return clip, delete_rows(df, rids)


def paste_rows(df: DataFrame, clip: DataFrame, pos: int) -> DataFrame:
    """Positional splice (main.py:58-65): insert clipboard rows so the
    first lands at ordinal ``pos`` — pandas' concat+reset_index as
    ordinal arithmetic + ``unionByName``. No sort, no shuffle; the
    order is carried by ``__rid`` values, not physical layout."""
    k = clip.count()
    if k == 0:
        return df
    shifted = df.withColumn(
        RID, F.when(F.col(RID) >= pos, F.col(RID) + k).otherwise(F.col(RID))
    )
    clip_at = clip.withColumn(RID, F.col(RID) + F.lit(pos))
    return shifted.unionByName(clip_at)


def insert_rows(df: DataFrame, rows: Sequence[dict], pos: int) -> DataFrame:
    """Insert literal rows at a position (editor "add row")."""
    spark = df.sparkSession
    schema = T.StructType([f for f in df.schema.fields if f.name != RID])
    clip = with_rid(spark.createDataFrame([tuple(r.get(f.name) for f in schema.fields) for r in rows], schema))
    return paste_rows(df, clip, pos)


def selection_summary(df: DataFrame, rids: Iterable[int]) -> DataFrame:
    """Multi-select metadata (main.py:107-123: the status-bar summary
    of selected rows): count + per-numeric-column sum/mean of the
    selected ordinals, computed server-side — the selection never
    leaves the cluster."""
    from parquet_editor_spark.operators.query import numeric_columns

    rids = sorted(set(int(r) for r in rids))
    sel = df.filter(F.col(RID).isin(rids))
    aggs = [F.count("*").alias("n_selected")]
    for c in numeric_columns(df):
        if c == RID:
            continue
        aggs.append(F.round(F.sum(c), 4).alias(f"sum_{c}"))
        aggs.append(F.round(F.avg(c), 4).alias(f"avg_{c}"))
    return sel.agg(*aggs)


# ---------------------------------------------------------------------------
# column ops (insert_column/remove_column, main.pyc:102-120)
# ---------------------------------------------------------------------------

#: dtype-string → typed default fill, main.pyc:104-111.
def default_for_dtype(dtype: str):
    d = dtype.lower()
    if d in ("bool", "boolean"):
        return False
    if "int" in d or d in ("long", "short", "byte", "bigint", "smallint", "tinyint"):
        return 0
    if "float" in d or "double" in d or "decimal" in d:
        return 0.0
    return None


_DTYPE_ALIASES = {
    "bool": "boolean", "int": "int", "int32": "int", "int64": "bigint",
    "long": "bigint", "float": "float", "float32": "float",
    "float64": "double", "double": "double", "str": "string",
    "string": "string", "object": "string", "datetime64[ns]": "timestamp",
    "timestamp": "timestamp",
}


def add_column(
    df: DataFrame, name: str, dtype: str = "string", pos: Optional[int] = None, default=None
) -> DataFrame:
    """Insert a typed column at a position with the reference's default
    fill (``np.full(n, default, dtype)``, main.pyc:102-114): bool→False,
    int→0, float→0.0, else null. Position is honored by a reordered
    ``select`` — pure projection, zero data movement."""
    spark_type = _DTYPE_ALIASES.get(dtype.lower(), dtype)
    fill = default if default is not None else default_for_dtype(dtype)
    out = df.withColumn(name, F.lit(fill).cast(spark_type))
    cols = [c for c in df.columns]
    insert_at = len(cols) if pos is None else min(pos + (1 if RID in cols else 0), len(cols))
    cols.insert(insert_at, name)
    return out.select(*cols)


def drop_column(df: DataFrame, which: int | str) -> DataFrame:
    """Drop by position (main.pyc:116-120) or by name."""
    if isinstance(which, int):
        data_cols = [c for c in df.columns if c != RID]
        which = data_cols[which]
    return df.drop(which)


def rename_column(df: DataFrame, old: str, new: str) -> DataFrame:
    """README-parity "modify columns" (readme.md:8; no reference code)."""
    return df.withColumnRenamed(old, new)


def cast_column(df: DataFrame, column: str, dtype: str) -> DataFrame:
    """Typed column modification (README parity, SURVEY.md §2.2)."""
    return df.withColumn(column, F.col(column).cast(_DTYPE_ALIASES.get(dtype.lower(), dtype)))
