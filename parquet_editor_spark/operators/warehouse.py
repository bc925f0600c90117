"""Warehouse-maintenance operators: batch MERGE upsert, SCD type-2
history build, and Z-order multi-column clustering for data skipping.

No reference counterpart (the reference is a single-table editor,
SURVEY.md §0.1) — these are the table-maintenance operations a
lakehouse pipeline needs at 100 TB, expressed with stock DataFrame
ops so Catalyst sees through every one of them. The streaming sibling
of ``merge_upsert`` is ``streaming.stream.upsert_stream_parquet``
(foreachBatch MERGE); this is the batch planner's path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    broadcast_updates: bool = False,
) -> DataFrame:
    """MERGE INTO shape on immutable DataFrames: rows of ``target``
    whose key appears in ``updates`` are replaced by the update row;
    new keys are inserted; unmatched target rows pass through.

    ``updates`` must be key-unique (enforce upstream with
    ``dropDuplicates(keys)`` — silently double-applying an update is
    the classic MERGE hazard, so this function does NOT hide it).

    Scale shape: one anti join on the key columns (broadcast when the
    update batch is small — the common CDC case — else shuffled
    hash/SMJ chosen by AQE) plus a union; no window, no sort, no
    full-table rewrite beyond what any immutable-file table format
    already does on MERGE."""
    up = F.broadcast(updates) if broadcast_updates else updates
    kept = target.join(up.select(*keys), list(keys), "left_anti")
    return kept.unionByName(updates)


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    attr_cols: Sequence[str],
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    log: one row per (key, attribute-state) interval with
    ``valid_from`` / ``valid_to`` (null = current) and ``is_current``.

    Consecutive log rows with identical attributes collapse into one
    interval (the no-op-change filter runs BEFORE the closing lead()
    so a suppressed row never truncates its interval).

    Scale shape: two windows, both partitioned by the natural key —
    state comparison against lag(), then lead() over the surviving
    change rows. Nothing global; the per-key history is tiny compared
    to the log, and both windows share one shuffle+sort on
    (key, order_cols). ``order_cols`` must be a TOTAL order within
    each key (tie-break with a unique id) — ``valid_from``/``valid_to``
    carry the first order column.

    State comparison is null-safe (``<=>`` / IS NOT DISTINCT FROM):
    a run of NULL attribute values collapses into one interval, and a
    NULL→value or value→NULL transition opens a new one — the lag()
    of the packed state struct is NULL only on the first row per key
    (struct() never evaluates to NULL), so ``~eqNullSafe`` covers the
    is-first case too."""
    from pyspark.sql import Window as W

    ts_col = order_cols[0]
    w = W.partitionBy(key_col).orderBy(*order_cols)
    state = F.struct(*[F.col(c) for c in attr_cols])
    changed = ~F.lag(state).over(w).eqNullSafe(state)
    changes = df.withColumn("__chg", changed).filter(F.col("__chg"))
    w2 = W.partitionBy(key_col).orderBy(*order_cols)
    return changes.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def zorder_value(cols: Sequence[str | Column], bits: int = 16) -> Column:
    """Z-order (Morton) key: interleave the low ``bits`` bits of each
    integer column so rows close in EVERY dimension get close keys.
    Bit ``j`` of column ``c`` lands at position ``j·k + c`` for ``k``
    columns; the result fits a BIGINT for ``bits·k ≤ 63``.

    Pure shift/mask/or expression — whole-stage codegen, no UDF, and
    byte-identical in any engine with 64-bit integer ops (the
    differential oracle mirrors it in SQL)."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols × {bits} bits exceeds BIGINT")
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("long") for c in cols
    ]
    z = F.lit(0).cast("long")
    for j in range(bits):
        for c, col in enumerate(cs):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(col, j).bitwiseAND(F.lit(1)), j * k + c
                )
            )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int = 32,
) -> None:
    """Cluster a table on the Z-order key of ``cols`` and write
    parquet: range-partition then sort by the interleaved key, so
    every output file covers a narrow range of EVERY clustering
    column and parquet min/max stats prune multi-dimension range
    queries — the multi-column generalization of the single-column
    range-clustered write (io.py save_clustered).

    Each column is min-max scaled to the full ``bits`` width first —
    raw interleaving of unequal domains degenerates to
    largest-domain-major order (a 4-bit domain contributes nothing to
    the high interleaved bits), which is exactly the failure the
    per-file range test pins.

    Scale shape: one tiny min/max agg broadcast back, then one range
    shuffle (sampled bounds) + per-partition sort; the sort key is a
    single BIGINT, so the shuffle carries no wider rows than the data
    itself."""
    top = (1 << bits) - 1
    stats = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.min(c).cast("long").alias(f"__mn_{c}"),
                F.max(c).cast("long").alias(f"__mx_{c}"),
            )
        ]
    )
    scaled_cols = [
        F.when(
            F.col(f"__mx_{c}") == F.col(f"__mn_{c}"), F.lit(0)
        )
        .otherwise(
            (F.col(c).cast("long") - F.col(f"__mn_{c}"))
            * top
            / (F.col(f"__mx_{c}") - F.col(f"__mn_{c}"))
        )
        .cast("long")
        for c in cols
    ]
    z = zorder_value(scaled_cols, bits)
    (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__z", z)
        .drop(*[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols])
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
