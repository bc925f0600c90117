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


def _require_local_path(path: str, op: str) -> str:
    """Manifest/partition maintenance here walks the table directory
    with driver-local ``os``/``shutil`` calls, which see nothing on
    HDFS/S3 even though Spark itself could write there.  Failing loud
    beats silently committing a manifest that lists no files.  Accepts
    plain paths and ``file:`` URIs (normalized); rejects any other
    scheme — route those tables through a real table format's catalog
    (Iceberg/Delta) or copy locally first."""
    import re

    # Spark accepts both "file:///p" and single-slash "file:/p" URIs —
    # match any "scheme:/..." form, not just "scheme://" (a single-slash
    # file: URI used to slip through unnormalized and os.makedirs then
    # created a literal "file:" directory under cwd).
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]{1,}):/(.*)$", path)
    if m is None:
        return path
    if m.group(1).lower() == "file":
        return "/" + m.group(2).lstrip("/")
    raise ValueError(
        f"{op} maintains table metadata with driver-local filesystem "
        f"calls and only supports local paths; got scheme "
        f"{m.group(1)!r} in {path!r}"
    )


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
    # null-safe anti join: a NULL key never equi-matches, so a plain
    # left_anti would KEEP the target's NULL-key row and the union
    # would append the update's — duplicating instead of replacing
    # (and breaking idempotent replay in the streaming sibling)
    upk = up.select(*[F.col(k).alias(f"__u_{k}") for k in keys])
    cond = None
    for k in keys:
        eq = F.col(k).eqNullSafe(F.col(f"__u_{k}"))
        cond = eq if cond is None else cond & eq
    kept = target.join(upk, cond, "left_anti")
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


def table_diff(
    base: DataFrame,
    current: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Snapshot diff (CDC between two table versions): one row per key
    whose state differs, tagged ``change_type`` ∈ {added, removed,
    changed}, with the compared columns from both sides
    (``<col>_base`` / ``<col>_curr``).  Unchanged keys are dropped —
    at 100 TB the diff output is the small side, and emitting it (not
    the match set) is what keeps the operator's output proportional to
    the churn rate, not the table size.

    Comparison is null-safe per packed struct (``<=>``), so NULL→NULL
    is unchanged and NULL→value is changed — mirrored in the oracle
    with IS DISTINCT FROM.

    Scale shape: one full outer join co-partitioned on the key columns
    (single shuffle each side, AQE picks SMJ/hash; skew-join handles a
    hot key) and a codegen'd CASE — no window, no collect.  Both
    inputs must be key-unique (dedupe upstream; double keys would
    cross-multiply in any engine's MERGE/diff)."""
    ks = list(keys)
    # explicit None check: compare_cols=[] means a pure existence diff
    # (added/removed only), NOT "fall back to every column"
    src_cols = base.columns if compare_cols is None else list(compare_cols)
    cmp_cols = [c for c in src_cols if c not in ks]
    # presence markers: a NULL key row present on one side must NOT
    # read as absent, so presence is a literal flag that survives the
    # outer join as NULL only when the side genuinely has no row
    b = base.select(
        *[F.col(k).alias(f"__kb_{k}") for k in ks],
        *[F.col(c).alias(f"{c}_base") for c in cmp_cols],
        F.lit(True).alias("__in_b"),
    )
    c = current.select(
        *[F.col(k).alias(f"__kc_{k}") for k in ks],
        *[F.col(x).alias(f"{x}_curr") for x in cmp_cols],
        F.lit(True).alias("__in_c"),
    )
    cond = None
    for k in ks:
        eq = F.col(f"__kb_{k}").eqNullSafe(F.col(f"__kc_{k}"))
        cond = eq if cond is None else cond & eq
    j = b.join(c, cond, "full_outer")
    in_base = F.coalesce(F.col("__in_b"), F.lit(False))
    in_curr = F.coalesce(F.col("__in_c"), F.lit(False))
    if cmp_cols:
        state_b = F.struct(*[F.col(f"{x}_base") for x in cmp_cols])
        state_c = F.struct(*[F.col(f"{x}_curr") for x in cmp_cols])
        differs = ~state_b.eqNullSafe(state_c)
    else:
        differs = F.lit(False)
    change = (
        F.when(~in_base, F.lit("added"))
        .when(~in_curr, F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(
                    F.col(f"__kb_{k}"), F.col(f"__kc_{k}")
                ).alias(k)
                for k in ks
            ],
            "change_type",
            *[F.col(f"{x}_base") for x in cmp_cols],
            *[F.col(f"{x}_curr") for x in cmp_cols],
        )
    )


def snapshot_write(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
) -> int:
    """Versioned table write with manifest-tracked snapshots — the
    Iceberg/Delta time-travel core reduced to its minimal honest form
    on plain parquet.  Each call writes the batch's data files under
    ``<path>/data/v<N>/`` and commits ``<path>/_manifests/v<N>.json``
    listing EVERY data directory that makes up snapshot N:

    - ``mode="overwrite"`` → the new snapshot is just this batch;
    - ``mode="append"``    → the new snapshot is the previous
      snapshot's directory list plus this batch (old files are never
      rewritten or touched — append is a metadata commit).

    Returns the new version number (1-based).  Readers never list the
    table directory: :func:`snapshot_read` loads exactly the manifest's
    directories, so at 100 TB a snapshot read costs one tiny JSON read
    plus the pruned parquet scans — no O(files) listing, and
    historical versions stay readable until their directories are
    garbage-collected.  The manifest write is a single driver-side
    JSON dump (bytes, not data), the commit point of the snapshot."""
    import json
    import os

    if mode not in ("overwrite", "append"):
        # validate BEFORE writing anything: a data write with no
        # manifest commit would orphan data/vN
        raise ValueError(f"unknown snapshot mode {mode!r}")
    path = _require_local_path(path, "snapshot_write")
    man_dir = os.path.join(path, "_manifests")
    os.makedirs(man_dir, exist_ok=True)
    versions = sorted(
        int(f[1:-5])
        for f in os.listdir(man_dir)
        if f.startswith("v") and f.endswith(".json")
    )
    # version allocation tolerates orphaned data dirs (a crash between
    # the data write and the manifest commit leaves data/vN with no
    # manifest): next version = max over BOTH namespaces + 1, so the
    # orphan is skipped, never collided with — uncommitted data is
    # unreachable (no manifest lists it) and GC can reap it later
    data_root = os.path.join(path, "data")
    orphans = (
        [
            int(d[1:])
            for d in os.listdir(data_root)
            if d.startswith("v") and d[1:].isdigit()
        ]
        if os.path.isdir(data_root)
        else []
    )
    ver = max(versions + orphans, default=0) + 1
    data_dir = os.path.join(path, "data", f"v{ver}")
    df.write.mode("error").parquet(data_dir)
    dirs = [f"data/v{ver}"]
    if mode == "append" and versions:
        with open(os.path.join(man_dir, f"v{versions[-1]}.json")) as fh:
            dirs = json.load(fh)["dirs"] + dirs
    tmp = os.path.join(man_dir, f".v{ver}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": ver, "mode": mode, "dirs": dirs}, fh)
    os.replace(tmp, os.path.join(man_dir, f"v{ver}.json"))
    return ver


def snapshot_read(
    spark,
    path: str,
    version: int | None = None,
) -> DataFrame:
    """Time-travel read of :func:`snapshot_write` output: load the
    union of the data directories recorded in manifest ``version``
    (default: latest).  Passing multiple paths to one ``read.parquet``
    keeps it a single scan relation — partition pruning, pushdown and
    schema merge behave exactly as for an unversioned table."""
    import json
    import os

    path = _require_local_path(path, "snapshot_read")
    man_dir = os.path.join(path, "_manifests")
    if version is None:
        version = max(
            int(f[1:-5])
            for f in os.listdir(man_dir)
            if f.startswith("v") and f.endswith(".json")
        )
    with open(os.path.join(man_dir, f"v{version}.json")) as fh:
        man = json.load(fh)
    return spark.read.parquet(
        *[os.path.join(path, d) for d in man["dirs"]]
    )


def compact_files(
    spark,
    src_path: str,
    dst_path: str,
    target_rows_per_file: int,
) -> DataFrame:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_rows_per_file`` rows each.  The small-files problem is a
    pure metadata tax at 100 TB (NameNode/listing pressure, per-file
    open cost, tiny row groups defeating min/max skipping), and the
    fix is a row-preserving rewrite — no shuffle of *content*, just
    placement.

    Uses ``coalesce`` (narrow, no shuffle) when merging down to fewer
    files; a round-robin ``repartition`` only if the source is so
    skewed that a file exceeds the target and must be split.  Row
    count is computed from parquet footers (metadata-only), not a
    scan.  Returns the compacted frame re-read from ``dst_path``."""
    import math

    import pyarrow.dataset as pads

    ds = pads.dataset(src_path, format="parquet")
    n_rows = ds.count_rows()  # footer metadata, no data read
    n_src_files = len(ds.files)
    n_out = max(1, math.ceil(n_rows / max(1, target_rows_per_file)))
    df = spark.read.parquet(src_path)
    out = df.coalesce(n_out) if n_out <= n_src_files else df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst_path)
    return spark.read.parquet(dst_path)


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


def with_hilbert(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int = 8,
    out_col: str = "hval",
) -> DataFrame:
    """Append the 2-D Hilbert-curve index of (``xcol``, ``ycol``) on a
    2^bits × 2^bits grid — the locality-preserving successor to the
    Morton key: consecutive curve positions are always grid-adjacent,
    so range slices of the key cover tighter rectangles in BOTH
    dimensions than Z-order's (which jumps at every power-of-two
    boundary).  Inputs must already lie in [0, 2^bits).

    The classic per-bit rotate/reflect recurrence runs as ``bits``
    stacked projections over running (x, y, d) columns — pure
    shift/mask/CASE expressions, whole-stage codegen, no UDF.  One
    projection per bit, NOT one nested expression: each step's x/y
    feed the next step 2-3 times, so inlining would grow the tree
    ~3^bits (Catalyst's CollapseProject leaves multiply-referenced
    non-cheap aliases as separate projections for exactly this
    reason).  :func:`hilbert_sql_ctes` emits the byte-identical
    arithmetic as chained SQL CTEs from the same recurrence for the
    differential oracle."""
    base = df.columns
    out = df.select(
        *base,
        F.col(xcol).cast("long").alias("__hx"),
        F.col(ycol).cast("long").alias("__hy"),
        F.lit(0).cast("long").alias("__hd"),
    )
    s = 1 << (bits - 1)
    while s > 0:
        x, y, d = F.col("__hx"), F.col("__hy"), F.col("__hd")
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        nd = d + F.lit(s * s) * (rx * 3).bitwiseXOR(ry)
        # quadrant rotate/reflect: ry==0 → swap axes (mirroring both
        # when rx==1) so the sub-curve orientation matches
        nx = F.when(
            ry == 0, F.when(rx == 1, F.lit(s - 1) - y).otherwise(y)
        ).otherwise(x)
        ny = F.when(
            ry == 0, F.when(rx == 1, F.lit(s - 1) - x).otherwise(x)
        ).otherwise(y)
        out = out.select(
            *base,
            nx.alias("__hx"),
            ny.alias("__hy"),
            nd.alias("__hd"),
        )
        s >>= 1
    return out.select(*base, F.col("__hd").alias(out_col))


def hilbert_sql_ctes(
    base_sql: str,
    keep_cols: Sequence[str],
    xexpr: str,
    yexpr: str,
    bits: int = 8,
    out_col: str = "hval",
) -> str:
    """The exact SQL mirror of :func:`with_hilbert`: the same per-bit
    recurrence as a chain of CTEs over running (x, y, d) columns —
    linear text size, generated from one spec so both engines compute
    byte-identical keys.  ``base_sql`` provides the source relation;
    ``keep_cols`` ride through unchanged."""
    keep = ", ".join(keep_cols)
    parts = [
        f"h0 AS (SELECT {keep}, CAST({xexpr} AS BIGINT) AS _h_x, "
        f"CAST({yexpr} AS BIGINT) AS _h_y, CAST(0 AS BIGINT) AS _h_d "
        f"FROM ({base_sql}))"
    ]
    s = 1 << (bits - 1)
    step = 0
    while s > 0:
        rx = f"(CASE WHEN (_h_x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (_h_y & {s}) > 0 THEN 1 ELSE 0 END)"
        parts.append(
            f"h{step + 1} AS (SELECT {keep}, "
            f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
            f"THEN {s - 1} - _h_y ELSE _h_y END) ELSE _h_x END) AS _h_x, "
            f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
            f"THEN {s - 1} - _h_x ELSE _h_x END) ELSE _h_y END) AS _h_y, "
            f"(_h_d + {s * s} * xor({rx} * 3, {ry})) AS _h_d "
            f"FROM h{step})"
        )
        s >>= 1
        step += 1
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT {keep}, _h_d AS {out_col} FROM h{step}"
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int = 32,
    curve: str = "morton",
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
    itself.

    ``curve="hilbert"`` (2 columns only) clusters on the Hilbert
    index instead — strictly better locality than Morton (no
    power-of-two jumps), same plan shape plus the per-bit projection
    stack of :func:`with_hilbert`."""
    if curve not in ("morton", "hilbert"):
        raise ValueError(f"unknown curve {curve!r}")
    if curve == "hilbert" and len(cols) != 2:
        raise ValueError("hilbert clustering is 2-D; pass exactly 2 cols")
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
            # multiply in DOUBLE: (col-mn)*top in int64 overflows once
            # the column range exceeds ~2^63/top (epoch-micros over a
            # few years) — garbage keys, or an ANSI overflow error
            (F.col(c).cast("long") - F.col(f"__mn_{c}"))
            * F.lit(float(top))
            / (F.col(f"__mx_{c}") - F.col(f"__mn_{c}"))
        )
        .cast("long")
        for c in cols
    ]
    joined = df.crossJoin(F.broadcast(stats))
    if curve == "hilbert":
        keyed = with_hilbert(
            joined.withColumn("__sx", scaled_cols[0]).withColumn(
                "__sy", scaled_cols[1]
            ),
            "__sx",
            "__sy",
            bits,
            out_col="__z",
        ).drop("__sx", "__sy")
    else:
        keyed = joined.withColumn("__z", zorder_value(scaled_cols, bits))
    (
        keyed.drop(
            *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
        )
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def purge_keys(
    spark,
    path: str,
    key_col: str,
    keys: DataFrame,
    part_col: str,
) -> list:
    """GDPR-style surgical delete from a hive-partitioned parquet
    table: remove every row whose ``key_col`` appears in ``keys``,
    rewriting ONLY the partitions that contain such rows.  Returns the
    list of partition values that were rewritten.

    At 100 TB the entire point is what this does NOT do: untouched
    partitions are never read for the rewrite, never rewritten, and
    their files keep their identity (pinned by mtime in the tests).
    The discovery pass scans just (key, partition) — column-pruned,
    broadcast-semi-joined against the (small by contract) key set —
    and the rewrite uses dynamic partition overwrite so only the
    affected partition directories are replaced.  A partition whose
    every row is purged yields no rows for dynamic overwrite to
    replace, so it is removed explicitly — the classic dynamic-mode
    leak.

    This is the honest plain-parquet analog of DELETE in a table
    format (Delta/Iceberg would write deletion vectors instead of
    rewriting; the partition-pruning shape is the same)."""
    import os
    import shutil
    import urllib.parse

    path = _require_local_path(path, "purge_keys")

    def _membership(values):
        """Null-safe partition predicate: isin() never matches NULL."""
        non_null = [v for v in values if v is not None]
        cond = F.lit(False)
        if non_null:
            cond = cond | F.col(part_col).isin(non_null)
        if any(v is None for v in values):
            cond = cond | F.col(part_col).isNull()
        return cond

    def _dirs_for(values):
        """Resolve partition VALUES to on-disk directories: Spark
        hive-escapes special chars (%XX) and writes NULL as
        __HIVE_DEFAULT_PARTITION__, so the raw value is NOT the dir
        name — decode the listing instead of re-encoding the value."""
        wanted = {None if v is None else str(v) for v in values}
        out = []
        prefix = f"{part_col}="
        for d in os.listdir(path):
            if not d.startswith(prefix):
                continue
            raw = d[len(prefix):]
            val = (
                None
                if raw == "__HIVE_DEFAULT_PARTITION__"
                else urllib.parse.unquote(raw)
            )
            if val in wanted:
                out.append(os.path.join(path, d))
        return out

    bkeys = F.broadcast(keys)
    tbl = spark.read.parquet(path)
    affected = [
        r[0]
        for r in tbl.join(bkeys, key_col, "semi")
        .select(part_col)
        .distinct()
        .collect()
    ]
    if not affected:
        return []
    remaining = tbl.filter(_membership(affected)).join(
        bkeys, key_col, "left_anti"
    )
    survivors = {
        r[0]
        for r in remaining.select(part_col).distinct().collect()
    }
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        if survivors:
            remaining.write.mode("overwrite").partitionBy(part_col).parquet(
                path
            )
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", old_mode
        )
    fully_purged = set(affected) - survivors
    for d in _dirs_for(fully_purged):
        shutil.rmtree(d)
    return sorted(affected, key=lambda v: (v is None, v))


def refresh_sum_agg(
    matview: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """Incremental materialized-view maintenance for SUM/COUNT
    aggregates: fold a delta batch into an existing per-key aggregate
    without touching the base table — ``new = groupBy(keys) over
    (matview ∪ agg(delta))``.  SUM and COUNT are the self-maintainable
    aggregates (AVG derives as sum/n downstream; MIN/MAX are NOT
    refreshable under deletes and are deliberately absent).

    Scale shape: the delta aggregates first (map-side combine over
    the batch), then one hash agg over matview ∪ delta-agg — cost
    proportional to |matview| + |delta|, never the base table.  Keys
    present only in the delta appear; existing keys accumulate."""
    d = delta.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count("*").cast("long").alias(count_col),
    )
    both = matview.select(*keys, *sum_cols, count_col).unionByName(d)
    return both.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.sum(count_col).cast("long").alias(count_col),
    )
