"""Warehouse-maintenance operators: MERGE upsert, SCD2 history,
Z-order clustering — semantics plus the physical clustering effect."""

import glob

import pytest
from pyspark.sql import functions as F

from parquet_editor_spark.operators import warehouse as WH


def test_merge_upsert_replaces_inserts_keeps(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    out = {r["k"]: (r["s"], r["v"])
           for r in WH.merge_upsert(target, updates, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_scd2_intervals_collapse_and_current_flag(spark):
    rows = [
        # key 1: a a b a → intervals a[t1,t3) b[t3,t4) a[t4,∞)
        (1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "a"),
        # key 2: single state → one open interval
        (2, 1, "x"),
    ]
    df = spark.createDataFrame(rows, "k long, t long, attr string")
    out = sorted(
        (r["k"], r["valid_from"], r["attr"], r["valid_to"], r["is_current"])
        for r in WH.scd2_intervals(df, "k", ["t"], ["attr"]).collect()
    )
    assert out == [
        (1, 1, "a", 3, False),
        (1, 3, "b", 4, False),
        (1, 4, "a", None, True),
        (2, 1, "x", None, True),
    ]


def test_scd2_intervals_null_state_null_safe(spark):
    """NULL attribute values: a NULL→NULL run collapses into one
    interval, NULL→value and value→NULL each open a new one (IS
    DISTINCT FROM semantics on both engines)."""
    rows = [
        (1, 1, None), (1, 2, None), (1, 3, "b"), (1, 4, None),
    ]
    df = spark.createDataFrame(rows, "k long, t long, attr string")
    out = sorted(
        (r["k"], r["valid_from"], r["attr"], r["valid_to"], r["is_current"])
        for r in WH.scd2_intervals(df, "k", ["t"], ["attr"]).collect()
    )
    assert out == [
        (1, 1, None, 3, False),
        (1, 3, "b", 4, False),
        (1, 4, None, None, True),
    ]


def test_zorder_value_interleaves_bits(spark):
    # x=0b101 (5), y=0b011 (3) → z bits: y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1
    df = spark.range(1).select(
        F.lit(5).alias("x"), F.lit(3).alias("y")
    )
    z = df.select(WH.zorder_value(["x", "y"], 3).alias("z")).collect()[0]["z"]
    assert z == 0b011011
    with pytest.raises(ValueError):
        WH.zorder_value(["x", "y"], 32)


def test_zorder_write_narrows_per_file_ranges(spark, sf_dir, tmp_path):
    """The point of Z-order: every output file covers a narrow range
    of EVERY clustering column, so parquet min/max stats prune 2-D
    range queries. Compare per-file stat ranges against an unordered
    write of the same data."""
    import pyarrow.parquet as pq

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    plain, zordered = str(tmp_path / "plain"), str(tmp_path / "zorder")
    li.repartition(16).write.parquet(plain)
    WH.zorder_write(li, zordered, ["l_partkey", "l_suppkey"], 16, num_files=16)

    def mean_range(path, col):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(g).column(idx).statistics.min
                     for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max
                     for g in range(md.num_row_groups))
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    # a z-range slice isn't a perfect axis-aligned box, so the per-dim
    # shrink is looser than the 1/√n_files ideal — 0.6 still proves
    # real 2-D clustering (round-robin files span the whole domain)
    for col in ("l_partkey", "l_suppkey"):
        assert mean_range(zordered, col) < 0.6 * mean_range(plain, col), col
    # and the data survives intact
    assert (
        spark.read.parquet(zordered).count() == li.count()
    )


def test_hilbert_bijective_and_adjacent(spark):
    """The two properties that define a space-filling curve (any
    orientation): every cell of the 16×16 grid gets a distinct index
    in [0, 256), and consecutive indices are grid-adjacent (Manhattan
    distance exactly 1) — the locality Morton keys lack at
    power-of-two boundaries."""
    n = 16
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )
    rows = WH.with_hilbert(grid, "x", "y", bits=4).collect()
    pos = {r["hval"]: (r["x"], r["y"]) for r in rows}
    assert len(pos) == n * n and min(pos) == 0 and max(pos) == n * n - 1
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_sql_mirror_matches(spark):
    """hilbert_sql_ctes generates the byte-identical recurrence for
    DuckDB — one spec, two engines."""
    import duckdb
    import pandas as pd

    n = 8
    gdf = pd.DataFrame(
        [(i % n, i // n) for i in range(n * n)], columns=["x", "y"]
    )
    con = duckdb.connect()
    con.register("grid", gdf)
    sql = WH.hilbert_sql_ctes(
        "SELECT x, y FROM grid", ["x", "y"], "x", "y", bits=3
    )
    got = {(r[0], r[1]): r[2] for r in con.execute(sql).fetchall()}
    want = {
        (r["x"], r["y"]): r["hval"]
        for r in WH.with_hilbert(
            spark.createDataFrame(gdf), "x", "y", bits=3
        ).collect()
    }
    assert got == want


def test_zorder_write_hilbert_curve_narrows_ranges(spark, sf_dir, tmp_path):
    """curve='hilbert' must deliver the same data-skipping property
    as Morton: per-file min/max ranges on both cluster columns shrink
    vs an unordered write."""
    import glob

    import pyarrow.parquet as pq

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    plain, hil = str(tmp_path / "plain"), str(tmp_path / "hilbert")
    li.repartition(16).write.parquet(plain)
    WH.zorder_write(
        li, hil, ["l_partkey", "l_suppkey"], 8, num_files=16,
        curve="hilbert",
    )

    def mean_range(path, col):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(g).column(idx).statistics.min
                     for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max
                     for g in range(md.num_row_groups))
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    for col in ("l_partkey", "l_suppkey"):
        assert mean_range(hil, col) < 0.6 * mean_range(plain, col), col
    assert spark.read.parquet(hil).count() == li.count()
    with pytest.raises(ValueError):
        WH.zorder_write(li, hil, ["l_partkey"], curve="hilbert")


# --- table_diff -----------------------------------------------------------


def test_table_diff_classifies_added_removed_changed(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    curr = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    out = {
        r["k"]: r["change_type"]
        for r in WH.table_diff(base, curr, ["k"]).collect()
    }
    assert out == {2: "changed", 3: "removed", 4: "added"}


def test_table_diff_null_safe_compare(spark):
    """NULL→NULL is unchanged; NULL→value and value→NULL are changed."""
    base = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "k long, s string"
    )
    curr = spark.createDataFrame(
        [(1, None), (2, "y"), (3, None)], "k long, s string"
    )
    out = {
        r["k"]: r["change_type"]
        for r in WH.table_diff(base, curr, ["k"], ["s"]).collect()
    }
    assert out == {2: "changed", 3: "changed"}


def test_table_diff_carries_both_sides(spark):
    base = spark.createDataFrame([(1, 10.0)], "k long, v double")
    curr = spark.createDataFrame([(1, 11.0)], "k long, v double")
    r = WH.table_diff(base, curr, ["k"], ["v"]).collect()[0]
    assert (r["v_base"], r["v_curr"]) == (10.0, 11.0)


# --- snapshots / time travel ----------------------------------------------


def test_snapshot_append_is_metadata_only_and_time_travels(spark, tmp_path):
    p = str(tmp_path / "tbl")
    a = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    b = spark.createDataFrame([(3, "c")], "k long, s string")
    v1 = WH.snapshot_write(a, p, mode="overwrite")
    files_v1 = set(glob.glob(f"{p}/data/v1/*.parquet"))
    mtimes = {f: __import__("os").path.getmtime(f) for f in files_v1}
    v2 = WH.snapshot_write(b, p, mode="append")
    assert (v1, v2) == (1, 2)
    # v1's data files untouched by the append commit
    assert {f: __import__("os").path.getmtime(f) for f in files_v1} == mtimes
    got_v1 = sorted(r["k"] for r in WH.snapshot_read(spark, p, 1).collect())
    got_v2 = sorted(r["k"] for r in WH.snapshot_read(spark, p, 2).collect())
    latest = sorted(r["k"] for r in WH.snapshot_read(spark, p).collect())
    assert got_v1 == [1, 2]
    assert got_v2 == [1, 2, 3]
    assert latest == [1, 2, 3]


def test_snapshot_overwrite_resets_lineage(spark, tmp_path):
    p = str(tmp_path / "tbl")
    WH.snapshot_write(
        spark.createDataFrame([(1,)], "k long"), p, mode="overwrite"
    )
    WH.snapshot_write(
        spark.createDataFrame([(2,)], "k long"), p, mode="overwrite"
    )
    assert [r["k"] for r in WH.snapshot_read(spark, p).collect()] == [2]
    assert [r["k"] for r in WH.snapshot_read(spark, p, 1).collect()] == [1]


def test_snapshot_bad_mode_raises(spark, tmp_path):
    with pytest.raises(ValueError):
        WH.snapshot_write(
            spark.createDataFrame([(1,)], "k long"),
            str(tmp_path / "t"),
            mode="merge",
        )


# --- compaction -----------------------------------------------------------


def test_compact_files_reduces_count_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(32).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 32
    out = WH.compact_files(spark, src, dst, target_rows_per_file=5_000)
    assert len(glob.glob(f"{dst}/*.parquet")) == 2
    assert out.count() == 10_000
    assert out.agg(F.sum("v")).collect()[0][0] == 2 * (9_999 * 10_000 // 2)


def test_compact_files_splits_oversized(spark, tmp_path):
    """A single giant file gets SPLIT when it exceeds the target."""
    src = str(tmp_path / "big")
    dst = str(tmp_path / "split")
    spark.range(9_000).coalesce(1).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 1
    out = WH.compact_files(spark, src, dst, target_rows_per_file=3_000)
    assert len(glob.glob(f"{dst}/*.parquet")) == 3
    assert out.count() == 9_000


# --- GDPR purge -----------------------------------------------------------


def test_purge_keys_rewrites_only_affected_partitions(spark, tmp_path):
    import os

    p = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "B"), (5, "C")],
        "k long, part string",
    )
    df.write.partitionBy("part").parquet(p)
    c_files = sorted(glob.glob(f"{p}/part=C/*.parquet"))
    c_mtimes = [os.path.getmtime(f) for f in c_files]
    keys = spark.createDataFrame([(2,), (3,)], "k long")
    rewritten = WH.purge_keys(spark, p, "k", keys, "part")
    assert rewritten == ["A", "B"]
    # purged rows gone, everything else intact
    left = sorted(r["k"] for r in spark.read.parquet(p).collect())
    assert left == [1, 4, 5]
    # partition C untouched: same files, same mtimes
    assert sorted(glob.glob(f"{p}/part=C/*.parquet")) == c_files
    assert [os.path.getmtime(f) for f in c_files] == c_mtimes


def test_purge_keys_removes_fully_purged_partition(spark, tmp_path):
    import os

    p = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "A"), (2, "B")], "k long, part string"
    ).write.partitionBy("part").parquet(p)
    keys = spark.createDataFrame([(2,)], "k long")
    WH.purge_keys(spark, p, "k", keys, "part")
    assert not os.path.isdir(f"{p}/part=B")
    assert [r["k"] for r in spark.read.parquet(p).collect()] == [1]


def test_purge_keys_no_match_is_noop(spark, tmp_path):
    p = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "A")], "k long, part string"
    ).write.partitionBy("part").parquet(p)
    keys = spark.createDataFrame([(99,)], "k long")
    assert WH.purge_keys(spark, p, "k", keys, "part") == []
    assert spark.read.parquet(p).count() == 1


# --- incremental aggregate refresh ---------------------------------------


def test_refresh_sum_agg_folds_delta(spark):
    mat = spark.createDataFrame(
        [("a", 10, 2), ("b", 20, 3)], "g string, s long, n long"
    )
    delta = spark.createDataFrame(
        [("b", 5), ("b", 5), ("c", 7)], "g string, s long"
    )
    out = {
        r["g"]: (r["s"], r["n"])
        for r in WH.refresh_sum_agg(mat, delta, ["g"], ["s"]).collect()
    }
    assert out == {"a": (10, 2), "b": (30, 5), "c": (7, 1)}


# --- review-fix regressions ------------------------------------------------


def test_table_diff_null_key_present_both_sides_is_unchanged(spark):
    base = spark.createDataFrame([(None, "x"), (1, "a")], "k long, s string")
    curr = spark.createDataFrame([(None, "x"), (1, "a")], "k long, s string")
    assert WH.table_diff(base, curr, ["k"]).count() == 0
    # and a base-only NULL-key row is 'removed', not 'added'
    curr2 = spark.createDataFrame([(1, "a")], "k long, s string")
    out = WH.table_diff(base, curr2, ["k"]).collect()
    assert [(r["k"], r["change_type"]) for r in out] == [(None, "removed")]


def test_table_diff_empty_compare_cols_is_existence_only(spark):
    base = spark.createDataFrame([(1, "a")], "k long, s string")
    curr = spark.createDataFrame([(1, "zzz")], "k long, s string")
    assert WH.table_diff(base, curr, ["k"], compare_cols=[]).count() == 0


def test_snapshot_bad_mode_does_not_brick_table(spark, tmp_path):
    p = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        WH.snapshot_write(df, p, mode="merge")
    # table still writable afterwards
    v = WH.snapshot_write(df, p, mode="overwrite")
    assert [r["k"] for r in WH.snapshot_read(spark, p, v).collect()] == [1]


def test_snapshot_write_skips_orphaned_data_dir(spark, tmp_path):
    import os

    p = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1,)], "k long")
    # simulate a crash between data write and manifest commit
    os.makedirs(f"{p}/data/v1")
    v = WH.snapshot_write(df, p, mode="overwrite")
    assert v == 2  # orphan v1 skipped, not collided with
    assert [r["k"] for r in WH.snapshot_read(spark, p).collect()] == [1]


def test_purge_keys_handles_escaped_and_null_partitions(spark, tmp_path):
    import os

    p = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "A"), (2, "B:x"), (3, None), (4, "B:x"), (5, None)],
        "k long, part string",
    )
    df.write.partitionBy("part").parquet(p)
    keys = spark.createDataFrame([(2,), (3,)], "k long")
    rewritten = WH.purge_keys(spark, p, "k", keys, "part")
    assert rewritten == ["B:x", None]
    left = sorted(
        (r["k"], r["part"]) for r in spark.read.parquet(p).collect()
    )
    assert left == [(1, "A"), (4, "B:x"), (5, None)]
    # now purge the REMAINING rows of both partitions: dirs must go
    WH.purge_keys(
        spark, p, "k", spark.createDataFrame([(4,), (5,)], "k long"), "part"
    )
    assert sorted(r["k"] for r in spark.read.parquet(p).collect()) == [1]
    assert not [
        d for d in os.listdir(p)
        if d.startswith("part=") and d != "part=A"
    ]


def test_merge_upsert_null_key_replaces_not_duplicates(spark):
    target = spark.createDataFrame([(None, "old"), (1, "a")], "k long, v string")
    updates = spark.createDataFrame([(None, "new")], "k long, v string")
    out = {r["k"]: r["v"] for r in WH.merge_upsert(target, updates, ["k"]).collect()}
    assert out == {None: "new", 1: "a"}


def test_remote_scheme_paths_rejected(spark):
    """ADVICE r4: driver-local os/shutil maintenance must fail loud on
    non-local URI schemes instead of silently seeing no files."""
    import pytest

    df = spark.range(3)
    for fn in (
        lambda: WH.snapshot_write(df, "hdfs://nn/warehouse/t"),
        lambda: WH.snapshot_read(spark, "s3a://bucket/t"),
        lambda: WH.purge_keys(
            spark, "s3://bucket/t", "k",
            spark.createDataFrame([(1,)], "k long"), "part",
        ),
    ):
        with pytest.raises(ValueError, match="scheme"):
            fn()


def test_file_uri_normalized(spark, tmp_path):
    """file: URIs are accepted and normalized to plain local paths."""
    p = str(tmp_path / "snap_uri")
    v = WH.snapshot_write(spark.range(4), "file://" + p)
    assert v == 1
    assert WH.snapshot_read(spark, "file://" + p).count() == 4


def test_require_local_path_single_slash_file_uri(tmp_path):
    """ADVICE r5: Spark accepts single-slash 'file:/p' URIs — they must
    normalize like 'file:///p', not fall through and create a literal
    'file:' directory under cwd; non-file schemes still fail loud."""
    import pytest as pt

    from parquet_editor_spark.operators.warehouse import _require_local_path

    assert _require_local_path("file:/tmp/x", "op") == "/tmp/x"
    assert _require_local_path("file:///tmp/x", "op") == "/tmp/x"
    assert _require_local_path("/tmp/x", "op") == "/tmp/x"
    assert _require_local_path("rel/dir", "op") == "rel/dir"
    for bad in ("s3://bucket/k", "hdfs:/nn/x", "s3a://b/k"):
        with pt.raises(ValueError, match="local paths"):
            _require_local_path(bad, "op")
