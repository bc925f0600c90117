"""Arrow IPC shard export/ingest stages (multimodal.py) — the
interchange framing is pyarrow's own, so the tests pin ordering,
schema declaration, and the loud-failure paths."""

import pyarrow as pa
import pytest

from parquet_editor_spark.operators import multimodal as MM


def test_shard_arrow_ipc_roundtrip(spark):
    rows = [(0, 2, "second"), (0, 1, "first"), (1, 3, "third")]
    df = spark.createDataFrame(rows, "shard long, k long, v string")
    shards = MM.shard_arrow_ipc(df, "shard", "k").orderBy("shard")
    got = shards.collect()
    assert [(r["shard"], r["n_rows"]) for r in got] == [(0, 2), (1, 1)]
    assert all(r["shard_bytes"] == len(r["payload"]) for r in got)
    # independent reader: pyarrow directly
    t = pa.ipc.open_stream(bytes(got[0]["payload"])).read_all()
    assert t.column("v").to_pylist() == ["first", "second"]
    # and the production read half with a declared schema
    back = (
        MM.arrow_ipc_table(
            shards.select("shard", "payload"), ddl="k long, v string"
        )
        .orderBy("shard", "k")
        .collect()
    )
    assert [(r["shard"], r["k"], r["v"]) for r in back] == [
        (0, 1, "first"),
        (0, 2, "second"),
        (1, 3, "third"),
    ]


def test_arrow_ipc_table_column_subset_and_nulls(spark):
    df = spark.createDataFrame(
        [(0, 1, "a"), (0, 2, "b")], "shard long, k long, v string"
    )
    shards = MM.shard_arrow_ipc(df, "shard", "k")
    only_v = MM.arrow_ipc_table(
        shards.select("shard", "payload"), ddl="v string"
    ).collect()
    assert sorted(r["v"] for r in only_v) == ["a", "b"]
    null_rows = MM.arrow_ipc_table(
        spark.createDataFrame([(9, None)], "shard long, payload binary"),
        ddl="v string",
    ).collect()
    assert [(r["shard"], r["v"]) for r in null_rows] == [(9, None)]


def test_arrow_ipc_table_rejects_missing_ddl_and_bad_column(spark):
    df = spark.createDataFrame([(0, 1, "a")], "shard long, k long, v string")
    shards = MM.shard_arrow_ipc(df, "shard", "k")
    with pytest.raises(ValueError, match="schema"):
        MM.arrow_ipc_table(shards.select("shard", "payload"))
    bad = MM.arrow_ipc_table(
        shards.select("shard", "payload"), ddl="nope string"
    )
    with pytest.raises(Exception, match="nope|Nonexistent|KeyError"):
        bad.collect()


def test_shard_parquet_payload_roundtrip(spark):
    rows = [(0, 2, "second"), (0, 1, "first"), (1, 3, "third")]
    df = spark.createDataFrame(rows, "shard long, k long, v string")
    shards = MM.shard_parquet_payload(df, "shard", "k").orderBy("shard")
    got = shards.collect()
    assert [(r["shard"], r["n_rows"]) for r in got] == [(0, 2), (1, 1)]
    # independent reader: pyarrow directly; payload is a whole file
    import pyarrow.parquet as pq

    t = pq.read_table(pa.BufferReader(bytes(got[0]["payload"])))
    assert t.column("v").to_pylist() == ["first", "second"]
    back = (
        MM.parquet_payload_table(
            shards.select("shard", "payload"), ddl="k long, v string"
        )
        .orderBy("shard", "k")
        .collect()
    )
    assert [(r["shard"], r["k"], r["v"]) for r in back] == [
        (0, 1, "first"),
        (0, 2, "second"),
        (1, 3, "third"),
    ]


def test_parquet_payload_table_projection_and_nulls(spark):
    df = spark.createDataFrame(
        [(0, 1, "a"), (0, 2, "b")], "shard long, k long, v string"
    )
    shards = MM.shard_parquet_payload(df, "shard", "k")
    only_v = MM.parquet_payload_table(
        shards.select("shard", "payload"), ddl="v string"
    ).collect()
    assert sorted(r["v"] for r in only_v) == ["a", "b"]
    null_rows = MM.parquet_payload_table(
        spark.createDataFrame([(9, None)], "shard long, payload binary"),
        ddl="v string",
    ).collect()
    assert [(r["shard"], r["v"]) for r in null_rows] == [(9, None)]
    with pytest.raises(ValueError, match="schema"):
        MM.parquet_payload_table(shards.select("shard", "payload"))


def test_shard_jsonl_pure_catalyst_roundtrip(spark):
    rows = [(0, 2, "second\nline"), (0, 1, 'first "quoted"'), (1, 3, None)]
    df = spark.createDataFrame(rows, "shard long, k long, v string")
    shards = MM.shard_jsonl(df, "shard", "k").orderBy("shard")
    got = shards.collect()
    assert [(r["shard"], r["n_rows"]) for r in got] == [(0, 2), (1, 1)]
    # embedded newline is JSON-escaped: each record stays on one line
    assert got[0]["payload"].count("\n") == 1
    back = (
        MM.jsonl_records(
            shards.select("shard", "payload"), ddl="k long, v string"
        )
        .orderBy("shard", "k")
        .collect()
    )
    assert [(r["shard"], r["k"], r["v"]) for r in back] == [
        (0, 1, 'first "quoted"'),
        (0, 2, "second\nline"),
        (1, 3, None),
    ]
    # both halves stay JVM-side: no Python runners in either plan
    for frame in (shards, MM.jsonl_records(shards.select("shard", "payload"), ddl="k long")):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
