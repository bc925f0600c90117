"""Pins for the round-7 behavior changes that shipped untested (r7
verdict item 4) plus the round-8 probe hardening (r7 ADVICE): NaN-y
SVG rendering, bounded Avro probes across multi-block containers,
header-schema (not data) inference, Excel probe guard + all-null
escalation, one-row-per-pair LSH output, and the ``_edit_depth``
carry-over on non-undoable rebinds."""

import zlib

import numpy as np
import pandas as pd
import pytest

from parquet_editor_spark import io as peio


# ---------------------------------------------------------------------------
# render_line_svg with NaN y-values (plotting.py r6-ADVICE fix)
# ---------------------------------------------------------------------------

def test_render_line_svg_skips_nan_y_points():
    """Numeric-column nulls surface as NaN in pandas; they must not
    leak "nan" into polyline points nor distort the y bounds."""
    from parquet_editor_spark.operators.plotting import render_line_svg

    pdf = pd.DataFrame(
        {"x": [0.0, 1.0, 2.0, 3.0], "y": [10.0, float("nan"), 30.0, 20.0]}
    )
    svg = render_line_svg(pdf, x="x", width=200, height=100, title="t")
    assert "nan" not in svg.lower().replace("xmlns", "")
    # 3 finite points survive on the polyline
    pts = svg.split('points="')[1].split('"')[0].split()
    assert len(pts) == 3
    # y bounds come from the finite values only: min y=10 maps to the
    # bottom pad, max y=30 to the top pad (pad=30)
    ys = [float(p.split(",")[1]) for p in pts]
    assert max(ys) == pytest.approx(100 - 30)  # y=10 at bottom
    assert min(ys) == pytest.approx(30)  # y=30 at top


def test_render_line_svg_all_nan_column_still_renders():
    from parquet_editor_spark.operators.plotting import render_line_svg

    pdf = pd.DataFrame(
        {"x": [0.0, 1.0], "y": [float("nan"), float("nan")],
         "z": [1.0, 2.0]}
    )
    svg = render_line_svg(pdf, x="x")
    assert "nan" not in svg.lower().replace("xmlns", "")


# ---------------------------------------------------------------------------
# avro: max_rows across multi-block containers + header-only schema
# ---------------------------------------------------------------------------

def _write_multiblock_avro(path: str, blocks: list[list[int]]) -> None:
    """Hand-rolled container with one writer block per inner list —
    write_avro always emits a single block, but real files (and the
    max_rows early-exit, avro.py:221-237) are block-structured."""
    import json

    from parquet_editor_spark.sources import avro as A

    schema = {
        "type": "record", "name": "row",
        "fields": [{"name": "v", "type": ["null", "long"]}],
    }
    schema_json = json.dumps(schema)
    import hashlib

    sync = hashlib.md5(schema_json.encode()).digest()
    out = bytearray(A._MAGIC)
    A._w_varint(out, 2)
    A._w_str(out, "avro.schema")
    A._w_str(out, schema_json)
    A._w_str(out, "avro.codec")
    A._w_str(out, "null")
    A._w_varint(out, 0)
    out.extend(sync)
    for block in blocks:
        body = bytearray()
        for v in block:
            A._w_varint(body, 1)  # union branch: value
            A._w_varint(body, v)
        A._w_varint(out, len(block))
        A._w_varint(out, len(body))
        out.extend(body)
        out.extend(sync)
    with open(path, "wb") as f:
        f.write(bytes(out))


def test_avro_max_rows_lands_mid_block(tmp_path):
    from parquet_editor_spark.sources.avro import read_avro

    p = str(tmp_path / "mb.avro")
    _write_multiblock_avro(p, [[0, 1, 2], [3, 4, 5], [6, 7]])
    # mid-block exit (skips the remaining blocks AND the current
    # block's trailing sync check — by design)
    assert read_avro(p, max_rows=4)["v"].tolist() == [0, 1, 2, 3]
    # exact block boundary
    assert read_avro(p, max_rows=3)["v"].tolist() == [0, 1, 2]
    # beyond the file: everything, sync checks enforced
    assert read_avro(p, max_rows=100)["v"].tolist() == list(range(8))
    assert read_avro(p)["v"].tolist() == list(range(8))


def test_avro_sync_mismatch_still_detected(tmp_path):
    from parquet_editor_spark.sources.avro import read_avro

    p = str(tmp_path / "bad.avro")
    _write_multiblock_avro(p, [[0, 1], [2, 3]])
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF  # corrupt the final block sync
    p2 = str(tmp_path / "bad2.avro")
    open(p2, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="sync mismatch"):
        read_avro(p2)
    # but a probe that exits before the corrupt sync is unaffected
    assert read_avro(p2, max_rows=2)["v"].tolist() == [0, 1]


def test_avro_header_schema_without_body_read(tmp_path):
    """spark_schema_for parses only the header: a container whose
    body bytes are truncated must still yield the full schema."""
    from parquet_editor_spark.sources.avro import (
        read_avro_header, spark_schema_for, write_avro,
    )

    p = str(tmp_path / "h.avro")
    write_avro(
        pd.DataFrame({"a": [1, 2], "b": ["x", "y"], "c": [1.5, 2.5]}), p
    )
    schema, codec = read_avro_header(p)
    assert [f["name"] for f in schema["fields"]] == ["a", "b", "c"]
    assert codec == "deflate"
    st = spark_schema_for(p)
    assert [f.dataType.simpleString() for f in st.fields] == [
        "bigint", "string", "double"
    ]
    # truncate to the header plus a few bytes: schema still readable
    data = open(p, "rb").read()
    p2 = str(tmp_path / "trunc.avro")
    open(p2, "wb").write(data[: data.index(b"avro.codec") + 30])
    assert [f.name for f in spark_schema_for(p2).fields] == ["a", "b", "c"]


def test_avro_distributed_all_null_leading_column(spark, tmp_path):
    """r7 ADVICE (medium): the schema now comes from the container
    header, so a column that is all-null in the probe file (or
    probe rows) can no longer break inference or mistype the scan."""
    from parquet_editor_spark.sources.avro import write_avro

    d = tmp_path / "ds.avro"
    d.mkdir()
    write_avro(
        pd.DataFrame({"k": [1, 2], "s": pd.Series([None, None], dtype=object)}),
        str(d / "part-0.avro"),
    )
    write_avro(
        pd.DataFrame({"k": [3, 4], "s": ["x", "y"]}),
        str(d / "part-1.avro"),
    )
    # the all-null member writes s as a ["null","string"] union, so
    # both members share the schema and the header probe is exact
    df = peio.load(spark, str(d))
    got = df.toPandas().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == [1, 2, 3, 4]
    assert got["s"].tolist()[2:] == ["x", "y"]
    assert df.schema["s"].dataType.simpleString() == "string"


def test_avro_single_file_all_null_column(spark, tmp_path):
    from parquet_editor_spark.sources.avro import write_avro

    p = str(tmp_path / "n.avro")
    write_avro(
        pd.DataFrame({"k": [1, 2], "s": pd.Series([None, None], dtype=object)}),
        p,
    )
    df = peio.load(spark, p)
    assert df.schema["s"].dataType.simpleString() == "string"
    assert df.count() == 2


# ---------------------------------------------------------------------------
# excel: probe guard + all-null escalation (io.py, r7 ADVICE)
# ---------------------------------------------------------------------------

def _write_xlsx_members(d, frames):
    from parquet_editor_spark.sources.xlsx import write_xlsx

    d.mkdir()
    for i, pdf in enumerate(frames):
        write_xlsx(pdf, str(d / f"part-{i}.xlsx"))


def test_excel_probe_guard_fires_before_read(spark, tmp_path, monkeypatch):
    """The size guard is hoisted ahead of the probe's open/read, so
    BOTH probe paths (openpyxl and the fallback codec) are bounded."""
    d = tmp_path / "xl"
    _write_xlsx_members(
        d,
        [pd.DataFrame({"a": [1, 2]}), pd.DataFrame({"a": [3]})],
    )
    monkeypatch.setattr(peio, "SMALL_SOURCE_BYTES", 10)
    with pytest.raises(ValueError, match="Excel schema probe"):
        peio.load(spark, str(d))


def test_excel_probe_escalates_past_all_null_head(spark, tmp_path):
    """A column that is null for the first 100 rows used to infer a
    wrong type from the bounded probe; the probe now widens its row
    budget until every column shows a value."""
    n = 150
    s = [None] * 120 + ["v%d" % i for i in range(120, n)]
    d = tmp_path / "xl2"
    _write_xlsx_members(
        d,
        [
            pd.DataFrame({"k": range(n), "s": pd.Series(s, dtype=object)}),
            pd.DataFrame({"k": [n], "s": ["tail"]}),
        ],
    )
    df = peio.load(spark, str(d))
    assert df.schema["s"].dataType.simpleString() == "string"
    got = df.toPandas().sort_values("k").reset_index(drop=True)
    assert len(got) == n + 1
    assert got["s"].iloc[-1] == "tail"
    assert got["s"].iloc[125] == "v125"


# ---------------------------------------------------------------------------
# cosine_pairs_lsh: one row per pair even under multi-band collisions
# ---------------------------------------------------------------------------

def test_cosine_pairs_lsh_one_row_per_pair(spark):
    """Identical vectors collide in EVERY band; the pair must still
    surface exactly once (r7 fix: group on the pair key with
    max(sim) instead of a 3-column distinct, which could leak
    duplicates when cross-bucket dgemm blocking diverged by an ulp —
    sim.py:515-521)."""
    from parquet_editor_spark.operators import sim as S

    rng = np.random.default_rng(11)
    base = rng.normal(size=16)
    base /= np.linalg.norm(base)
    noise = rng.normal(size=16) * 0.01
    rows = [
        (0, base.tolist()),
        (1, base.tolist()),  # exact dup of 0: collides in all bands
        (2, (base + noise).tolist()),
        (3, rng.normal(size=16).tolist()),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = S.cosine_pairs_lsh(df, threshold=0.95, bits=32, bands=8).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in out]
    assert len(pairs) == len(set(pairs)), f"duplicate pairs: {pairs}"
    assert (0, 1) in pairs or (1, 0) in pairs
    sim01 = [r["sim"] for r in out if {r["id_a"], r["id_b"]} == {0, 1}]
    assert sim01 == [pytest.approx(1.0)]


# ---------------------------------------------------------------------------
# session: _edit_depth carries over non-undoable rebinds (r6 ADVICE 4)
# ---------------------------------------------------------------------------

def test_with_rid_interleaved_edits_still_compact(spark, monkeypatch):
    """Interleaving ``with_rid`` (an ``undoable=False`` rebind of the
    same table) with edits more often than every COMPACT_EVERY used
    to zero the depth counter each time, deferring auto-compaction
    indefinitely while the overlay chain kept growing."""
    from parquet_editor_spark.operators import edit as E
    from parquet_editor_spark.session import EditorSession

    calls = []
    real_compact = E.compact
    monkeypatch.setattr(
        E, "compact", lambda df: (calls.append(1), real_compact(df))[1]
    )

    sess = EditorSession(spark)
    sess.COMPACT_EVERY = 4
    sess.bind(
        "t",
        E.with_rid(spark.createDataFrame(pd.DataFrame({"i": range(6)}))),
        undoable=False,
    )
    for k in range(10):
        sess.with_rid("t")  # ordinal pin between every edit
        sess.set_cell("t", k % 6, "i", 100 + k)
    assert calls, (
        "auto-compaction never fired across 10 edits with "
        "COMPACT_EVERY=4 — _edit_depth was reset by with_rid"
    )
    # and the data survived the interleaving (with_rid may re-rank
    # ordinals between edits, so compare as a multiset)
    got = sess.get("t").toPandas()["i"].tolist()
    assert sorted(got) == [104, 105, 106, 107, 108, 109]
