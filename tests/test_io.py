"""Round-trip tests per format (SURVEY.md §5.3): load→save→load fixed
point over the reference's format surface (main.py:67-86), including
the list<float> embedding column for Parquet."""

import os

import pandas as pd
import pytest

from parquet_editor_spark import io as peio


def rt(spark, df, tmp_path, fmt, **kw):
    p = str(tmp_path / f"rt.{fmt}")
    peio.save(df, p, fmt, **kw)
    return peio.load(spark, p, fmt)


def test_parquet_roundtrip(spark, lineitem, tmp_path):
    back = rt(spark, lineitem, tmp_path, "parquet")
    assert back.schema == lineitem.schema
    assert back.count() == lineitem.count()


def test_parquet_roundtrip_embeddings(spark, embeddings, tmp_path):
    back = rt(spark, embeddings, tmp_path, "parquet")
    assert back.schema == embeddings.schema
    a = embeddings.orderBy("vec_id").limit(3).toPandas()
    b = back.orderBy("vec_id").limit(3).toPandas()
    for x, y in zip(a["embedding"], b["embedding"]):
        assert list(x) == list(y)


def test_csv_roundtrip(spark, lineitem, tmp_path):
    df = lineitem.select("l_orderkey", "l_quantity", "l_returnflag")
    back = rt(spark, df, tmp_path, "csv")
    assert back.count() == df.count()
    assert [c for c, _ in back.dtypes] == df.columns


def test_json_roundtrip(spark, lineitem, tmp_path):
    df = lineitem.select("l_orderkey", "l_quantity", "l_returnflag")
    back = rt(spark, df, tmp_path, "json")
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)


def test_single_file_csv(spark, lineitem, tmp_path):
    df = lineitem.select("l_orderkey", "l_quantity").limit(50)
    p = str(tmp_path / "one.csv")
    peio.save(df, p, single_file=True)
    assert os.path.isfile(p)
    assert len(pd.read_csv(p)) == 50


def test_pandas_orient_json_fallback(spark, tmp_path):
    # the reference's pd.read_json dialect (main.py:72-73)
    p = str(tmp_path / "legacy.json")
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_json(p)  # columns orient
    df = peio.load(spark, p)
    assert df.count() == 2 and set(df.columns) == {"a", "b"}


def test_partitioned_write_prunes(spark, lineitem, tmp_path):
    p = str(tmp_path / "part.parquet")
    peio.save(lineitem, p, partition_by=["l_returnflag"])
    back = peio.load(spark, p).filter("l_returnflag = 'A'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() > 0
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan


def test_orc_roundtrip(spark, lineitem, tmp_path):
    df = lineitem.select("l_orderkey", "l_quantity", "l_returnflag")
    back = rt(spark, df, tmp_path, "orc")
    assert back.count() == df.count()
    assert back.schema == df.schema


def test_detect_format_errors():
    with pytest.raises(ValueError):
        peio.detect_format("/tmp/file.unknownext")


def test_empty_source(spark):
    df = peio.empty(spark, "a int, b string")
    assert df.count() == 0 and df.columns == ["a", "b"]


def test_avro_roundtrip(spark, lineitem, tmp_path):
    """Avro dispatches by extension; with the spark-avro jar this is
    the distributed source/sink, without it the dependency-free
    container path (sources/avro.py) — either way the roundtrip must
    preserve values."""
    p = str(tmp_path / "data.avro")
    df = lineitem.select("l_orderkey", "l_quantity", "l_returnflag").limit(10)
    assert peio.detect_format(p) == "avro"
    peio.save(df, p)
    back = peio.load(spark, p)
    assert {tuple(r) for r in back.collect()} == {
        (r["l_orderkey"], float(r["l_quantity"]), r["l_returnflag"])
        for r in df.collect()
    }


def test_avro_minimal_module_types_and_nulls(tmp_path):
    """The pure-python container codec directly: null/deflate codecs,
    None holes, negative ints (zigzag), NaN doubles, unicode."""
    import math

    from parquet_editor_spark.sources.avro import read_avro, write_avro

    pdf = pd.DataFrame(
        {
            "i": pd.Series([-5, 0, 2**40], dtype="int64"),
            "f": [1.5, None, float("nan")],
            "s": ["héllo", None, "a\nb"],
            "b": [True, False, True],
        }
    )
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"m_{codec}.avro")
        write_avro(pdf, p, codec=codec)
        back = read_avro(p)
        assert back["i"].tolist() == [-5, 0, 2**40]
        assert back["f"][0] == 1.5
        assert pd.isna(back["f"][1]) and pd.isna(back["f"][2])
        assert back["s"].tolist() == ["héllo", None, "a\nb"]
        assert back["b"].tolist() == [True, False, True]


def test_clustered_write_disjoint_file_ranges(spark, lineitem, tmp_path):
    """save_clustered must yield files whose min/max footer stats on
    the cluster key cover disjoint slices — that disjointness IS the
    data-skipping property a filtered scan exploits."""
    import glob

    import pyarrow.parquet as pq

    p = str(tmp_path / "clustered.parquet")
    peio.save_clustered(lineitem, p, ["l_orderkey"], n_files=4)
    files = glob.glob(p + "/*.parquet")
    assert len(files) == 4
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        idx = names.index("l_orderkey")
        stats = [
            md.row_group(rg).column(idx).statistics
            for rg in range(md.num_row_groups)
        ]
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    ranges.sort()
    for (_, a_max), (b_min, _) in zip(ranges, ranges[1:]):
        assert a_max <= b_min
    back = peio.load(spark, p)
    assert back.count() == lineitem.count()


def test_text_source_lines_and_wholetext(spark, tmp_path):
    (tmp_path / "a.txt").write_text("l1\nl2\nl3")
    (tmp_path / "b.txt").write_text("single doc body")
    lines = peio.load_text(spark, str(tmp_path))
    assert lines.count() == 4 and lines.columns == ["value"]
    docs = peio.load_text(spark, str(tmp_path), whole=True)
    got = sorted(r["value"] for r in docs.collect())
    assert got == ["l1\nl2\nl3", "single doc body"]


def test_schema_evolution_merge(spark, tmp_path):
    """v1 files lack the column added in v2 — the merged scan unions
    schemas and backfills NULL for pre-evolution rows."""
    p = str(tmp_path / "evolving.parquet")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(
        f"{p}/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, s string, score double"
    ).write.parquet(f"{p}/batch=2")
    df = peio.load_parquet_evolved(spark, p)
    assert set(df.columns) >= {"id", "s", "score"}
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows == {1: None, 2: 9.5}


def _has_excel_engine() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        return False


def test_excel_round_trip(spark, tmp_path, lineitem):
    """Excel load/save (main.py:70-71,81-82) round-trips with or
    without openpyxl — the dependency-free SpreadsheetML fallback
    (sources/xlsx.py) carries the single-sheet editor contract."""
    import parquet_editor_spark.io as peio

    p = str(tmp_path / "t.xlsx")
    src = lineitem.limit(5).select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    peio.save(src, p)
    back = peio.load(spark, p)
    assert sorted(back.columns) == sorted(src.columns)
    a = {tuple(r) for r in src.collect()}
    b = {
        (r["l_orderkey"], float(r["l_quantity"]), r["l_returnflag"])
        for r in back.collect()
    }
    assert a == b


def test_excel_minimal_module_types_and_sparse(tmp_path):
    """The fallback reader/writer directly: mixed types, None holes,
    XML-hostile strings, bool columns, int-vs-float inference."""
    import pandas as pd

    from parquet_editor_spark.sources.xlsx import read_xlsx, write_xlsx

    pdf = pd.DataFrame(
        {
            "i": [1, 2, 3],
            "f": [1.5, None, -2.25],
            "s": ["a<b&c", "日本語", None],
            "b": [True, False, True],
        }
    )
    p = str(tmp_path / "m.xlsx")
    write_xlsx(pdf, p)
    back = read_xlsx(p)
    assert list(back.columns) == ["i", "f", "s", "b"]
    assert back["i"].tolist() == [1, 2, 3] and str(back["i"].dtype) == "int64"
    assert back["f"][0] == 1.5 and back["f"][2] == -2.25
    assert pd.isna(back["f"][1]) and str(back["f"].dtype) == "float64"
    assert back["s"].tolist()[:2] == ["a<b&c", "日本語"] and back["s"][2] is None
    assert back["b"].tolist() == [True, False, True]


def test_excel_reader_handles_shared_strings(tmp_path):
    """Files written by OTHER tools use a shared-string table; the
    reader must resolve t="s" indices (our writer emits inline)."""
    import zipfile

    from parquet_editor_spark.sources import xlsx as X

    p = str(tmp_path / "sst.xlsx")
    sheet = (
        '<?xml version="1.0"?>'
        f'<worksheet xmlns="{X._MAIN_NS}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2"><v>7</v></c>'
        '<c r="B2" t="s"><v>2</v></c></row>'
        "</sheetData></worksheet>"
    )
    sst = (
        '<?xml version="1.0"?>'
        f'<sst xmlns="{X._MAIN_NS}"><si><t>k</t></si>'
        "<si><t>v</t></si><si><r><t>he</t></r><r><t>llo</t></r></si></sst>"
    )
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", X._CONTENT_TYPES)
        z.writestr("_rels/.rels", X._ROOT_RELS)
        z.writestr("xl/workbook.xml", X._WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", X._WORKBOOK_RELS)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    back = X.read_xlsx(p)
    assert list(back.columns) == ["k", "v"]
    assert back["k"].tolist() == [7] and back["v"].tolist() == ["hello"]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=25, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(-(2**53), 2**53),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            st.one_of(
                st.none(),
                st.text(
                    alphabet=st.characters(
                        blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF
                    ),
                    max_size=40,
                ),
            ),
            st.booleans(),
        ),
        min_size=0,
        max_size=20,
    )
)
def test_xlsx_property_roundtrip(tmp_path_factory, rows):
    """Pure-python xlsx module property: any (int, float, optional
    text, bool) frame survives write→read with values intact — ints
    stay exact (2^53 window), floats round-trip via shortest repr,
    arbitrary non-control unicode passes through XML."""
    import math

    import pandas as pd

    from parquet_editor_spark.sources.xlsx import read_xlsx, write_xlsx

    pdf = pd.DataFrame(
        rows, columns=["i", "f", "s", "b"]
    )
    p = str(tmp_path_factory.mktemp("xl") / "p.xlsx")
    write_xlsx(pdf, p)
    back = read_xlsx(p)
    if not rows:
        assert back.empty
        return
    assert list(back.columns) == ["i", "f", "s", "b"]
    for k, (i, f, s, b) in enumerate(rows):
        assert int(back["i"][k]) == i
        bf = back["f"][k]
        assert bf == f or (math.isnan(bf) and math.isnan(f))
        got_s = back["s"][k]
        assert (got_s is None and s is None) or got_s == s
        assert bool(back["b"][k]) == b


def test_text_source_reads_gzip_transparently(spark, tmp_path):
    """Hadoop codecs decompress .gz text at the scan — no user-side
    decompression step; corpus ingestion takes compressed dumps
    as-is."""
    import gzip

    with gzip.open(tmp_path / "c.txt.gz", "wt") as f:
        f.write("line one\nline two")
    lines = peio.load_text(spark, str(tmp_path))
    assert sorted(r["value"] for r in lines.collect()) == [
        "line one", "line two",
    ]


def test_json_records_array_dialect(spark, tmp_path):
    """pandas to_json(orient='records') emits one top-level ARRAY of
    objects (not JSON-lines); the dialect bridge must land it as
    ordinary rows."""
    p = str(tmp_path / "arr.json")
    pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}).to_json(
        p, orient="records"
    )
    df = peio.load(spark, p)
    assert df.count() == 3 and set(df.columns) == {"a", "b"}
    assert {(r["a"], r["b"]) for r in df.collect()} == {
        (1, "x"), (2, "y"), (3, "z"),
    }


@settings(
    max_examples=25, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(-(2**62), 2**62),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            st.one_of(
                st.none(),
                st.text(
                    alphabet=st.characters(
                        blacklist_categories=("Cs",), max_codepoint=0x2FFF
                    ),
                    max_size=40,
                ),
            ),
            st.booleans(),
        ),
        min_size=0,
        max_size=20,
    )
)
def test_avro_property_roundtrip(tmp_path_factory, rows):
    """Pure-python avro codec property: any (int, float, optional
    text, bool) frame survives write→read — zigzag varints across the
    full signed range, shortest-repr doubles, arbitrary non-surrogate
    unicode (control chars included: avro strings are raw UTF-8, no
    XML escaping limits)."""
    import math

    from parquet_editor_spark.sources.avro import read_avro, write_avro

    pdf = pd.DataFrame(rows, columns=["i", "f", "s", "b"])
    p = str(tmp_path_factory.mktemp("av") / "p.avro")
    write_avro(pdf, p)
    back = read_avro(p)
    if not rows:
        assert back.empty
        return
    for k, (i, f, s, b) in enumerate(rows):
        assert int(back["i"][k]) == i
        bf = back["f"][k]
        assert bf == f or (
            (bf is None or (isinstance(bf, float) and math.isnan(bf)))
            and math.isnan(f)
        )
        got_s = back["s"][k]
        assert (got_s is None and s is None) or got_s == s
        assert bool(back["b"][k]) == b


def test_xlsx_python_datasource(spark, lineitem, tmp_path):
    """Spark 4 Python DataSource API: after registration,
    spark.read.format('xlsx') is a first-class source — inferred
    schema, executor-side decode, full DataFrame ops downstream."""
    from parquet_editor_spark.sources.xlsx_datasource import (
        register_xlsx_source,
    )

    p = str(tmp_path / "ds.xlsx")
    src = lineitem.limit(20).select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    peio.save(src, p)
    register_xlsx_source(spark)
    df = spark.read.format("xlsx").load(p)
    assert dict(df.dtypes) == {
        "l_orderkey": "bigint",
        "l_quantity": "double",
        "l_returnflag": "string",
    }
    got = (
        df.filter(df.l_quantity > 0)
        .groupBy("l_returnflag")
        .count()
        .collect()
    )
    want = {
        (r["l_returnflag"], r["count"])
        for r in src.groupBy("l_returnflag").count().collect()
    }
    assert {(r["l_returnflag"], r["count"]) for r in got} == want


def test_xlsx_duplicate_headers_survive(tmp_path):
    """Duplicate column names (legal in Spark frames, e.g. post-join)
    must round-trip positionally — not collapse to the last column."""
    from parquet_editor_spark.sources.xlsx import read_xlsx, write_xlsx

    pdf = pd.DataFrame([[1, 2], [3, 4]], columns=["x", "x"])
    p = str(tmp_path / "dup.xlsx")
    write_xlsx(pdf, p)
    back = read_xlsx(p)
    assert list(back.columns) == ["x", "x"]
    assert back.iloc[:, 0].tolist() == [1, 3]
    assert back.iloc[:, 1].tolist() == [2, 4]


def test_small_path_readers_handle_pandas_nullable_dtypes(tmp_path):
    """pandas nullable Int64/boolean scalars (pd.NA) must not crash
    the fallback writers and must keep their numeric/boolean types."""
    from parquet_editor_spark.sources.avro import read_avro, write_avro
    from parquet_editor_spark.sources.xlsx import read_xlsx, write_xlsx

    pdf = pd.DataFrame(
        {
            "i": pd.array([1, None, 3], dtype="Int64"),
            "b": pd.array([True, None, False], dtype="boolean"),
        }
    )
    pa = str(tmp_path / "n.avro")
    write_avro(pdf, pa)
    back = read_avro(pa)
    assert back["i"][0] == 1 and pd.isna(back["i"][1]) and back["i"][2] == 3
    assert back["b"][0] is True and back["b"][2] is False
    px = str(tmp_path / "n.xlsx")
    write_xlsx(pdf, px)
    bx = read_xlsx(px)
    assert bx["i"][0] == 1 and pd.isna(bx["i"][1]) and bx["i"][2] == 3


def test_driver_side_load_fallback_refuses_huge_files(spark, tmp_path, monkeypatch):
    """The jar-less avro / xlsx LOAD paths materialize driver-side;
    they must refuse files over the byte cap with a clear message
    instead of attempting a multi-GB driver read.  (With the
    spark-avro jar present the native scan handles the file and the
    guard path is inert — exercise the xlsx guard instead, which is
    always the driver-side path.)"""
    import parquet_editor_spark.io as peio_mod

    monkeypatch.setattr(peio_mod, "SMALL_SOURCE_BYTES", 16)
    try:
        import pyspark.sql.avro  # noqa: F401 — proxy: never true jar probe

        has_avro_jar = False
    except ImportError:
        has_avro_jar = False
    p = tmp_path / "big.avro"
    p.write_bytes(b"Obj\x01" + b"x" * 128)
    if not has_avro_jar:
        with pytest.raises((ValueError, Exception)) as ei:
            peio_mod.load(spark, str(p))
        # jar-less: our guard; jar present: native reader error — both
        # must refuse, never a silent driver materialization
        assert ei.value is not None
    x = tmp_path / "big.xlsx"
    x.write_bytes(b"PK" + b"x" * 128)
    with pytest.raises(ValueError, match="driver-side"):
        peio_mod.load(spark, str(x))


def test_avro_fallback_save_refuses_unsupported_mode(spark, tmp_path):
    """Without the jar, save(mode='append'/partition_by) must raise
    rather than silently overwrite a single file."""
    df = spark.createDataFrame([(1, "a")], "x long, y string")
    try:
        peio.save(df, str(tmp_path / "m.avro"), mode="append")
    except NotImplementedError as e:
        assert "overwrite" in str(e)
    else:  # spark-avro jar present: native append worked — also fine
        pass


def test_tsv_round_trip_uses_tab_delimiter(spark, tmp_path):
    import glob

    from parquet_editor_spark import io as peio

    df = spark.createDataFrame([(1, "a b"), (2, "c,d")], "k long, s string")
    p = str(tmp_path / "out.tsv")
    peio.save(df, p)
    raw = open(glob.glob(f"{p}/part-*")[0]).read()
    assert "\t" in raw and "k,s" not in raw
    back = peio.load(spark, p)
    assert back.columns == ["k", "s"]
    assert sorted((r["k"], r["s"]) for r in back.collect()) == [
        (1, "a b"), (2, "c,d"),
    ]


def test_nanos_rebuild_targets_only_footer_nanos_columns(spark, tmp_path):
    """A plain int64 'ts' column must pass through untouched even when
    ANOTHER column in the footer is TIMESTAMP(NANOS)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_editor_spark.io import load_parquet_nanos

    p = str(tmp_path / "mixed.parquet")
    t = pa.table(
        {
            "ts": pa.array([1_700_000_000_123, 1_700_000_000_456], pa.int64()),
            "ev": pa.array([1_000, 2_000], pa.timestamp("ns")),
        }
    )
    pq.write_table(t, p)
    df = load_parquet_nanos(spark, p)
    got = sorted(r["ts"] for r in df.select("ts").collect())
    assert got == [1_700_000_000_123, 1_700_000_000_456]  # NOT divided


def test_plans_pushed_filters_handles_in_lists(spark, tmp_path):
    from pyspark.sql import functions as F

    from parquet_editor_spark.plans.explain import pushed_filters

    p = str(tmp_path / "t.parquet")
    spark.range(100).withColumn("x", F.col("id") % 10).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("x").isin(1, 2, 3))
    filters = pushed_filters(df)
    assert any(f.startswith("In(x") for f in filters)
    # the In(...) filter survives as ONE entry, not comma shrapnel
    assert not any(f in ("2", "3", "[1") for f in filters)


def test_scan_stats_reports_row_group_minmax(spark, tmp_path, sf_dir):
    """Footer audit: clustered writes produce tight, skippable min/max;
    the same data written unsorted is unskippable for range predicates."""
    import parquet_editor_spark.io as peio

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    clustered = str(tmp_path / "clustered")
    unsorted = str(tmp_path / "unsorted")
    peio.save_clustered(li, clustered, ["l_orderkey"], n_files=4)
    li.repartition(4).write.mode("overwrite").parquet(unsorted)

    stats = peio.scan_stats(clustered, ["l_orderkey"])
    assert set(stats.columns) == {
        "file", "row_group", "column", "n_rows", "min", "max", "n_nulls"
    }
    assert (stats["column"] == "l_orderkey").all()
    assert stats["n_rows"].sum() == li.count()

    lo = int(li.agg({"l_orderkey": "min"}).collect()[0][0])
    hi = int(li.agg({"l_orderkey": "max"}).collect()[0][0])
    mid = (lo + hi) // 2
    narrow = (mid, mid + (hi - lo) // 100)
    f_clustered = peio.skippable_fraction(clustered, "l_orderkey", *narrow)
    f_unsorted = peio.skippable_fraction(unsorted, "l_orderkey", *narrow)
    # range-clustered files: all but ~1 row group skips a narrow range;
    # round-robin files all overlap the whole key range
    assert f_clustered >= 0.5
    assert f_unsorted == 0.0


def test_skippable_fraction_empty_dir(tmp_path):
    import os

    import parquet_editor_spark.io as peio

    d = tmp_path / "empty"
    os.makedirs(d)
    assert peio.skippable_fraction(str(d), "x", 0, 1) == 0.0


def test_avro_multifile_dataset_distributed(spark, tmp_path):
    """r6: a DIRECTORY of avro files decodes distributed (binaryFile →
    executor-side codec, one task per file) instead of the guarded
    driver small path; rows from every member arrive, schema comes
    from one probe file, and a member missing a column fails loud."""
    import pandas as pd

    from parquet_editor_spark.sources.avro import write_avro

    d = tmp_path / "ds"
    d.mkdir()
    for k in range(4):
        write_avro(
            pd.DataFrame(
                {"id": [10 * k + i for i in range(5)],
                 "name": [f"r{k}_{i}" for i in range(5)]}
            ),
            str(d / f"part-{k}.avro"),
        )
    df = peio.load(spark, str(d), fmt="avro")
    rows = sorted((r["id"], r["name"]) for r in df.collect())
    assert len(rows) == 20
    assert rows[0] == (0, "r0_0") and rows[-1] == (34, "r3_4")
    # parallelism: one scan task per file, not a driver collect
    assert df.rdd.getNumPartitions() >= 2

    # member with a divergent schema fails its task loudly
    write_avro(pd.DataFrame({"id": [99]}), str(d / "part-bad.avro"))
    import pytest as pt

    with pt.raises(Exception, match="missing columns"):
        peio.load(spark, str(d), fmt="avro").collect()


def test_excel_multifile_dataset_distributed(spark, tmp_path):
    """r6: a directory of .xlsx files decodes distributed (binaryFile
    → executor-side SpreadsheetML codec), same contract as the
    multi-file avro path."""
    import pandas as pd

    from parquet_editor_spark.sources.xlsx import write_xlsx

    d = tmp_path / "xs"
    d.mkdir()
    for k in range(3):
        write_xlsx(
            pd.DataFrame(
                {"id": [10 * k + i for i in range(4)],
                 "tag": [f"t{k}{i}" for i in range(4)]}
            ),
            str(d / f"sheet-{k}.xlsx"),
        )
    df = peio.load(spark, str(d), fmt="excel")
    rows = sorted((r["id"], r["tag"]) for r in df.collect())
    assert len(rows) == 12 and rows[0] == (0, "t00") and rows[-1] == (23, "t23")
    assert df.rdd.getNumPartitions() >= 2


def test_avro_schema_unwraps_logical_types(monkeypatch):
    """r8 ADVICE medium: dict-form field types with logicalType
    annotations ({"type": "long", "logicalType": "timestamp-millis"})
    must map through spark_schema_for the same way _decode_value
    unwraps them — directly and inside ["null", T] unions."""
    from parquet_editor_spark.sources import avro as A

    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-millis"}},
            {"name": "d", "type": ["null", {"type": "int",
                                            "logicalType": "date"}]},
            {"name": "s", "type": "string"},
        ],
    }
    monkeypatch.setattr(A, "read_avro_header", lambda p: (schema, "null"))
    st = A.spark_schema_for("ignored.avro")
    assert [f.dataType.simpleString() for f in st.fields] == [
        "bigint", "bigint", "string",
    ]
    assert [f.nullable for f in st.fields] == [True, True, True] or [
        f.nullable for f in st.fields
    ] == [False, True, False]


def test_excel_distributed_all_null_probe_column(spark, tmp_path):
    """r8 ADVICE low + verdict item 5: a column that is null across
    the ENTIRE probe member pins to nullable StringType (instead of
    CANNOT_DETERMINE_TYPE), and members carrying values in it still
    decode (stringified)."""
    import pandas as pd

    from parquet_editor_spark.sources.xlsx import write_xlsx

    d = tmp_path / "xn"
    d.mkdir()
    write_xlsx(
        pd.DataFrame({"id": [1, 2], "note": [None, None]}),
        str(d / "a.xlsx"),
    )
    write_xlsx(
        pd.DataFrame({"id": [3, 4], "note": ["hello", None]}),
        str(d / "b.xlsx"),
    )
    df = peio.load(spark, str(d), fmt="excel")
    assert dict(df.dtypes)["note"] == "string"
    rows = {r["id"]: r["note"] for r in df.collect()}
    assert rows == {1: None, 2: None, 3: "hello", 4: None}


def test_excel_distributed_empty_probe_member_raises(spark, tmp_path):
    import pandas as pd

    from parquet_editor_spark.sources.xlsx import write_xlsx

    d = tmp_path / "xe"
    d.mkdir()
    write_xlsx(pd.DataFrame({"id": pd.Series([], dtype="int64")}),
               str(d / "a.xlsx"))
    write_xlsx(pd.DataFrame({"id": [1]}), str(d / "b.xlsx"))
    with pytest.raises(ValueError, match="no\\s+rows|schema probe"):
        peio.load(spark, str(d), fmt="excel")
