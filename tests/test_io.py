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


def test_avro_guarded(spark, lineitem, tmp_path):
    """Avro dispatches by extension; without the external spark-avro
    jar both directions surface the clean NotImplementedError hint
    (with the jar present, the roundtrip must work instead)."""
    p = str(tmp_path / "data.avro")
    df = lineitem.select("l_orderkey", "l_quantity").limit(10)
    assert peio.detect_format(p) == "avro"
    try:
        peio.save(df, p)
    except NotImplementedError as e:
        assert "spark-avro" in str(e)
        with pytest.raises(NotImplementedError):
            peio.load(spark, p)
    else:
        assert peio.load(spark, p).count() == 10


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


@pytest.mark.skipif(
    _has_excel_engine(), reason="openpyxl present: the guard path is inert here"
)
def test_excel_gate_documented(spark, tmp_path, lineitem):
    """README 'Documented divergences': without openpyxl/xlrd, BOTH Excel
    directions fail with a clean NotImplementedError naming the missing
    dependency — never a bare ImportError from deep inside pandas."""
    import parquet_editor_spark.io as peio

    import zipfile

    xlsx = tmp_path / "t.xlsx"
    with zipfile.ZipFile(xlsx, "w") as z:  # valid zip, engine import is
        z.writestr("xl/workbook.xml", "<workbook/>")  # the first failure
    with pytest.raises(NotImplementedError, match="openpyxl"):
        peio.load(spark, str(xlsx))
    with pytest.raises(NotImplementedError, match="openpyxl"):
        peio.save(lineitem.limit(3), str(tmp_path / "t.xlsx"))


@pytest.mark.skipif(
    not _has_excel_engine(), reason="openpyxl absent in this image"
)
def test_excel_round_trip_when_engine_present(spark, tmp_path, lineitem):
    """On an image WITH openpyxl the same guarded paths round-trip."""
    import parquet_editor_spark.io as peio

    p = str(tmp_path / "t.xlsx")
    peio.save(lineitem.limit(5).select("l_orderkey", "l_quantity"), p)
    back = peio.load(spark, p)
    assert back.count() == 5
