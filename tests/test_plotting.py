"""Plot-feeding data-prep tests (SURVEY.md §2.5): server-side
reduction shapes + the gated matplotlib render."""

import pytest

from parquet_editor_spark.operators import plotting as PL


def test_line_series_downsamples(lineitem):
    out = PL.line_series(
        lineitem, ["l_quantity"], max_points=100,
        order=["l_orderkey", "l_linenumber"],
    )
    n = out.count()
    assert 0 < n <= 101
    assert out.columns == ["x", "l_quantity"]


def test_line_series_small_table_untouched(spark):
    df = spark.createDataFrame([(float(i),) for i in range(7)], "v double")
    out = PL.line_series(df, ["v"], max_points=100)
    assert out.count() == 7


def test_line_series_rejects_non_numeric(spark):
    df = spark.createDataFrame([("a",)], "s string")
    with pytest.raises(ValueError, match="no numeric columns"):
        PL.line_series(df)


def test_scatter_sample_seeded_deterministic(lineitem):
    a = PL.scatter_sample(lineitem, "l_discount", "l_tax", 0.1).count()
    b = PL.scatter_sample(lineitem, "l_discount", "l_tax", 0.1).count()
    assert a == b > 0


def test_histogram_data_auto_width(lineitem):
    h = PL.histogram_data(lineitem, "l_quantity", bins=10).toPandas()
    assert h["n"].sum() == lineitem.count()
    assert len(h) <= 12  # bins + boundary slop


def test_render_gated_without_matplotlib(lineitem):
    pdf = PL.line_series(
        lineitem, ["l_quantity"], max_points=10,
        order=["l_orderkey", "l_linenumber"],
    ).toPandas()
    try:
        import matplotlib  # noqa: F401

        has_mpl = True
    except ImportError:
        has_mpl = False
    if has_mpl:
        assert PL.render_line(pdf) is not None
    else:
        with pytest.raises(NotImplementedError, match="matplotlib"):
            PL.render_line(pdf)