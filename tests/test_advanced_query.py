"""Differential tests for the advanced relational operators: as-of
join vs pandas merge_asof, range join vs brute-force filter, unpivot
vs manual melt, percentiles vs numpy."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from parquet_editor_spark.io import load_parquet_nanos
from parquet_editor_spark.operators import query as q


@pytest.fixture(scope="module")
def events_ts(spark, sf_dir):
    return load_parquet_nanos(spark, f"{sf_dir}/events.parquet")


def test_asof_join_matches_merge_asof(events_ts):
    ev = events_ts.select("event_id", "ts", "user_id", "event_type", "value")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("value").alias("click_value")
    )
    got = q.asof_join(
        ev, clicks, on="user_id", left_ts="ts", right_ts="cts",
        right_cols=["click_value"],
    ).toPandas().sort_values("event_id").reset_index(drop=True)

    pev = ev.toPandas().sort_values("ts").reset_index(drop=True)
    pcl = (
        clicks.toPandas().sort_values("cts").reset_index(drop=True)
    )
    want = pd.merge_asof(
        pev, pcl, left_on="ts", right_on="cts", by="user_id",
        direction="backward", allow_exact_matches=True,
    ).sort_values("event_id").reset_index(drop=True)

    assert len(got) == len(want)
    pd.testing.assert_series_equal(
        got["click_value_asof"], want["click_value"], check_names=False
    )
    pd.testing.assert_series_equal(
        got["cts_asof"], want["cts"], check_names=False
    )


def test_range_join_matches_bruteforce(spark, lineitem):
    bands = spark.createDataFrame(
        [(0, 0.0, 25000.0), (1, 25000.0, 60000.0), (2, 60000.0, 200000.0)],
        "band int, lo double, hi double",
    )
    li = lineitem.select("l_extendedprice")
    got = {
        r["band"]: r["n"]
        for r in q.range_join(li, "l_extendedprice", bands, "lo", "hi", 10000.0)
        .groupBy("band").agg(F.count("*").alias("n")).collect()
    }
    pli = li.toPandas()["l_extendedprice"]
    want = {
        b: int(((pli >= lo) & (pli < hi)).sum())
        for b, lo, hi in [(0, 0.0, 25000.0), (1, 25000.0, 60000.0), (2, 60000.0, 200000.0)]
    }
    want = {k: v for k, v in want.items() if v > 0}
    assert got == want


def test_unpivot_long_form(lineitem):
    long = q.unpivot(
        lineitem, ["l_orderkey", "l_linenumber"], ["l_quantity", "l_tax"],
        "measure", "value",
    )
    assert long.count() == lineitem.count() * 2
    assert set(long.columns) == {"l_orderkey", "l_linenumber", "measure", "value"}


def test_percentiles_match_numpy(lineitem):
    got = {
        r["l_returnflag"]: (r["p25"], r["p50"], r["p75"])
        for r in q.percentiles(lineitem, ["l_returnflag"], "l_quantity").collect()
    }
    pdf = lineitem.select("l_returnflag", "l_quantity").toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        want = np.percentile(grp["l_quantity"], [25, 50, 75], method="linear")
        assert got[flag] == pytest.approx(tuple(np.round(want, 4)))


def test_describe_stats_matches_pandas(lineitem):
    got = {
        r["column_name"]: (r["n"], r["mean"], r["stddev"])
        for r in q.describe_stats(lineitem, ["l_quantity", "l_discount"]).collect()
    }
    pdf = lineitem.select("l_quantity", "l_discount").toPandas()
    for c in ["l_quantity", "l_discount"]:
        n, mean, std = got[c]
        assert n == pdf[c].count()
        assert mean == pytest.approx(round(pdf[c].mean(), 4), abs=1e-4)
        assert std == pytest.approx(round(pdf[c].std(ddof=1), 4), abs=1e-4)


def test_asof_join_no_single_partition_exchange(events_ts):
    from parquet_editor_spark import plans as P

    ev = events_ts.select("event_id", "ts", "user_id", "value")
    clicks = ev.select("user_id", F.col("ts").alias("cts"), F.col("value").alias("cv"))
    out = q.asof_join(ev, clicks, "user_id", "ts", "cts", ["cv"])
    assert not P.has_single_partition_exchange(out)

def test_hash_split_deterministic_and_complete(documents):
    docs = documents.select("doc_id")
    a = {r["doc_id"]: r["split"] for r in
         q.hash_split(docs, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in
         q.hash_split(docs, "doc_id").collect()}
    assert a == b                                # pure function of the id
    assert set(a.values()) == {"train", "val", "test"}
    n = len(a)
    n_train = sum(1 for v in a.values() if v == "train")
    n_val = sum(1 for v in a.values() if v == "val")
    # 80/10/10 target, wide binomial tolerance at 500 docs
    assert 0.70 * n <= n_train <= 0.90 * n
    assert 0.04 * n <= n_val <= 0.16 * n


def test_hash_split_portable_matches_xxhash_shape(documents):
    docs = documents.select("doc_id")
    p = q.hash_split(docs, "doc_id", method="portable")
    counts = {r["split"]: r["n"] for r in
              p.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert 0.70 * n <= counts["train"] <= 0.90 * n
    with pytest.raises(ValueError):
        q.hash_split(docs, "doc_id", method="nope")


def test_resample_ffill_gap_semantics(spark):
    """Hand-built series: day 1 and day 4 observed, days 2-3 are gaps
    — v_obs stays NULL there, v_fill carries day 1's value; a second
    key densifies independently from its own bounds."""
    rows = [
        (1, "2024-03-01 10:00:00", 10.0),
        (1, "2024-03-01 14:00:00", 20.0),
        (1, "2024-03-04 09:00:00", 40.0),
        (2, "2024-03-02 00:30:00", 7.0),
    ]
    df = spark.createDataFrame(rows, "k int, ts string, value double").select(
        "k", F.col("ts").cast("timestamp_ntz").alias("ts"), "value"
    )
    out = q.resample_ffill(df, "k", "ts", "value", unit="day")
    got = {
        (r["key"], str(r["bucket"])[:10]): (r["v_obs"], r["v_fill"])
        for r in out.collect()
    }
    assert len(got) == 5  # key 1: 4 days, key 2: 1 day
    assert got[(1, "2024-03-01")] == (15.0, 15.0)
    assert got[(1, "2024-03-02")] == (None, 15.0)
    assert got[(1, "2024-03-03")] == (None, 15.0)
    assert got[(1, "2024-03-04")] == (40.0, 40.0)
    assert got[(2, "2024-03-02")] == (7.0, 7.0)


def test_time_rollup_grains_consistent(spark, sf_dir):
    """One-scan GROUPING SETS rollup: the hour-grain rows must sum to
    the day-grain rows, and counts per grain must all equal the input
    row count."""
    ev = load_parquet_nanos(spark, f"{sf_dir}/events.parquet")
    out = q.time_rollup(ev, "ts", "value", ("hour", "day")).collect()
    total = ev.count()
    by_grain = {}
    for r in out:
        g = by_grain.setdefault(r["grain"], {"n": 0, "val": 0.0})
        g["n"] += r["n"]
        g["val"] += r["val"]
    assert set(by_grain) == {"hour", "day"}
    assert by_grain["hour"]["n"] == total == by_grain["day"]["n"]
    assert abs(by_grain["hour"]["val"] - by_grain["day"]["val"]) < 1e-4 * total


def test_resample_interp_linear_values(spark):
    """10 on day 1, 40 on day 4 — days 2 and 3 interpolate to exactly
    20 and 30; observed buckets pass through untouched."""
    rows = [
        (1, "2024-03-01 08:00:00", 10.0),
        (1, "2024-03-04 20:00:00", 40.0),
    ]
    df = spark.createDataFrame(rows, "k int, ts string, value double").select(
        "k", F.col("ts").cast("timestamp_ntz").alias("ts"), "value"
    )
    out = q.resample_interp(df, "k", "ts", "value", unit="day")
    got = {
        str(r["bucket"])[:10]: (r["v_obs"], r["v_interp"])
        for r in out.collect()
    }
    assert got == {
        "2024-03-01": (10.0, 10.0),
        "2024-03-02": (None, 20.0),
        "2024-03-03": (None, 30.0),
        "2024-03-04": (40.0, 40.0),
    }


def test_stratified_sample_hash_rates_and_determinism(documents):
    fr = {"en": 0.3, "zh": 0.8}
    a = q.stratified_sample_hash(documents, "lang", "doc_id", fr)
    b = q.stratified_sample_hash(documents, "lang", "doc_id", fr)
    ra = sorted(r["doc_id"] for r in a.collect())
    assert ra == sorted(r["doc_id"] for r in b.collect())  # pure function
    counts = {
        r["lang"]: r["n"]
        for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in documents.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) <= {"en", "zh"}
    for lang, frac in fr.items():
        got = counts.get(lang, 0) / totals[lang]
        assert abs(got - frac) < 0.25  # hash-uniformity tolerance at 500 docs


class TestCorrMatrixExact:
    def test_matches_pandas_corr(self, spark, lineitem):
        import numpy as np

        cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        from parquet_editor_spark.operators.query import corr_matrix_exact

        got = {
            (r["x_col"], r["y_col"]): r["corr"]
            for r in corr_matrix_exact(lineitem, cols).collect()
        }
        pdf = lineitem.select(cols).toPandas()
        # quantize to cents first: the operator's documented semantics
        want = (pdf * 100).round(0).corr()
        assert set(got) == {
            (a, b) for i, a in enumerate(cols) for b in cols[i + 1:]
        }
        for (a, b), v in got.items():
            assert abs(v - want.loc[a, b]) < 1e-6, (a, b)

    def test_single_agg_pass(self, spark, lineitem):
        """Scale guard: the whole matrix is ONE aggregate over the scan
        (k(k+1)/2+k sums in one partial agg), not one scan per pair."""
        from parquet_editor_spark.operators.query import corr_matrix_exact

        plan = (
            corr_matrix_exact(lineitem, ["l_quantity", "l_extendedprice", "l_tax"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("FileScan") + plan.count("Scan parquet") <= 2

    def test_rejects_single_column(self, lineitem):
        import pytest as _pytest

        from parquet_editor_spark.operators.query import corr_matrix_exact

        with _pytest.raises(ValueError):
            corr_matrix_exact(lineitem, ["l_quantity"])


def test_weighted_sample_k_deterministic_and_biased(spark):
    """Exponential-race weighted sampling: exact size k, identical
    draw on re-run and after repartitioning, and heavier rows are
    actually favored (mean weight of the sample beats the population
    mean); plan is TakeOrderedAndProject, not a global sort."""
    from pyspark.sql import functions as F

    from parquet_editor_spark.operators import query as q

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100 + 1).alias("w"),
    )
    a = q.weighted_sample_k(df, "doc_id", "w", 100)
    b = q.weighted_sample_k(df.repartition(13), "doc_id", "w", 100)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    assert len(ids_a) == 100 and ids_a == ids_b
    mean_w = df.agg(F.avg("w")).collect()[0][0]
    samp_w = a.agg(F.avg("w")).collect()[0][0]
    assert samp_w > 1.3 * mean_w, (samp_w, mean_w)
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
