"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship pivot; ``queries()`` maps
every implemented operator from SURVEY.md §2 to a (spark, sf_dir) →
DataFrame callable; ``oracle_sql()`` gives the DuckDB-equivalent ANSI
SQL. Column names/aliases match exactly on both sides; float
aggregates are rounded identically on both sides so the driver's
order-insensitive value hash is stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_editor_spark.operators import query as q

SF1 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's one real aggregation — pivot_table
    (main.pyc:158-174) — on lineitem at sf0.001."""
    return q.pivot_table(
        _t(spark, SF1, "lineitem"),
        index="l_returnflag",
        columns="l_linestatus",
        values="l_extendedprice",
        aggfunc="mean",
        round_to=2,
    )


# ---------------------------------------------------------------------------
# queries — one per implemented operator (SURVEY.md §2)
# ---------------------------------------------------------------------------

def _pivot(aggfunc: str, round_to=2):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return q.pivot_table(
            _t(spark, sf_dir, "lineitem"),
            "l_returnflag",
            "l_linestatus",
            "l_extendedprice",
            aggfunc,
            pivot_values=["F", "O"],
            round_to=round_to,
        )

    return run


def _pivot_oracle(fn_sql: str, round_to=2) -> str:
    def cell(status: str) -> str:
        inner = f"{fn_sql}(CASE WHEN l_linestatus='{status}' THEN l_extendedprice END)"
        if round_to is None:
            return f"{inner} AS {status}"
        return f"round({inner}, {round_to}) AS {status}"

    return (
        f"SELECT l_returnflag, {cell('F')}, {cell('O')} "
        "FROM lineitem WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL "
        "GROUP BY l_returnflag"
    )


def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: group-by two keys, multiple aggregates —
    Catalyst plans partial (map-side) + final aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection — both push into the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: plans TakeOrderedAndProject (no global sort)."""
    return q.top_k(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        by=["o_totalprice", "o_orderkey"],
        k=100,
        ascending=[False, True],
    )


def q_scan_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of a dimension (reference load path, main.pyc:313-320)."""
    return _t(spark, sf_dir, "region")


def q_numeric_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select_dtypes(numeric) analog (main.pyc:405-406) + histogram guard."""
    return q.select_numeric(_t(spark, sf_dir, "lineitem"))


def q_histogram_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Server-side histogram feeding the reference's hist plot (main.pyc:381)."""
    return q.histogram(_t(spark, sf_dir, "lineitem"), "l_quantity", 5.0)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pivot_mean": _pivot("mean"),
        "pivot_sum": _pivot("sum"),
        "pivot_count": _pivot("count", round_to=None),
        "pivot_max": _pivot("max", round_to=None),
        "pivot_min": _pivot("min", round_to=None),
        "groupby_agg": q_groupby_agg,
        "filter_project": q_filter_project,
        "topk_orders": q_topk_orders,
        "scan_region": q_scan_region,
        "numeric_projection": q_numeric_projection,
        "histogram_quantity": q_histogram_quantity,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pivot_mean": _pivot_oracle("avg"),
        "pivot_sum": _pivot_oracle("sum"),
        "pivot_count": (
            "SELECT l_returnflag, "
            "count(CASE WHEN l_linestatus='F' THEN l_extendedprice END) AS F, "
            "count(CASE WHEN l_linestatus='O' THEN l_extendedprice END) AS O "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "pivot_max": _pivot_oracle("max", round_to=None),
        "pivot_min": _pivot_oracle("min", round_to=None),
        "groupby_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "filter_project": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_quantity > 45
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
        """,
        "scan_region": "SELECT r_regionkey, r_name FROM region",
        "numeric_projection": """
            SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax
            FROM lineitem
        """,
        "histogram_quantity": """
            SELECT CAST(floor(l_quantity / 5.0) AS BIGINT) AS bin,
                   floor(l_quantity / 5.0) * 5.0 AS bin_start,
                   count(*) AS n
            FROM lineitem WHERE l_quantity IS NOT NULL
            GROUP BY 1, 2
        """,
    }
