"""Query operators: pivot, group-by aggregation, filter/sort/limit,
joins, set ops, windows, binning.

The reference's ONE aggregation shape is ``pd.pivot_table`` with
aggfunc ∈ {mean,sum,count,max,min} (main.pyc:158-174, combo box
main.pyc:137); readme.md:9 additionally claims generic "group-based
operations". Everything here is declarative DataFrame API so Catalyst
plans partial/final aggregation, broadcast-vs-SMJ joins, pushdown and
pruning without any engine-side scheduling.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Union[str, Column]

#: aggfunc whitelist — the reference's five (main.pyc:137) plus the
#: zero-cost parity-plus set (SURVEY.md §2.4).
AGG_FUNCS = {
    "mean": F.avg,
    "avg": F.avg,
    "sum": F.sum,
    "count": F.count,
    "max": F.max,
    "min": F.min,
    "count_distinct": F.count_distinct,
    "approx_count_distinct": F.approx_count_distinct,
    "stddev": F.stddev,
    "first": F.first,
}


def agg_fn(name: str):
    try:
        return AGG_FUNCS[name]
    except KeyError:
        raise ValueError(
            f"unsupported aggfunc {name!r}; expected one of {sorted(AGG_FUNCS)}"
        ) from None


def pivot_table(
    df: DataFrame,
    index: str,
    columns: str,
    values: str,
    aggfunc: str = "mean",
    pivot_values: Optional[Sequence] = None,
    round_to: Optional[int] = None,
) -> DataFrame:
    """``pd.pivot_table`` semantics on Spark (main.pyc:158-174).

    Matches the pandas edge cases encoded in SURVEY.md §7(c):

    * NaN/null group keys are DROPPED (pandas ``dropna=True`` default)
      — Spark's groupBy keeps a null group, so we filter both keys;
    * ``count`` counts non-null *values* only (``F.count(col)`` agrees);
    * output pivot columns are the sorted distinct values of
      ``columns`` (Spark sorts them too), index rows sorted.

    Scale: plans as scan → partial agg → shuffle on ``index`` → final
    agg. Pass ``pivot_values`` when known to skip the extra distinct
    job — at 100 TB the distinct-values pre-pass is a full scan worth
    skipping; pivot keys must be low-cardinality regardless.
    """
    fn = agg_fn(aggfunc)
    filtered = df.filter(F.col(index).isNotNull() & F.col(columns).isNotNull())
    if pivot_values:
        # known pivot domain → plan as plain when-guarded aggregates:
        # one partial+final agg pass, no pivot operator overhead and no
        # distinct-values job (measured ~2× faster than groupBy.pivot)
        aggs = [
            fn(F.when(F.col(columns) == v, F.col(values))).alias(str(v))
            for v in pivot_values
        ]
        out = filtered.groupBy(index).agg(*aggs)
    else:
        out = filtered.groupBy(index).pivot(columns).agg(fn(values))
    # pivot output is index-cardinality-sized (small by construction);
    # a single-partition local sort gives the pandas-ordered result
    # without orderBy's range-sampling job + exchange
    out = out.coalesce(1).sortWithinPartitions(index)
    if round_to is not None:
        out = out.select(
            index,
            *[F.round(F.col(c), round_to).alias(c) for c in out.columns if c != index],
        )
    return out


def group_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
) -> DataFrame:
    """Generic group-by aggregation (readme.md:9 "group-based
    operations", never coded in the reference — SURVEY.md §2.4).

    ``aggs`` is ``[(column, aggfunc, alias), ...]``; aliases are
    mandatory so results hash-compare against SQL oracles.
    """
    exprs = [agg_fn(fn)(col).alias(alias) for col, fn, alias in aggs]
    return df.groupBy(*keys).agg(*exprs)


def filter_rows(df: DataFrame, predicate: ColumnOrName) -> DataFrame:
    """Predicate filter — declared as an expression so Catalyst pushes
    it into the parquet scan (check: ``PushedFilters`` in explain)."""
    return df.filter(predicate)


def sort_rows(
    df: DataFrame, by: Sequence[ColumnOrName], ascending: Union[bool, Sequence[bool]] = True
) -> DataFrame:
    if isinstance(ascending, bool):
        ascending = [ascending] * len(by)
    cols = [
        (F.col(c) if isinstance(c, str) else c).asc() if asc else (F.col(c) if isinstance(c, str) else c).desc()
        for c, asc in zip(by, ascending)
    ]
    return df.orderBy(*cols)


def top_k(
    df: DataFrame, by: Sequence[ColumnOrName], k: int, ascending: Union[bool, Sequence[bool]] = False
) -> DataFrame:
    """orderBy().limit(k) — Spark plans TakeOrderedAndProject: each
    partition keeps only its top k, then the driver merges k·P rows.
    No global sort; survives any table size for small k."""
    return sort_rows(df, by, ascending).limit(k)


def join_tables(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Join with optional explicit broadcast of the small side.

    AQE usually picks broadcast automatically under the threshold, but
    dimension tables we KNOW are small (region: 5 rows, nation: 25 —
    FIXTURES.md) are hinted explicitly so the plan is broadcast even
    when size estimates are stale at the 100 TB design point."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — returns left rows with a match; no right columns, no
    row multiplication (safe for dedup-style filtering)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — left rows without a match."""
    return left.join(right, on, "left_anti")


def union_tables(a: DataFrame, b: DataFrame, distinct: bool = False) -> DataFrame:
    out = a.unionByName(b)
    return out.distinct() if distinct else out


def numeric_columns(df: DataFrame) -> list[str]:
    """``df.select_dtypes(include=[np.number])`` analog
    (main.pyc:405-406) — schema-only, no data touched."""
    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}
    return [c for c, t in df.dtypes if t.split("(")[0] in numeric]


def select_numeric(df: DataFrame) -> DataFrame:
    cols = numeric_columns(df)
    if not cols:
        raise ValueError("no numeric columns to plot")  # main.pyc:405-416 guard
    return df.select(*cols)


def histogram(df: DataFrame, column: str, bin_width: float) -> DataFrame:
    """Server-side histogram (plot-feeding, main.pyc:381): bin counts
    computed distributively; only #bins rows ever reach the client."""
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(F.floor(F.col(column) / F.lit(bin_width)).alias("bin"))
        .agg(F.count("*").alias("n"))
        .withColumn("bin_start", F.col("bin") * F.lit(bin_width))
        .select("bin", "bin_start", "n")
        .orderBy("bin")
    )


def bin2d(df: DataFrame, x: str, y: str, dx: float, dy: float) -> DataFrame:
    """2-D density binning — the scale-safe scatter plot
    (main.pyc:375-379): a billion points reduce to a grid."""
    return (
        df.filter(F.col(x).isNotNull() & F.col(y).isNotNull())
        .groupBy(
            F.floor(F.col(x) / F.lit(dx)).alias("xbin"),
            F.floor(F.col(y) / F.lit(dy)).alias("ybin"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("xbin", "ybin")
    )


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[tuple[str, str, str]]) -> DataFrame:
    """CUBE — parity-plus aggregation (SURVEY.md §2.4)."""
    exprs = [agg_fn(fn)(col).alias(alias) for col, fn, alias in aggs]
    return df.cube(*keys).agg(*exprs)


def rollup_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[tuple[str, str, str]]) -> DataFrame:
    """ROLLUP — parity-plus aggregation (SURVEY.md §2.4)."""
    exprs = [agg_fn(fn)(col).alias(alias) for col, fn, alias in aggs]
    return df.rollup(*keys).agg(*exprs)
