"""Frequency sketching: distributed count-min with verified bounds.

Completes the sketch family alongside the HLL cardinality bound
(q_hll_error_bound) and the approx-quantile rank-error bound
(q_quantile_error_bound): count-min answers point frequency queries
in O(depth·width) memory with a ONE-SIDED error guarantee —
``exact ≤ estimate ≤ exact + εN`` — which makes it differentially
checkable without tolerance hand-waving.

The sketch is a pure aggregation: CMS increments are additive, so
building it from pre-aggregated (word, count) rows is bit-identical
to streaming per-token increments, and merging shard sketches is
cell-wise addition — the property that makes CMS the standard
distributed heavy-hitters structure.  Bucket hashes are the repo's
portable md5-hex construction (doc_rolling_hash convention), so the
DuckDB oracle replays the identical sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parquet_editor_spark.functions.text import tokens


def _bucket(col, j: int, width: int):
    """Portable bucket hash: first 8 md5 hex chars of ``j|word`` as a
    32-bit int, mod width — byte-identical in any engine with md5."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(str(j)), col)), 1, 8),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_topk_bound(
    df: DataFrame,
    text_col: str,
    depth: int = 4,
    width: int = 256,
    k: int = 20,
) -> DataFrame:
    """Count-min estimates vs exact counts for the ``k`` most frequent
    corpus words: ``(word, exact, estimate, within_bound)`` ordered by
    (exact desc, word), where ``within_bound`` checks the CMS
    guarantee ``exact ≤ est ≤ exact + ceil(e/width · N)`` in pure
    integer arithmetic.

    Scale shape: ONE token explode feeds both the exact word counts
    (hash agg, vocab-sized after map-side combine) and the sketch —
    which is just ``depth`` bucket projections of those counts
    re-aggregated to ``depth×width`` cells, then broadcast back for
    the min-over-rows estimate.  The sketch side never touches corpus
    tokens a second time."""
    from pyspark import StorageLevel

    # PERSISTED: exact feeds three branches (cells, topk, total) —
    # without the persist the corpus tokenize+explode re-runs per
    # branch (the retrieval.py tf lesson); attached to the result for
    # dedup.release_caches
    exact = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cells = (
        exact.select(
            "c",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            _bucket(F.col("w"), j, width).alias("b"),
                        )
                        for j in range(depth)
                    ]
                )
            ).alias("jb"),
        )
        .groupBy("jb.j", "jb.b")
        .agg(F.sum("c").alias("cell"))
    )
    total = exact.agg(F.sum("c").cast("long").alias("N"))
    topk = exact.orderBy(F.desc("c"), F.asc("w")).limit(k)
    probes = topk.select(
        "w",
        "c",
        *[_bucket(F.col("w"), j, width).alias(f"b{j}") for j in range(depth)],
    )
    est = probes
    for j in range(depth):
        cj = cells.filter(F.col("j") == j).select(
            F.col("b").alias(f"b{j}"), F.col("cell").alias(f"e{j}")
        )
        est = est.join(F.broadcast(cj), f"b{j}")
    estimate = F.least(*[F.col(f"e{j}") for j in range(depth)])
    # ε = e/width; integer bound: (est - exact) * width <= ceil(e*N) with
    # e ≈ 2.71828: use 3·N (a slightly loose but integer-exact cover)
    within = (
        (estimate >= F.col("c"))
        & ((estimate - F.col("c")) * width <= 3 * F.col("N"))
    )
    out = (
        est.crossJoin(F.broadcast(total))
        .select(
            "w",
            F.col("c").cast("long").alias("exact"),
            estimate.cast("long").alias("estimate"),
            within.alias("within_bound"),
        )
        .orderBy(F.desc("exact"), F.asc("w"))
    )
    out._pes_caches = [exact]
    return out
