"""Graph analytics on DataFrames: fixed-iteration weighted PageRank.

No reference counterpart (SURVEY.md §0.1 — the reference is a single
-table editor); this is the iterative-algorithm representative of the
engine: each iteration is one join + one aggregation over the edge
relation, the plan Spark executes for Pregel-style algorithms when
you unroll a bounded number of supersteps.  The connected-components
sibling (label propagation with lineage checkpointing) lives in
dedup.py.

Scale shape per iteration: ranks (|V| rows) broadcast-or-shuffle join
onto the out-weight-normalized edge list (|E| rows, co-partitioned by
source), one hash agg back to |V| rows, plus two scalar aggregates
(dangling mass, for nodes with no out-edges).  Iterations unroll into
one lazy plan up to ``checkpoint_every`` supersteps, then
``localCheckpoint`` truncates the lineage (same lesson as dedup.py's
label propagation) — without it, plan analysis/codegen cost grows
superlinearly with iters and 20+ supersteps hit the optimizer wall
long before any data-size limit.

:func:`pagerank_sql_ctes` emits byte-identical arithmetic as chained
SQL CTEs from the same recurrence (the hilbert_sql_ctes convention)
so a differential oracle can replay every iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 3,
    damping: float = 0.85,
    round_to: int = 6,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted PageRank after ``iters`` synchronous iterations:

    ``r'(j) = (1−d)/N + d·(Σᵢ r(i)·w̄ᵢⱼ + dangling/N)``

    with ``w̄ᵢⱼ`` the out-weight-normalized edge weight and
    ``dangling`` the rank mass on nodes without out-edges
    (redistributed uniformly — the standard teleport fix).  All nodes
    appearing as src or dst participate; unweighted edges pass
    ``weight=None``.

    The fixed expression order (normalize once, then per iteration:
    contribution sum → add teleport) is mirrored exactly by
    :func:`pagerank_sql_ctes`, so the pre-round doubles agree across
    engines to the last compounding ulp — rounded at ``round_to``,
    orders of magnitude above that noise."""
    w = F.col(weight) if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("t"), w.alias("w")
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("t")))
        .distinct()
    )
    n_nodes = nodes.count()  # scalar by design: N parameterizes the plan
    if n_nodes == 0:
        # graceful empty result (the SQL mirror returns empty too)
        return edges.sparkSession.createDataFrame(
            [], "node string, rank double"
        )
    # a node whose weights sum to 0 has no outgoing mass: treat it as
    # DANGLING (filter it from outw) — dividing by the zero sum would
    # abort under ANSI mode or silently vanish its rank mass
    out = (
        e.groupBy("s")
        .agg(F.sum("w").alias("out_w"))
        .filter(F.col("out_w") > 0)
    )
    norm = e.join(out, "s").select(
        "s", "t", (F.col("w") / F.col("out_w")).alias("wn")
    )
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("r"))
    has_out = out.select(F.col("s").alias("node"))
    for it in range(iters):
        if it > 0 and checkpoint_every > 0 and it % checkpoint_every == 0:
            # truncate the unrolled lineage so optimizer/codegen cost
            # stays bounded at high iteration counts: each iteration
            # references the previous ranks TWICE (contribution join +
            # dangling-mass aggregate), so an unbounded unroll is
            # 2^iters subplans — the checkpoint caps it at
            # 2^checkpoint_every regardless of iters.  eager=True
            # materializes |V| rows on executors — tiny next to |E|
            from parquet_editor_spark.boundary import stage_boundary

            ranks = stage_boundary(ranks)
        dangling = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm"))
        )
        contrib = (
            ranks.join(norm, ranks.node == norm.s)
            .groupBy("t")
            .agg(F.sum(F.col("r") * F.col("wn")).alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.t, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dm") / n_nodes
                    )
                ).alias("r"),
            )
        )
    return ranks.select("node", F.round("r", round_to).alias("rank"))


def pagerank_sql_ctes(
    edges_sql: str,
    src: str,
    dst: str,
    weight_expr: str,
    iters: int = 3,
    damping: float = 0.85,
    round_to: int = 6,
) -> str:
    """The exact SQL mirror of :func:`pagerank`: the same recurrence
    as chained CTEs (r0..rN), generated from one spec so both engines
    compute byte-identical doubles before the final round."""
    d = damping
    parts = [
        f"e AS (SELECT {src} AS s, {dst} AS t, {weight_expr} AS w "
        f"FROM ({edges_sql}))",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT s AS node FROM e UNION ALL SELECT t FROM e))",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS N FROM nodes)",
        "outw AS (SELECT s, sum(w) AS out_w FROM e GROUP BY s "
        "HAVING sum(w) > 0)",
        "norm AS (SELECT e.s, e.t, e.w / o.out_w AS wn "
        "FROM e JOIN outw o ON o.s = e.s)",
        "r0 AS (SELECT node, 1.0 / N AS r FROM nodes CROSS JOIN nn)",
    ]
    for k in range(iters):
        parts.append(
            # NOT EXISTS, not NOT IN: a NULL src would make NOT IN
            # return NULL for every row (dm stuck at 0), diverging
            # from the DataFrame path's left_anti semantics
            f"dm{k} AS (SELECT coalesce(sum(r), 0.0) AS dm FROM r{k} "
            f"WHERE NOT EXISTS (SELECT 1 FROM outw "
            f"WHERE outw.s = r{k}.node))"
        )
        parts.append(
            f"c{k} AS (SELECT t, sum(r * wn) AS c "
            f"FROM r{k} JOIN norm ON norm.s = r{k}.node GROUP BY t)"
        )
        parts.append(
            # emit the PRE-COMPUTED float constant: SQL '1.0 - 0.85'
            # evaluates in exact decimal and lands one ulp away from
            # Python's binary 1.0-0.85, breaking byte-identity
            f"r{k + 1} AS (SELECT node, "
            f"{(1.0 - d)!r} / N + {d} * (coalesce(c, 0.0) + dm / N) AS r "
            f"FROM nodes LEFT JOIN c{k} ON c{k}.t = nodes.node "
            f"CROSS JOIN nn CROSS JOIN dm{k})"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, round(r, {round_to}) AS rank FROM r{iters}"
    )
