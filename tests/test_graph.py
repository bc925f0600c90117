"""Fixed-iteration weighted PageRank — semantics against a numpy
power-iteration reference, plus dangling-mass conservation."""

import pytest
from pyspark.sql import functions as F

from parquet_editor_spark.operators import graph as G


def _np_pagerank(edges, iters=3, d=0.85):
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    r = [1.0 / N] * N
    for _ in range(iters):
        dm = sum(r[idx[n]] for n in nodes if n not in outw)
        c = [0.0] * N
        for s, t, w in edges:
            c[idx[t]] += r[idx[s]] * (w / outw[s])
        r = [(1.0 - d) / N + d * (c[i] + dm / N) for i in range(N)]
    return {n: round(r[idx[n]], 6) for n in nodes}


def test_pagerank_matches_power_iteration(spark):
    edges = [
        ("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0),
        ("c", "a", 1.0), ("d", "a", 1.0),  # d has no in-edges
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {
        r["node"]: r["rank"]
        for r in G.pagerank(df, "src", "dst", "w", iters=3).collect()
    }
    assert got == _np_pagerank(edges)


def test_pagerank_dangling_mass_redistributed(spark):
    # b is dangling (no out-edges): total rank must stay ~1
    edges = [("a", "b", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    rows = G.pagerank(df, "src", "dst", "w", iters=5).collect()
    total = sum(r["rank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-4)
    assert {r["node"] for r in rows} == {"a", "b"}


def test_pagerank_uniform_on_symmetric_cycle(spark):
    edges = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    ranks = [r["rank"] for r in G.pagerank(df, "src", "dst", "w").collect()]
    assert all(r == pytest.approx(1 / 3, abs=1e-6) for r in ranks)


def test_pagerank_empty_graph_returns_empty(spark):
    e = spark.createDataFrame([], "src string, dst string, w double")
    assert G.pagerank(e, "src", "dst", "w").count() == 0


def test_pagerank_zero_weight_node_is_dangling(spark):
    # 'a' has only zero-weight out-edges: its mass must teleport, not
    # vanish (or crash under ANSI) — total rank stays ~1
    edges = [("a", "b", 0.0), ("b", "a", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    rows = G.pagerank(df, "src", "dst", "w", iters=5).collect()
    assert sum(r["rank"] for r in rows) == pytest.approx(1.0, abs=1e-4)


def test_pagerank_deep_iteration_lineage_bounded(spark):
    """r4 verdict item 7: at iters=20 the checkpointed plan must stay
    shallow (lineage truncated every checkpoint_every supersteps) and
    still match the numpy power iteration exactly."""
    edges = [
        ("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0),
        ("c", "a", 1.0), ("d", "a", 1.0),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w double")

    def joins_at(iters):
        out = G.pagerank(df, "src", "dst", "w", iters=iters,
                         checkpoint_every=4)
        return out, out._jdf.queryExecution().analyzed().toString()

    out20, plan20 = joins_at(20)
    _, plan12 = joins_at(12)
    # each iteration references the previous ranks twice, so an
    # untruncated unroll is 2^iters subplans; with checkpointing the
    # post-checkpoint tail (and so the whole plan) must be INDEPENDENT
    # of iters — 20 and 12 iterations land on identical tail shapes
    assert plan20.count("Join") == plan12.count("Join")
    assert "LogicalRDD" in plan20  # the checkpoint cut is visible
    got = {r["node"]: r["rank"] for r in out20.collect()}
    assert got == _np_pagerank(edges, iters=20)


def test_pagerank_checkpoint_disabled_matches(spark):
    """checkpoint_every=0 turns truncation off; values identical.
    iters kept small — the unbounded-lineage analysis cost at high
    iters is exactly what checkpointing exists to avoid."""
    edges = [("a", "b", 1.0), ("b", "a", 1.0), ("b", "c", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    with_cp = {
        r["node"]: r["rank"]
        for r in G.pagerank(df, "src", "dst", "w", iters=6,
                            checkpoint_every=2).collect()
    }
    without = {
        r["node"]: r["rank"]
        for r in G.pagerank(df, "src", "dst", "w", iters=6,
                            checkpoint_every=0).collect()
    }
    assert with_cp == without == _np_pagerank(edges, iters=6)
