"""Scale-guardrail tests: assert the PHYSICAL PLAN properties that
make each headline operator survive a 100× scale-up (SURVEY.md §4),
not just its output. A regression here is a performance bug even when
every value is still correct."""

import pytest
from pyspark.sql import functions as F

from parquet_editor_spark import plans as P
from parquet_editor_spark.operators import edit as E
from parquet_editor_spark.operators import query as q



def _sp_benign(df, max_n):
    """Assert every SinglePartition exchange in the EXECUTED plan is
    the benign metadata class — its input is an aggregation (global
    partials / one-row-per-bucket totals / ordered folds over an
    already-aggregated table), never raw rows through a Sort/Window —
    and pin the count.  The r16 audit found the old formatted-plan
    substring asserts VACUOUS: explain('formatted') prints the
    partitioning in an Arguments line, so "Exchange SinglePartition"
    never literally appears and those checks passed against plans
    that really did hold 0-7 (all-benign) single-partition frames.
    This helper re-pins them against the executed plan, where the
    substring is real."""
    lines = P.executed_plan(df).split("\n")
    seen = 0
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            seen += 1
            below = "\n".join(lines[i + 1 : i + 3])
            assert "HashAggregate" in below or "ObjectHashAggregate" in below or "SortAggregate" in below, (
                "data-sized single-partition frame:\n" + line + "\n" + below
            )
    assert seen <= max_n, (seen, max_n)


def test_filter_pushdown_reaches_scan(lineitem):
    df = lineitem.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    pushed = P.pushed_filters(df)
    assert any("l_quantity" in f for f in pushed), pushed


def test_projection_prunes_read_schema(lineitem):
    df = lineitem.select("l_orderkey", "l_quantity")
    assert P.read_schema_columns(df) == ["l_orderkey", "l_quantity"]


def test_pivot_reads_only_needed_columns(lineitem):
    df = q.pivot_table(
        lineitem, "l_returnflag", "l_linestatus", "l_extendedprice", "mean",
        pivot_values=["F", "O"],
    )
    assert P.read_schema_columns(df) == [
        "l_extendedprice", "l_linestatus", "l_returnflag",
    ]


def test_small_dim_join_is_broadcast(spark, sf_dir, lineitem):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    j = q.join_tables(
        lineitem, part, lineitem.l_partkey == part.p_partkey, broadcast_right=True
    )
    assert P.has_broadcast_join(j)


def test_rid_has_no_single_partition_exchange(lineitem):
    df = E.with_rid(lineitem.select("l_orderkey", "l_linenumber"))
    assert not P.has_single_partition_exchange(df)


def test_ordered_rid_has_no_single_partition_exchange(lineitem):
    df = E.ordered_rid(
        lineitem.select("l_orderkey", "l_linenumber"), ["l_orderkey", "l_linenumber"]
    )
    assert not P.has_single_partition_exchange(df)


def test_window_partitioned_no_global_sort(lineitem):
    from pyspark.sql import Window as W

    w = W.partitionBy("l_suppkey").orderBy("l_shipdate")
    df = lineitem.select("l_suppkey", F.sum("l_quantity").over(w).alias("s"))
    assert not P.has_single_partition_exchange(df)


def test_topk_no_global_sort_exchange(lineitem):
    df = q.top_k(lineitem, ["l_extendedprice"], 10)
    plan = P.executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert not P.has_single_partition_exchange(df)


def test_groupby_agg_stays_in_codegen(lineitem):
    df = (
        lineitem.groupBy("l_returnflag")
        .agg(F.sum("l_quantity"), F.avg("l_extendedprice"))
    )
    df.collect()  # finalize the AQE plan — codegen markers appear then
    assert P.wholestage_codegen_spans(df) >= 1


def test_cell_edit_overlay_is_narrow(lineitem):
    """A point write must not shuffle: same exchanges before and after."""
    base = E.with_rid(lineitem.select("l_orderkey", "l_linenumber", "l_quantity"))
    edited = E.set_cell(base, 5, "l_quantity", "1")
    assert P.executed_plan(base).count("Exchange") == P.executed_plan(edited).count(
        "Exchange"
    )


def test_histogram_aggregates_before_collect(lineitem):
    df = q.histogram(lineitem, "l_quantity", 5.0)
    # the scan's full row count never reaches the driver: plan is
    # scan → partial agg → exchange on bin → final agg
    assert "HashAggregate" in P.executed_plan(df)


def test_contamination_broadcasts_benchmark_no_single_partition(documents):
    from parquet_editor_spark.operators import dedup as D

    corpus = documents.filter(F.col("source") != "src0")
    bench = documents.filter(F.col("source") == "src0")
    df = D.contamination(corpus, bench, "doc_id", "text")
    assert P.has_broadcast_join(df)
    assert not P.has_single_partition_exchange(df)


def test_chunking_is_shuffle_free(documents):
    from parquet_editor_spark.operators import textprep as TP

    df = TP.chunk_documents(documents, "doc_id", "text")
    plan = P.executed_plan(df)
    assert "Exchange" not in plan, plan


def test_pack_sequences_partitioned_no_global_sort(documents):
    from parquet_editor_spark.operators import textprep as TP

    df = TP.pack_sequences(documents, "doc_id", "text", 512,
                           partition_col="source")
    assert not P.has_single_partition_exchange(df)


def test_cleaning_filter_pushdown(lineitem):
    # dropna compiles to a plain IsNotNull predicate → reaches the scan
    df = q.drop_nulls(lineitem.select("l_orderkey", "l_tax"), subset=["l_tax"])
    assert any("l_tax" in f for f in P.pushed_filters(df))


def test_hash_split_is_projection_only(documents):
    df = q.hash_split(documents.select("doc_id"), "doc_id")
    plan = P.executed_plan(df)
    assert "Exchange" not in plan, plan


def test_observe_metrics_no_extra_job(lineitem):
    from pyspark.sql import functions as FF

    staged = lineitem.select(
        "l_orderkey", FF.nullif(FF.col("l_tax"), FF.lit(0.0)).alias("tax")
    )
    observed, obs = P.with_row_accounting(staged, ["tax"])
    n = observed.count()                       # ONE action computes both
    got = obs.get
    assert got["n_rows"] == n
    want_nulls = staged.filter(FF.col("tax").isNull()).count()
    assert got["nulls_tax"] == want_nulls > 0


def test_observe_custom_metrics(lineitem):
    from pyspark.sql import functions as FF

    observed, obs = P.with_metrics(
        lineitem,
        FF.round(FF.sum("l_quantity"), 2).alias("sum_qty"),
        FF.max("l_shipdate").alias("max_ship"),
    )
    observed.write.mode("overwrite").format("noop").save()
    m = obs.get
    assert m["sum_qty"] > 0 and m["max_ship"] is not None


def test_q5_star_join_broadcasts_dims(spark, sf_dir):
    import __spark_entry__ as M

    df = M.queries()["q5_local_supplier_revenue"](spark, sf_dir)
    assert P.has_broadcast_join(df)
    assert not P.has_single_partition_exchange(df)


def test_q3_plans_take_ordered_not_global_sort(spark, sf_dir):
    """TPC-H Q3's top-10 must plan as TakeOrderedAndProject — a global
    orderBy+limit that materializes the full sort is the anti-pattern
    at 100 TB."""
    import __spark_entry__ as M

    df = M.queries()["q3_shipping_priority"](spark, sf_dir)
    plan = P.executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert P.has_broadcast_join(df)


def test_incremental_dedup_plans_window_group_limit(spark, sf_dir):
    """The within-batch keeper must push a partial WindowGroupLimit
    below the exchange (only one row per fingerprint shuffles)."""
    import __spark_entry__ as M

    df = M.queries()["incremental_dedup"](spark, sf_dir)
    plan = P.executed_plan(df)
    assert "WindowGroupLimit" in plan
    assert not P.has_single_partition_exchange(df)


def test_resample_grid_no_single_partition(spark, sf_dir):
    """The dense per-key calendar explodes distributed — no global
    sort / single-partition funnel anywhere in the resample plan."""
    import __spark_entry__ as M

    for name in ("resample_ffill_events", "resample_interp_events"):
        df = M.queries()[name](spark, sf_dir)
        assert not P.has_single_partition_exchange(df), name


def test_q8_market_share_broadcasts_all_dims(spark, sf_dir):
    import __spark_entry__ as M

    df = M.queries()["q8_market_share"](spark, sf_dir)
    plan = P.executed_plan(df)
    assert P.has_broadcast_join(df)
    assert "CartesianProduct" not in plan
    # the only shuffles are the fact joins + year agg — never 1-partition
    assert not P.has_single_partition_exchange(df)


def test_q19_disjunctive_stays_in_join_broadcast(spark, sf_dir):
    import __spark_entry__ as M

    df = M.queries()["q19_disjunctive_revenue"](spark, sf_dir)
    plan = P.executed_plan(df)
    assert P.has_broadcast_join(df)
    assert "CartesianProduct" not in plan


def test_repetition_stats_two_hash_aggs_no_sort(spark, sf_dir):
    import __spark_entry__ as M

    df = M.queries()["repetition_signals"](spark, sf_dir)
    plan = P.executed_plan(df)
    assert plan.count("HashAggregate") >= 4  # partial+final per stage
    assert not P.has_single_partition_exchange(df)
    assert "Sort" not in plan  # pure hash path, no sort-based fallback


def test_vocab_coverage_window_partitioned_by_group(spark, sf_dir):
    import __spark_entry__ as M

    df = M.queries()["vocab_coverage"](spark, sf_dir)
    # the window sort runs per language partition, never globally
    assert not P.has_single_partition_exchange(df)


def test_funnel_aggregates_first_stage_before_join(spark, sf_dir):
    import __spark_entry__ as M

    df = M.queries()["funnel_signup_purchase"](spark, sf_dir)
    plan = P.executed_plan(df)
    assert "CartesianProduct" not in plan
    # min(ts) per user collapses stage 1 BEFORE the join: an aggregate
    # must appear on the build side of the join, not only after it
    assert plan.count("HashAggregate") >= 4


def test_q9_profit_star_broadcasts_dims_pushes_name_filter(spark, sf_dir):
    """Q9's 5-table star: every dim side broadcast, the p_name
    substring filter pushed to the part scan — one pass over the
    fact, no shuffled dim join at this size."""
    import __spark_entry__ as M

    df = M.queries()["q9_product_profit"](spark, sf_dir)
    assert P.has_broadcast_join(df)
    plan = P.executed_plan(df)
    assert "Cartesian" not in plan
    assert any("p_name" in f for f in P.pushed_filters(df)), (
        P.pushed_filters(df)
    )


def test_q2_rank1_plans_window_group_limit(spark, sf_dir):
    """Q2's per-part rank-1 keeper must plan the WindowGroupLimit
    pushdown: each map task forwards only its local best candidate
    per part into the shuffle."""
    import __spark_entry__ as M

    df = M.queries()["q2_min_cost_supplier"](spark, sf_dir)
    assert "WindowGroupLimit" in P.executed_plan(df)


def test_priority_dedup_single_agg_no_window_no_join(spark, sf_dir):
    """The keeper is one min_by hash aggregate — map-side combinable.
    A window or join in this plan means the scale story regressed."""
    import __spark_entry__ as M

    df = M.queries()["dedup_priority_keep"](spark, sf_dir)
    plan = P.executed_plan(df)
    assert "Window" not in plan
    assert "Cartesian" not in plan


def test_source_budget_trim_window_partitioned_by_source(spark, sf_dir):
    import __spark_entry__ as M

    df = M.queries()["source_budget_trim"](spark, sf_dir)
    assert not P.has_single_partition_exchange(df)


def test_weighted_sample_plans_take_ordered(spark, sf_dir):
    import __spark_entry__ as M

    df = M.queries()["weighted_sample_k"](spark, sf_dir)
    assert "TakeOrderedAndProject" in P.executed_plan(df)


def test_partition_histogram_and_skew_ratio(spark):
    """Skew diagnostics: a salted/hash repartition balances, a
    single-hot-key repartition skews — the ratio must expose it."""
    from pyspark.sql import functions as F

    df = spark.range(10_000).withColumn("k", F.lit(1))
    skewed = df.repartition(8, "k")       # every row hashes to one task
    balanced = df.repartition(8, "id")
    assert P.skew_ratio(skewed) >= 7.9
    assert P.skew_ratio(balanced) < 1.5
    hist = P.partition_histogram(balanced)
    assert sum(hist) == 10_000 and len(hist) == 8


def test_salted_join_rebalances_partitions(spark):
    """The reason salted_join exists: with AQE's skew handling off, a
    50%-hot key piles its rows into one reducer (skew_ratio ≈
    n_partitions·0.5); salting must spread it while keeping the
    result row-identical."""
    from parquet_editor_spark.operators import query as q

    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # the test fixture runs 4 shuffle partitions, which caps the
    # measurable ratio at 4 — widen so the hot key stands out
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 2 == 0, 7)
            .otherwise(F.col("id") % 500)
            .alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        dim = spark.range(500).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        plain = fact.join(dim, "k").select("k", "v", "w")
        salted = q.salted_join(fact, dim, "k", n_salts=16).select(
            "k", "v", "w"
        )
        r_plain, r_salted = P.skew_ratio(plain), P.skew_ratio(salted)
        assert r_plain > 8, r_plain
        assert r_salted < r_plain / 3, (r_plain, r_salted)
        assert plain.count() == salted.count() == 200_000
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """At 100 TB a fact-dim shuffle join with a selective dim filter
    should not shuffle the whole fact: Spark's runtime bloom filter
    (spark.sql.optimizer.runtime.bloomFilter.enabled, on by default)
    builds a bloom of the filtered dim keys and injects might_contain
    on the fact side BEFORE its shuffle, pruning ~98% of rows here.
    It only self-activates when the application side exceeds
    applicationSideScanSizeThreshold (default 10 GB — i.e. exactly the
    at-scale case); at test scale we lower that threshold to 0 to pin
    that the session config leaves the rewrite reachable."""
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_th = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").filter(
            F.col("s_acctbal") > 9000
        )
        j = li.join(sup, li.l_suppkey == sup.s_suppkey)
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, "bloom filter not injected"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_th,
        )


def test_boilerplate_strip_broadcasts_common_no_cartesian(spark, sf_dir):
    """strip_common_shingles: the common-shingle set joins back by
    BROADCAST (it is nav-bar sized by construction) and nothing in the
    plan is a cartesian product or a full-row single-partition funnel."""
    import __spark_entry__ as M

    df = M.queries()["boilerplate_strip"](spark, sf_dir)
    plan = P.executed_plan(df)
    assert "Cartesian" not in plan
    assert P.has_broadcast_join(df)
    assert not P.has_single_partition_exchange(df)


def test_codec_queries_are_pure_map_side(spark, sf_dir):
    """png/wav/y4m round-trip queries: codec work is mapInPandas over
    the scan — the only exchange allowed is the final orderBy's range
    exchange (plot-sized output), never a hash shuffle of payloads."""
    import __spark_entry__ as M

    for name in ("png_roundtrip_docs", "wav_roundtrip_docs",
                 "y4m_frames_docs"):
        df = M.queries()[name](spark, sf_dir)
        plan = P.executed_plan(df)
        assert "Cartesian" not in plan, name
        assert "hashpartitioning" not in plan.lower(), name


def test_pack_documents_data_side_window_is_bucketed(documents):
    """pack_documents' distributed prefix sum: the doc-sized window
    must be hash-partitioned by bucket; the only single-partition
    frame is the one-row-per-bucket offsets aggregate, which enters
    the data side through a broadcast join."""
    from parquet_editor_spark.operators import textprep as TP

    df = TP.pack_documents(documents, "doc_id", "text", 32, bucket_docs=64)
    plan = P.executed_plan(df)
    assert P.has_broadcast_join(df), plan
    # the data-side window is keyed (hashpartitioning on the bucket)
    assert "hashpartitioning" in plan, plan
    # exactly the one benign metadata-scale single-partition frame
    assert plan.count("Exchange SinglePartition") <= 1, plan


def test_shard_exporters_shuffle_once_by_shard(documents):
    """Every payload exporter's only exchange is the groupBy(shard)
    hash shuffle — shard size = task size, no global funnel."""
    from parquet_editor_spark.operators import multimodal as MM

    staged = documents.select(
        (F.col("doc_id") % 8).alias("shard"),
        F.col("doc_id").alias("k"),
        F.coalesce("text", F.lit("")).alias("v"),
    )
    frames = [
        MM.shard_webdataset(staged, "shard", "k", {"txt": "v"}),
        MM.shard_tfrecord(staged, "shard", "k", "v"),
        MM.shard_arrow_ipc(staged, "shard", "k"),
        MM.shard_parquet_payload(staged, "shard", "k"),
        MM.shard_jsonl(staged, "shard", "k"),
    ]
    for df in frames:
        plan = P.executed_plan(df)
        assert not P.has_single_partition_exchange(df), plan
        assert "hashpartitioning(shard" in plan, plan


def test_jsonl_pair_has_no_python_stage(documents):
    """The JSONL export/ingest pair is pure Catalyst — no Arrow/Python
    evaluation anywhere in either plan."""
    from parquet_editor_spark.operators import multimodal as MM

    staged = documents.select(
        (F.col("doc_id") % 8).alias("shard"),
        F.col("doc_id").alias("k"),
        F.coalesce("text", F.lit("")).alias("v"),
    )
    out = MM.shard_jsonl(staged, "shard", "k")
    back = MM.jsonl_records(out.select("shard", "payload"), ddl="k long, v string")
    for df in (out, back):
        plan = P.executed_plan(df)
        assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_pipeline_curation_v5_plan_shape(spark, sf_dir):
    """r11: the full-tier DAG's exchanges stay bounded and every
    expensive subtree is read once — the two multi-consumer stage
    boundaries (post-cap extracted text; token ids) are persisted, so
    the WARC/PDF codec walks and the URL/robots tier appear ONCE in
    the plan instead of once per downstream consumer."""
    import re

    import __spark_entry__ as M

    from parquet_editor_spark.plans.explain import formatted_plan

    # measure from a fresh cache state: if an earlier test already
    # MATERIALIZED the shared post-cap boundary (r14: building
    # pipeline_curation_v9 eagerly checkpoints through it), the
    # formatted plan prints the realized InMemoryRelation's whole
    # cached subtree and the gen() count below would double-count —
    # a printing artifact, not a plan regression
    spark.catalog.clearCache()
    df = M.queries()["pipeline_curation_v5"](spark, sf_dir)
    plan = formatted_plan(df)
    # codec ingest appears exactly once (inside the cached subtree)
    assert plan.count("gen(doc_id") <= 2, plan.count("gen(doc_id")
    ex = set(re.findall(r"\((\d+)\) (?:Broadcast)?Exchange", plan))
    assert len(ex) <= 24, sorted(ex)
    # the only single-partition exchange is pack_documents' bucket
    # OFFSETS frame (one row per bucket — the documented benign class
    # test_pack_documents_data_side_window_is_bucketed pins); the
    # data-sized frames all stay hash/range partitioned
    _sp_benign(df, 1)


def test_crawl_frontier_v4_plan_shape(spark, sf_dir):
    """r13 (+r16 seams): priority+shard+expiry frontier —
    extraction/relevance pure codegen, rank/rule/delay/age joins
    broadcast, pagerank's unrolled recurrence runs over the eagerly
    CHECKPOINTED host-pair table (all its exchanges are
    host-cardinality and its leaves are truncated RDD scans, not
    corpus re-plans), and no frame ever collapses to a single
    partition; the host schedule window is the only data-sized
    single-key shuffle."""
    import re

    import __spark_entry__ as M

    from parquet_editor_spark.plans.explain import formatted_plan

    df = M.queries()["crawl_frontier_v4"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    _sp_benign(df, 7)
    # the document-sized frames: target-URL distinct agg, robots
    # allow/group machinery, schedule window, output range sort; the
    # rest is the pagerank recurrence over the seamed 26-row host
    # graph (2^iters unrolled references, each host-cardinality —
    # bounded here so a lineage regression is caught)
    ex = set(re.findall(r"\((\d+)\) (?:Broadcast)?Exchange", plan))
    assert len(ex) <= 110, len(ex)
    # the r16 seam really truncated the lineage: every edges/hosts
    # reference is a checkpointed-RDD leaf, and the old persist-cache
    # scan is gone (a reappearing InMemoryTableScan or a vanishing
    # RDD leaf means someone re-inlined the extraction subplan)
    assert "Scan ExistingRDD" in plan, plan
    assert "InMemoryTableScan" not in plan, plan


def test_outlink_extraction_is_zero_python_zero_shuffle(spark, sf_dir):
    """r12: the outlink path (extract → resolve → canonicalize →
    fetchable filter) is pure codegen — no Python evals and no
    exchange before the ordered output's range partitioning."""
    import __spark_entry__ as M

    from parquet_editor_spark.plans.explain import formatted_plan

    df = M.queries()["outlink_extract_docs"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    # only the final orderBy's range exchange
    import re

    ex = re.findall(r"\(\d+\) (?:Broadcast)?Exchange", plan)
    assert len(ex) <= 1, plan


def test_crawl_frontier_v2_plan_shape(spark, sf_dir):
    """r12: the composed frontier keeps the documented scale shape —
    rule/delay joins broadcast, no Python, and the host window is the
    only data-sized single-key shuffle class (bounded exchanges)."""
    import re

    import __spark_entry__ as M

    from parquet_editor_spark.plans.explain import formatted_plan

    df = M.queries()["crawl_frontier_v2"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    # structural tally: union-distinct + host/sitemap distincts + the
    # robots rule/delay group windows & star joins (host-sized data) +
    # the allowed agg + schedule window + output range sort — every
    # data-sized frame stays hash/range partitioned
    ex = set(re.findall(r"\((\d+)\) (?:Broadcast)?Exchange", plan))
    assert len(ex) <= 14, sorted(ex)
    _sp_benign(df, 0)


def test_pipeline_curation_v8_plan_shape(spark, sf_dir):
    """r13 (+r16 seams): v5 + ExactSubstr between line dedup and the
    gate.  The line-dedup boundary is an eager CHECKPOINT (r16: the
    persist kept rows cached but every one of substring_dedup's three
    references — winnowing, candidate gram hashing, span subtraction
    — still re-analyzed the codec/URL front's lineage), so the front
    half executes once AND is absent from the downstream plan;
    exchanges stay bounded and nothing collapses to a single
    partition except pack's one-row-per-bucket offsets frame."""
    import re

    import __spark_entry__ as M

    from parquet_editor_spark.plans.explain import formatted_plan

    # fresh cache state — same printing artifact the v5 test guards
    # (an earlier v9 build materializes the shared boundary)
    spark.catalog.clearCache()
    df = M.queries()["pipeline_curation_v8"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("gen(doc_id") <= 2, plan.count("gen(doc_id")
    # the r16 seam: boundaries are checkpointed-RDD leaves, not
    # cache scans over live lineage
    assert "Scan ExistingRDD" in plan, "line-dedup boundary not seamed"
    assert "InMemoryTableScan" not in plan, plan
    ex = set(re.findall(r"\((\d+)\) (?:Broadcast)?Exchange", plan))
    assert len(ex) <= 50, sorted(ex)
    _sp_benign(df, 1)


def test_pipeline_curation_v9_plan_shape(spark, sf_dir):
    """r14: v8 + decontamination (a SECOND ExactSubstr phase) +
    quality gate + α-mixture + FIM + pack.  Both multi-pass substring
    phases must consume PERSISTED stage boundaries (the v8 rule), so
    the codec/URL front half still executes once; the mixture's rank
    window must be bucket-keyed (stratified_exact_k, never a lang-only
    partition); exchanges stay bounded and nothing data-sized
    collapses to a single partition (pack + mixture offsets frames
    are the one-row-per-bucket metadata class)."""
    import re

    import __spark_entry__ as M

    from parquet_editor_spark.plans.explain import formatted_plan

    df = M.queries()["pipeline_curation_v9"](spark, sf_dir)
    plan = formatted_plan(df)
    # the ingest front half runs ONCE, at the eager localCheckpoint —
    # it must be entirely absent from the downstream plan (composing
    # two 3-pass substring phases over live lineage squares the tree
    # and OOMs the driver; the checkpoint is the fix, and this pin
    # keeps it)
    assert plan.count("gen(doc_id") == 0, plan.count("gen(doc_id")
    # r16: the gate/mixture boundary is a checkpointed-RDD leaf too
    # (the persisted form re-analyzed the gated front per reference)
    assert "Scan ExistingRDD" in plan, "gate stage boundary not seamed"
    for m in re.finditer(r"row_number\(\)[^\n]*", plan):
        spec = m.group(0)
        if "__h" in spec:  # the mixture fill's md5-ordered window
            assert "__b" in spec, f"lang-only rank window: {spec}"
    ex = set(re.findall(r"\((\d+)\) (?:Broadcast)?Exchange", plan))
    assert len(ex) <= 70, sorted(ex)
    _sp_benign(df, 4)


def test_bloom_union_no_data_shuffle_and_probe_broadcasts(spark):
    """r13: the day-over-day bitmap merge touches only word tables —
    hash agg on word_idx, no Python, no single-partition collapse;
    the probe against the merged table broadcasts the bitmap side."""
    from parquet_editor_spark import plans as P
    from parquet_editor_spark.operators.dedup import (
        bloom_build,
        bloom_member,
        bloom_union,
    )

    a = spark.createDataFrame([(f"a{i}",) for i in range(40)], "key string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(40)], "key string")
    merged = bloom_union(bloom_build(a, "key"), bloom_build(b, "key"))
    plan = P.executed_plan(merged)
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    assert not P.has_single_partition_exchange(merged), plan
    assert "hashpartitioning(word_idx" in plan, plan
    probed = bloom_member(a, merged, "key")
    assert P.has_broadcast_join(probed)


def test_classifier_roc_auc_folds_bounded_metadata(spark, sf_dir):
    """r13: the AUC plan's corpus-sized move is ONE margin-keyed hash
    agg; the ordered cumulative fold and the final total run over the
    grouped (≤ |distinct margins|) table — bounded-metadata frames,
    the same class as the PR grid."""
    import re

    import __spark_entry__ as M

    from parquet_editor_spark.plans.explain import formatted_plan

    df = M.queries()["classifier_roc_auc_docs"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "hashpartitioning(m" in plan, plan
    ex = re.findall(r"\(\d+\) (?:Broadcast)?Exchange", plan)
    assert len(ex) <= 3, plan
    # the one SinglePartition site in the EXECUTED plan is the ordered
    # fold over the already-aggregated margin-group table (the third
    # benign class in PLANS.md): it must sit directly above the
    # margin-keyed HashAggregate, never above raw rows
    from parquet_editor_spark.plans.explain import executed_plan

    lines = executed_plan(df).split("\n")
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            below = "\n".join(lines[i + 1 : i + 3])
            assert "HashAggregate" in below, below


def test_ngram_novelty_and_mixture_plan_shapes(spark, sf_dir):
    """r13: novelty = zero-Python trigram projection + gram-keyed agg
    + join back; mixture = lang-keyed count/rank + broadcast quota —
    no corpus-sized single-partition frame in either."""
    import re

    import __spark_entry__ as M

    from parquet_editor_spark.plans.explain import formatted_plan

    nov = M.queries()["ngram_novelty_docs"](spark, sf_dir)
    plan = formatted_plan(nov)
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    _sp_benign(nov, 0)
    assert "hashpartitioning(gram" in plan, plan

    mix = M.queries()["mixture_alpha_sample"](spark, sf_dir)
    plan = formatted_plan(mix)
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    _sp_benign(mix, 2)
    assert "hashpartitioning(lang" in plan, plan
    # r14 (the r13 verdict's What's-wrong #1): the exact-K fill must
    # be the bucket-keyed stratified_exact_k shape — every
    # row_number window over the corpus partitions on (lang, __b),
    # never on lang alone (the Zipf-head single-task funnel)
    for m in re.finditer(r"row_number\(\)[^\n]*", plan):
        spec = m.group(0)
        assert "__b" in spec, f"lang-only rank window: {spec}"
    ex = set(re.findall(r"\((\d+)\) (?:Broadcast)?Exchange", plan))
    # 3 extra vs r13: the (lang,__b) counts agg + the metadata cum
    # window + the broadcast of the takes table — all bounded by
    # strata × 256 rows, the documented offsets-table class
    assert len(ex) <= 15, sorted(ex)


def test_wet_shard_export_shuffles_once_by_shard(spark, sf_dir):
    """r13: the sharded WET writer's only data exchange is the
    groupBy(shard_id) hash shuffle feeding the per-shard serializer
    (plus the ordered output's range sort) — shard = task, no global
    funnel."""
    import re

    import __spark_entry__ as M

    from parquet_editor_spark.plans.explain import formatted_plan

    df = M.queries()["wet_shard_export_roundtrip"](spark, sf_dir)
    plan = formatted_plan(df)
    _sp_benign(df, 0)
    assert "hashpartitioning(shard_id" in plan, plan
    ex = re.findall(r"\(\d+\) (?:Broadcast)?Exchange", plan)
    assert len(ex) <= 2, plan


def test_crawl_frontier_v5_plan_shape(spark, sf_dir):
    """r13 capstone: v4's audited shape + the merged-Bloom gate —
    still zero Python, zero single-partition; the bitmap probe adds
    one broadcast join over a metadata-sized word table and the
    tracking-strip is one more codegen string expression."""
    import re

    import __spark_entry__ as M

    from parquet_editor_spark.plans.explain import formatted_plan

    df = M.queries()["crawl_frontier_v5"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    _sp_benign(df, 7)
    ex = set(re.findall(r"\((\d+)\) (?:Broadcast)?Exchange", plan))
    assert len(ex) <= 120, len(ex)
    # r16 seams: edges/hosts are checkpointed-RDD leaves (see v4)
    assert "Scan ExistingRDD" in plan, plan
    assert "InMemoryTableScan" not in plan, plan


def test_byte_bpe_fallback_plan_is_single_pass(spark, sf_dir):
    """r14: byte-level tokenization is ONE Arrow mapInPandas pass +
    projections — the only exchange in the whole plan is the ordered
    output's range sort; nothing hash-shuffles and nothing collapses
    to a single partition."""
    import re

    import __spark_entry__ as M

    from parquet_editor_spark.plans.explain import formatted_plan

    df = M.queries()["bpe_byte_fallback_docs"](spark, sf_dir)
    plan = formatted_plan(df)
    _sp_benign(df, 0)
    assert "hashpartitioning" not in plan, plan
    ex = re.findall(r"\(\d+\) (?:Broadcast)?Exchange", plan)
    assert len(ex) <= 1, plan  # the orderBy range exchange only


def test_dpo_pack_plan_shape(spark, sf_dir):
    """r14: preference-pair packing = turn explode + Arrow tokenizer
    (no row-at-a-time Python), the bucketed prefix-sum pack, and one
    pair-keyed hash self-join for orphan flags; single-partition
    frames are only the pack's one-row-per-bucket offsets windows."""
    import re

    import __spark_entry__ as M

    from parquet_editor_spark.plans.explain import formatted_plan

    df = M.queries()["dpo_pack_docs"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan, plan  # no row-at-a-time UDF
    # two pack runs (blocks + placement) → at most their two
    # metadata-scale offsets windows collapse
    _sp_benign(df, 3)
    ex = set(re.findall(r"\((\d+)\) (?:Broadcast)?Exchange", plan))
    assert len(ex) <= 26, sorted(ex)


def test_ccnet_bucket_no_lang_sized_window(spark, sf_dir):
    """r15 (the r14 verdict's What's-wrong #1): the CCNet tercile
    must be the bucket-keyed stratified_ntile shape — no ntile at
    all, and every row_number window over the corpus partitions on
    (lang, score-group key), never on lang alone (the Zipf-head
    single-task funnel).  The cumulative offsets window runs over
    the metadata-sized (lang, score) counts table only."""
    import re

    import __spark_entry__ as M

    from parquet_editor_spark.plans.explain import formatted_plan

    df = M.queries()["ccnet_bucket_docs"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "ntile" not in plan, plan
    _sp_benign(df, 3)
    for m in re.finditer(r"row_number\(\)[^\n]*", plan):
        spec = m.group(0)
        assert "__ok" in spec, f"lang-only rank window: {spec}"


def test_mixture_epochs_pack_plan_shape(spark, sf_dir):
    """r15: the upsampling expansion is a sequence/explode projection
    — the only exchanges are the plan's metadata aggs, the pack's
    bucket shuffle and its one-row-per-bucket offsets window; never
    a corpus-sized single-partition frame."""
    import re

    import __spark_entry__ as M

    from parquet_editor_spark.plans.explain import formatted_plan

    df = M.queries()["mixture_epochs_pack_docs"](spark, sf_dir)
    plan = formatted_plan(df)
    _sp_benign(df, 1)
    ex = set(re.findall(r"\((\d+)\) (?:Broadcast)?Exchange", plan))
    assert len(ex) <= 32, sorted(ex)


def test_pipeline_curation_v10_plan_shape(spark, sf_dir):
    """r15: the v9 stage-boundary rule at the v10 handoff — the
    epochs plan reads the selected corpus twice and the stream reads
    the FIM relation again, so both are eager localCheckpoints: the
    downstream plan must start AT the boundary (no re-expanded
    curated front — over live lineage it re-appears ~3×, ~190
    exchanges) and the expansion itself adds only the plan's
    metadata aggs and the pack, never a data-sized single
    partition."""
    import re

    import __spark_entry__ as M

    from parquet_editor_spark.plans.explain import formatted_plan

    df = M.queries()["pipeline_curation_v10"](spark, sf_dir)
    plan = formatted_plan(df)
    # the curated front is entirely behind the checkpoints
    assert plan.count("gen(doc_id") == 0, plan.count("gen(doc_id")
    assert "Scan ExistingRDD" in plan, "v10 handoff not materialized"
    # the epochs-plan aggs + the expanded-stream/FIM join + the pack
    # (same budget class as mixture_epochs_pack's pin); the live-
    # lineage failure mode this test exists for reads ~190
    ex = set(re.findall(r"\((\d+)\) (?:Broadcast)?Exchange", plan))
    assert len(ex) <= 40, sorted(ex)
    _sp_benign(df, 1)
