"""Static contract checks on __spark_entry__.py — the driver consumes
``queries()``/``oracle_sql()`` as dict literals, and a duplicated key
silently shadows an earlier entry (a real round-1 defect: two
``q3_shipping_priority`` literals hid one query slot AND two different
oracle texts)."""

import ast
import os
from pathlib import Path

ENTRY = Path(__file__).resolve().parent.parent / "__spark_entry__.py"


def _literal_keys(fn_name: str) -> list[str]:
    tree = ast.parse(ENTRY.read_text())
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == fn_name:
            keys: list[str] = []
            for sub in ast.walk(node):
                if isinstance(sub, ast.Dict):
                    keys.extend(
                        k.value for k in sub.keys
                        if isinstance(k, ast.Constant) and isinstance(k.value, str)
                    )
            return keys
    raise AssertionError(f"no function {fn_name} in {ENTRY}")


def test_queries_keys_unique():
    keys = _literal_keys("queries")
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert not dupes, f"duplicate queries() keys: {dupes}"


def test_oracle_keys_unique():
    keys = _literal_keys("oracle_sql")
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert not dupes, f"duplicate oracle_sql() keys: {dupes}"


def test_top_level_functions_unique():
    tree = ast.parse(ENTRY.read_text())
    names = [n.name for n in tree.body if isinstance(n, ast.FunctionDef)]
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert not dupes, f"shadowed function definitions: {dupes}"


def test_driver_window_is_exactly_50_and_holds_priority_queries():
    """The driver adjudicates only the FIRST 50 queries() entries per
    round.  Round 2 overflowed the priority block to 59, so 9 queries
    silently missed adjudication — pin the round-12 window composition
    (the r11 verdict's #3, OLDEST-FIRST rotation): the twenty-one
    never-adjudicated r12 debuts at the very front, then the 18
    entries whose last driver signal is r5 and the 11 oldest r7
    entries; everything newer-signal moves behind, probes and stable
    rows-only entries stay retired."""
    keys = _literal_keys("queries")
    window = keys[:50]
    assert window[-1] == "doc_rolling_hash", (
        f"window boundary moved: 50th entry is {window[-1]!r}"
    )
    must_be_in_window = {
        # new in r12
        "outlink_extract_docs", "crawl_frontier_v2",
        "substring_dedup_docs", "pdf_aes_docs", "pdf_aesv3_docs",
        "pipeline_curation_v6", "pipeline_curation_v7",
        "sft_pack_docs_v2", "robots_sitemap_docs", "anchor_text_docs",
        "outlink_graph_rank", "bloom_frontier_docs",
        "detokenize_roundtrip_docs", "crawl_frontier_v3",
        "classifier_pr_curve_docs", "stream_bloom_filter",
        "main_content_docs", "split_leakage_docs",
        "wet_export_roundtrip", "audio_segments_docs",
        "bpe_merge_sweep_docs",
        # the 18 r5-stale entries (the r11 verdict's Missing #4 list)
        "boilerplate_shingles", "chunk_documents", "clean_replace",
        "date_trunc_orders", "decontaminate", "gopher_quality",
        "hash_split", "incremental_dedup", "ivf_topk_exhaustive",
        "kafka_roundtrip_events", "pipeline_training_data",
        "redact_pii", "resample_ffill_events", "resample_interp_events",
        "string_funcs_part", "time_rollup_events",
        "udtf_chunk_documents", "unigram_logprob",
        # the oldest-r7 block
        "above_avg_orders", "add_drop_column", "bin2d_scatter",
        "binary_meta", "boilerplate_strip", "correlated_min_suppliers",
        "cube_qty", "dedup_clusters", "dedup_ngram_jaccard",
        "dedup_simhash", "doc_rolling_hash",
    }
    missing = must_be_in_window - set(window)
    assert not missing, f"priority queries outside driver window: {missing}"
    # settled probes / stable err:no_oracle entries must NOT burn slots
    retired = {
        "probe_int_float_hash", "probe_hugeint_sum", "probe_regex_ws_vt",
        "probe_json_cast_old", "stratified_sample", "approx_stats",
    }
    leaked = retired & set(window)
    assert not leaked, f"retired entries back inside the window: {leaked}"


def test_window_outputs_are_scalar_shaped(spark):
    """Every first-50 (driver-adjudicated) query must emit only
    scalar top-level columns.  The driver canonicalizer sorts the
    result as a pandas frame before hashing, and a top-level
    Array/Map/Struct column crashes it (``TypeError: unhashable
    type: 'list'`` — burned the `tfidf_vectors` row in BOTH r6 and
    r7).  Nested data crossing the adjudication boundary must be
    serialized (CSV-joined string, exploded rows, …)."""
    import sys

    from pyspark.sql.types import ArrayType, MapType, StructType

    sys.path.insert(0, str(ENTRY.parent))
    import __spark_entry__ as M

    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    offenders = []
    for i, (name, fn) in enumerate(M.queries().items()):
        if i >= 50:
            break
        schema = fn(spark, sf_dir).schema
        bad = [
            f.name for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append(f"{name}: {bad}")
    assert not offenders, (
        "driver-window queries with non-scalar top-level columns "
        f"(the driver canon cannot hash these): {offenders}"
    )


def test_every_query_has_oracle_or_is_known_rows_only():
    import sys

    sys.path.insert(0, str(ENTRY.parent))
    import __spark_entry__ as M

    qs, osql = set(M.queries()), set(M.oracle_sql())
    assert not osql - qs, f"oracle entries without a query: {osql - qs}"
    # rows-only queries are an explicit, documented exception list
    assert qs - osql == {
        "stratified_sample",
        "approx_stats",
        "embedding_ivf_topk",
    }, f"unexpected rows-only queries: {qs - osql}"
