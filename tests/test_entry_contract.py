"""Static contract checks on __spark_entry__.py — the driver consumes
``queries()``/``oracle_sql()`` as dict literals, and a duplicated key
silently shadows an earlier entry (a real round-1 defect: two
``q3_shipping_priority`` literals hid one query slot AND two different
oracle texts)."""

import ast
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
    silently missed adjudication — pin the round-5 window composition
    (the r4 verdict's rotation): every never-driver-adjudicated r4b
    query first, then the oldest r2/r1 greens; probes and stable
    rows-only entries stay retired behind the window."""
    keys = _literal_keys("queries")
    window = keys[:50]
    assert window[-1] == "string_funcs_part", (
        f"window boundary moved: 50th entry is {window[-1]!r}"
    )
    must_be_in_window = {
        # the 27 r4b additions, never driver-adjudicated before r5
        "pipeline_curation_v2", "source_token_divergence",
        "table_diff_orders", "snapshot_time_travel",
        "compact_lineitem_files", "bpe_pair_top", "zscore_outliers_price",
        "char_entropy_docs", "group_sample_events", "hybrid_rrf_topk",
        "corpus_health", "bigram_logprob", "purge_orders",
        "refresh_matview", "source_overlap", "pipeline_curation_v3",
        "stream_refresh_matview", "token_dropout", "shard_stats",
        "pagerank_event_graph", "fuzzy_word_pairs", "null_profile_orders",
        "cms_topk_bound", "zstd_roundtrip_lineitem", "ivf_index_roundtrip",
        "rolling_spikes_events", "session_table_events",
        # r2 greens with the oldest driver signal
        "unpivot_measures", "percentiles_quantity", "string_agg_nations",
        "clean_fillna", "clean_dropna", "clean_replace",
        "resample_ffill_events", "resample_interp_events",
        "time_rollup_events", "pipeline_training_data", "incremental_dedup",
        "decontaminate", "boilerplate_shingles", "gopher_quality",
        "redact_pii", "hash_split", "unigram_logprob", "chunk_documents",
        "udtf_chunk_documents", "ivf_topk_exhaustive",
        "kafka_roundtrip_events",
        # r1 greens, oldest signal of all
        "date_trunc_orders", "string_funcs_part",
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
