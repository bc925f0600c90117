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
    silently missed adjudication — pin the round-6 window composition
    (the r5 verdict's rotation): the 5 never-driver-adjudicated r5
    additions first, then the 6 stalest stream_* entries, then the r1
    greens (oldest signal of all) and 18 r2 greens to fill; probes and
    stable rows-only entries stay retired behind the window."""
    keys = _literal_keys("queries")
    window = keys[:50]
    assert window[-1] == "rolling_revenue_7d", (
        f"window boundary moved: 50th entry is {window[-1]!r}"
    )
    must_be_in_window = {
        # the 5 r5 additions, never driver-adjudicated
        "png_roundtrip_docs", "wav_roundtrip_docs", "y4m_frames_docs",
        "boilerplate_strip", "tfidf_vectors",
        # streaming family with the stalest streaming signal (r1/r3)
        "stream_windowed_counts", "stream_sliding_counts",
        "stream_dedup_events", "stream_session_windows",
        "stream_sessionize", "stream_followed_by",
        # r1 oracle greens, oldest signal of all
        "pivot_count", "pivot_max", "pivot_min", "scan_region",
        "numeric_projection", "histogram_quantity", "bin2d_scatter",
        "add_drop_column", "lang_id_histogram", "quality_scores",
        "top_words", "dedup_ngram_jaccard", "dedup_simhash",
        "dedup_clusters", "doc_rolling_hash", "embedding_topk_cosine",
        "embedding_cosine_dedup", "embedding_lsh_dedup", "binary_meta",
        "multimodal_decode", "frame_sample",
        # 18 r2 greens filling the window
        "q3_shipping_priority", "q5_local_supplier_revenue",
        "q6_forecast_revenue", "q7_nation_trade_volume",
        "correlated_min_suppliers", "exists_high_qty", "above_avg_orders",
        "having_frequent_custs", "salted_join_revenue",
        "left_join_order_counts", "full_outer_nation_actors",
        "except_inactive_custs", "intersect_nations", "cube_qty",
        "grouping_sets_revenue", "window_ranks", "window_lead_lag",
        "rolling_revenue_7d",
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
