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
    silently missed adjudication — pin the round-4 window composition:
    every never-driver-adjudicated query first, probes and stable
    rows-only entries retired behind the window."""
    keys = _literal_keys("queries")
    window = keys[:50]
    assert window[-1] == "pivot_count_distinct", (
        f"window boundary moved: 50th entry is {window[-1]!r}"
    )
    must_be_in_window = {
        # new-in-r3, never driver-adjudicated
        "bm25_topk", "mixture_sample", "repetition_signals",
        "vocab_coverage", "funnel_signup_purchase", "retention_cohorts",
        "merge_upsert_orders", "scd2_user_status", "zorder_cluster_keys",
        "multimodal_resize", "parquet_roundtrip_partitioned",
        "orc_roundtrip_lineitem", "corr_matrix", "q8_market_share",
        "q10_returned_revenue", "q12_priority_lines", "q14_promo_revenue",
        "q19_disjunctive_revenue", "q21_sole_supplier", "q22_idle_customers",
        # new in r4
        "xlsx_roundtrip_lineitem", "ivf_recall_bound",
        "q1_pricing_summary", "q2_min_cost_supplier", "q4_order_priority",
        "q9_product_profit", "q11_important_stock",
        "q13_customer_distribution", "q15_top_supplier",
        "q16_supplier_part_counts", "q17_small_qty_revenue",
        "q18_large_volume_customers", "q20_part_promotion",
        "dedup_priority_keep", "hard_negatives", "source_budget_trim",
        "stream_static_enrich", "weighted_sample_k", "avro_roundtrip_part",
        "variant_extract_events", "hll_error_bound", "quantile_error_bound",
        "hilbert_cluster_keys", "incremental_minhash",
        # r1 greens swapped out of the r3 window (date_trunc_orders and
        # string_funcs_part yielded their slots to the new-coverage
        # block; they rotate in r5)
        "cell_edit", "delete_rows", "paste_splice",
        "union_distinct_nations", "rollup_qty", "pivot_count_distinct",
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
