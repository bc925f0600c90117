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
    silently missed adjudication — pin the round-3 window composition."""
    keys = _literal_keys("queries")
    window = keys[:50]
    assert window[-1] == "dedup_minhash_lsh", (
        f"window boundary moved: 50th entry is {window[-1]!r}"
    )
    must_be_in_window = {
        # probes
        "probe_int_float_hash", "probe_hugeint_sum", "probe_hugeint_cast",
        "probe_ts_subus", "probe_ts_subsec", "probe_round_ties",
        "probe_double_repr", "probe_ts_repr", "probe_regex_ws_agree",
        "probe_regex_ws_vt", "probe_json_cast_old", "probe_json_regex_new",
        # re-fixed r1/r2 hash-fails
        "json_extract_events", "sessionize_events", "stream_sessionize",
        "map_props_explode", "pack_sequences",
        # never adjudicated in r1/r2
        "stream_followed_by", "normalize_text", "collect_lang_sets",
        "label_centroids", "embedding_quantize", "cross_join_grid",
        "plot_line_series", "stratified_sample", "approx_stats",
        # changed since last adjudication
        "pivot_mean", "describe_lineitem", "stats_aggregates",
        "supplier_acct_stats",
        # first-ever driver verdicts for pytest-only §2 surface
        "csv_roundtrip_lineitem", "json_roundtrip_orders",
        "rename_cast_lineitem", "point_read_cell", "cut_rows_clip",
        "multiselect_summary", "paged_preview", "empty_source",
    }
    missing = must_be_in_window - set(window)
    assert not missing, f"priority queries outside driver window: {missing}"


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
