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
    silently missed adjudication — pin the round-8 window composition
    (the r7 verdict's rotation, items 1-2): tfidf_vectors first (its
    r6/r7 driver rows ERR'd on the raw array column; the entry is now
    scalar-serialized), then the 5 never-driver-adjudicated r6
    additions, then the three last-r2-signal entries, then the
    r3-signal block oldest-first; probes and stable rows-only entries
    stay retired behind the window."""
    keys = _literal_keys("queries")
    window = keys[:50]
    assert window[-1] == "repetition_signals", (
        f"window boundary moved: 50th entry is {window[-1]!r}"
    )
    must_be_in_window = {
        # the harness-shape casualty, re-adjudicated with scalar output
        "tfidf_vectors",
        # the 5 r6 additions, never driver-adjudicated
        "strip_markup_docs", "script_profile_docs",
        "semantic_decontaminate", "pipeline_curation_v4",
        "stream_quality_rollup",
        # new in r8: JPEG/FLAC/MP4 header codecs + windowed rollup
        "jpeg_meta_docs", "flac_meta_docs", "mp4_meta_docs",
        "stream_quality_rollup_windowed",
        # last entries whose only driver signal is r2
        "asof_join_events", "range_join_prices", "stratified_sample_hash",
        # r3-signal block, oldest first
        "json_extract_events", "sessionize_events", "map_props_explode",
        "pack_sequences", "normalize_text", "collect_lang_sets",
        "label_centroids", "embedding_quantize", "cross_join_grid",
        "plot_line_series", "pivot_mean", "describe_lineitem",
        "stats_aggregates", "supplier_acct_stats",
        "csv_roundtrip_lineitem", "json_roundtrip_orders",
        "rename_cast_lineitem", "point_read_cell", "cut_rows_clip",
        "multiselect_summary", "paged_preview", "empty_source",
        "groupby_agg", "filter_project", "topk_orders",
        "join_star_revenue", "anti_parts_never_sold",
        "semi_suppliers_with_sales", "window_running_sum",
        "window_top3_per_priority", "pivot_sum", "text_stats",
        "dedup_exact_groups", "dedup_minhash_lsh", "bm25_topk",
        "mixture_sample", "repetition_signals",
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
