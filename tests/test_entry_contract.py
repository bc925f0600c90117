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
    silently missed adjudication — pin the round-13 window composition
    (the r12 verdict's #3, OLDEST-FIRST rotation): the twelve
    never-adjudicated r13 debuts at the very front, then ALL 38
    entries whose last driver signal is r7 (the oldest real signal in
    the corpus) — exactly filling the window; everything newer-signal
    moves behind, probes and stable rows-only entries stay
    retired."""
    keys = _literal_keys("queries")
    window = keys[:50]
    assert window[-1] == "sessionize_events", (
        f"window boundary moved: 50th entry is {window[-1]!r}"
    )
    must_be_in_window = {
        # new in r14 (5 debuts + the byte-tier-extended detokenize
        # roundtrip, whose schema changed)
        "ivfadc_topk", "ivfadc_recall_bound", "bpe_byte_fallback_docs",
        "dpo_pack_docs", "pipeline_curation_v9",
        "detokenize_roundtrip_docs",
        # the 5 r13 debuts that landed after the r13 driver snapshot
        # (never adjudicated — the r13 verdict's #4)
        "crawl_frontier_v5", "pq_encode_embeddings", "pq_topk_adc",
        "pq_recall_bound", "fim_transform_docs",
        # the 39 alphabetically-first r8-stale entries (oldest driver
        # signal in the corpus; the 11 remaining head the r15
        # rotation)
        "anti_parts_never_sold", "asof_join_events", "bm25_topk",
        "collect_lang_sets", "cross_join_grid",
        "csv_roundtrip_lineitem", "cut_rows_clip",
        "dedup_exact_groups", "dedup_minhash_lsh", "describe_lineitem",
        "embedding_quantize", "empty_source", "filter_project",
        "flac_meta_docs", "groupby_agg", "join_star_revenue",
        "jpeg_meta_docs", "json_extract_events",
        "json_roundtrip_orders", "label_centroids",
        "map_props_explode", "mixture_sample", "mp4_meta_docs",
        "multiselect_summary", "normalize_text", "pack_sequences",
        "paged_preview", "pipeline_curation_v4", "pivot_mean",
        "pivot_sum", "plot_line_series", "point_read_cell",
        "range_join_prices", "rename_cast_lineitem",
        "repetition_signals", "script_profile_docs",
        "semantic_decontaminate", "semi_suppliers_with_sales",
        "sessionize_events",
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
