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
    silently missed adjudication — pin the round-15 window composition
    (the r14 verdict's task #5, OLDEST-FIRST rotation): the 11 r15
    debuts + 3 changed entries, the 3 post-window r14 debuts with no
    driver row, the 11 remaining r8-stale entries, and 22 entries of
    the r9-stale block — exactly filling the window; the 28 remaining
    r9 entries head the r16 rotation, probes and stable rows-only
    entries stay retired."""
    keys = _literal_keys("queries")
    window = keys[:50]
    assert window[-1] == "subtitle_cues_docs", (
        f"window boundary moved: 50th entry is {window[-1]!r}"
    )
    must_be_in_window = {
        # new in r15 (6 debuts + the pre-split-changed byte-tier pair
        # + the bucket-keyed ccnet rewrite)
        "byte_bpe_train_docs", "train_tokenize_pack_v3",
        "mixture_epochs_pack_docs", "ivfadc_append_topk",
        "byte_bpe_train_batched_docs", "pipeline_curation_v10",
        "dsir_select_docs", "stream_byte_tokenize",
        "byte_fertility_docs", "matryoshka_recall_bound",
        "pipeline_curation_v11",
        "bpe_byte_fallback_docs", "detokenize_roundtrip_docs",
        "ccnet_bucket_docs",
        # the 3 r14 entries that landed after the r14 driver snapshot
        # (never adjudicated — the r14 verdict's #5)
        "mixture_epochs_docs", "ivfadc_index_roundtrip",
        "packing_efficiency_docs",
        # the 11 remaining r8-stale entries
        "stats_aggregates", "stratified_sample_hash",
        "stream_quality_rollup", "stream_quality_rollup_windowed",
        "strip_markup_docs", "supplier_acct_stats", "text_stats",
        "tfidf_vectors", "topk_orders", "window_running_sum",
        "window_top3_per_priority",
        # the 22 list-first r9-stale entries (the 28 remaining head
        # the r16 rotation)
        "mp3_meta_docs", "wav_adpcm_roundtrip", "jpeg_decode_docs",
        "wav_g711_roundtrip", "wav_ms_adpcm_roundtrip",
        "gif_bmp_decode_docs", "multimodal_curation_v1",
        "audio_curation_v1", "flac_roundtrip", "mp4_frame_index_docs",
        "ogg_meta_docs", "image_dedup_dhash", "audio_stats_docs",
        "tiff_decode_docs", "multimodal_curation_v2",
        "avi_mjpeg_decode_docs", "video_scene_cuts_docs",
        "jpeg_exif_docs", "video_curation_v1", "warc_extract_docs",
        "zip_extract_docs", "subtitle_cues_docs",
    }
    assert len(must_be_in_window) == 50, len(must_be_in_window)
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
