"""Behavioral pins for the r15 operators beyond the DuckDB
differential: the stratified_ntile ≡ ntile equivalence across the
edge cases the arithmetic must survive (ties, NULL scores, n < k,
uneven tiles), the byte-BPE trainer/pre-split laws, multi-epoch
materialization and IVFADC append."""

import sys
from pathlib import Path

import pytest
from pyspark.sql import Window, functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as M

    return M


def test_stratified_ntile_equals_plain_ntile(spark):
    """The bucket-keyed tercile arithmetic must be BIT-identical to
    ntile() for every stratum size mod k, with tied scores and NULL
    scores mixed in — the full edge surface of the fat-tile
    boundary formula."""
    from parquet_editor_spark.operators.textprep import (
        stratified_ntile,
    )

    rows = []
    rid = 0
    # stratum sizes 1..13 cover every n mod 3 and n < k; scores are
    # a tiny rounded grid so ties are dense; every 5th score is NULL
    for s, n in enumerate([1, 2, 3, 4, 5, 7, 9, 13]):
        for i in range(n):
            score = None if i % 5 == 4 else round((i * 7) % 4 * 0.25, 2)
            rows.append((f"s{s}", score, rid))
            rid += 1
    df = spark.createDataFrame(
        rows, "stratum string, score double, rid long"
    )
    for k in (1, 2, 3, 4):
        got = stratified_ntile(
            df, "stratum", "score", "rid", n_tiles=k, tile_col="t"
        )
        w = Window.partitionBy("stratum").orderBy(
            F.desc("score"), F.asc("rid")
        )
        want = df.withColumn("t", F.ntile(k).over(w))
        g = {r["rid"]: r["t"] for r in got.collect()}
        e = {r["rid"]: r["t"] for r in want.collect()}
        assert g == e, (k, g, e)


def test_byte_bpe_presplit_contract(spark):
    """r15: merges never cross a piece boundary.  Under the GPT-2
    style split, a single space attaches to the following word (so
    (' ','a') fires on 'x a'), but the second space of a run is part
    of a whitespace piece (so it does NOT merge with the next word —
    the exact boundary the unsplit r14 kernel violated)."""
    from parquet_editor_spark.operators import textprep as TP

    merges = [
        ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("o", "r"),
        ("e", "r"), (" ", "the"), (" ", "a"),
    ]
    df = spark.createDataFrame(
        [(1, "x a"), (2, "x  a"), (3, "x\ta")],
        "doc_id long, t string",
    )
    out = {
        r["id"]: list(r["input_ids"])
        for r in TP.byte_bpe_tokenize(df, "doc_id", "t", merges)
        .collect()
    }
    assert out[1] == [ord("x"), 256 + 7]          # ' a' merged
    assert out[2] == [ord("x"), 32, 32, ord("a")]  # run: no merge
    assert out[3] == [ord("x"), 9, ord("a")]       # tab: no merge


def test_byte_bpe_trainer_laws(spark):
    """Trainer output laws: every side is a single byte or an earlier
    output (the tokenize validity condition — train → apply must
    compose), pair counts are non-increasing under batch=1 exact
    greedy, and the learned table round-trips text exactly through
    byte_bpe_tokenize."""
    from parquet_editor_spark.operators import textprep as TP

    texts = [
        "the cat in the hat sat on the mat",
        "café the test in the rain",
        "試験 the thing and another thing",
        "in the end the answer is in the air",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "txt string")
    learned = sorted(
        TP.byte_bpe_train(df, "txt", n_merges=6).collect(),
        key=lambda r: r["merge_rank"],
    )
    assert [r["merge_rank"] for r in learned] == list(
        range(len(learned))
    )
    outs: set[str] = set()
    prev = None
    for r in learned:
        for side in (r["lhs"], r["rhs"]):
            assert len(side) == 1 or side in outs, r
        outs.add(r["lhs"] + r["rhs"])
        if prev is not None:
            assert r["pair_count"] <= prev, learned
        prev = r["pair_count"]
    merges = [(r["lhs"], r["rhs"]) for r in learned]
    toks = TP.byte_bpe_tokenize(
        spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, t string"
        ),
        "doc_id",
        "t",
        merges,
    ).collect()
    assert all(r["exact"] == 1 for r in toks)
    # merges actually fire: some id >= 256 in the tokenized corpus
    assert any(x >= 256 for r in toks for x in r["input_ids"])


def test_byte_bpe_trainer_validates_args(spark):
    from parquet_editor_spark.operators import textprep as TP

    df = spark.createDataFrame([("x",)], "txt string")
    import pytest as _pt

    with _pt.raises(ValueError):
        TP.byte_bpe_train(df, "txt", n_merges=0)
    with _pt.raises(ValueError):
        TP.byte_bpe_train(df, "txt", n_merges=1, batch=0)
    with _pt.raises(ValueError):
        TP.byte_bpe_placeholder(0xF8FF - 0xE400)


def test_mixture_epochs_expand_matches_audit(spark, entry, sf_dir):
    """The materialized stream's per-source token mass must equal the
    audit's realized total exactly (shared plan — audit ≡
    materialization), with both regimes live on the fixture:
    upsampling (epochs >= 1 -> doc copies) and downsampling
    (epochs = 0 -> remainder subset only)."""
    from parquet_editor_spark.operators import textprep as TP

    shares = {"src0": 40, "src1": 30, "src2": 20, "src3": 10}
    docs = (
        entry._t(spark, sf_dir, "documents")
        .select(
            F.concat(
                F.lit("src"), (F.col("doc_id") % 4).cast("string")
            ).alias("source"),
            "doc_id",
            "text",
        )
    )
    audit = {
        r["source"]: r
        for r in TP.mixture_epochs(
            docs, "source", "doc_id", "text", shares, 60_000
        ).collect()
    }
    got = {
        r["source"]: r
        for r in TP.mixture_epochs_expand(
            docs, "source", "doc_id", "text", shares, 60_000
        )
        .groupBy("source")
        .agg(
            F.sum("n_toks").alias("toks"),
            F.count("*").alias("rows"),
            F.max("epoch").alias("max_epoch"),
        )
        .collect()
    }
    assert set(got) <= set(audit)
    ups = downs = 0
    for s, a in audit.items():
        want = a["total_toks"]
        if s not in got:
            assert want == 0, (s, a)
            continue
        assert got[s]["toks"] == want, (s, got[s], a)
        assert (
            got[s]["rows"]
            == a["epochs"] * a["n_docs"] + a["rem_docs"]
        )
        if a["epochs"] >= 1:
            ups += 1
        else:
            downs += 1
    assert ups >= 1 and downs >= 1, audit


def test_pipeline_curation_v10_upsamples_and_packs(spark, entry, sf_dir):
    """v10 pin: the curated corpus really upsamples (the head shard
    runs a full epoch + remainder while at least one shard is
    remainder-only), every non-tail block is exactly 32 ids, and
    epoch-major order means block md5s pin epoch boundaries."""
    rows = sorted(
        entry.q_pipeline_curation_v10(spark, sf_dir).collect(),
        key=lambda r: r["block_id"],
    )
    assert rows
    assert all(r["n_ids"] == 32 for r in rows[:-1])
    assert rows[-1]["n_ids"] <= 32
    # the 8000-token budget fires BOTH regimes on every tested SF
    # (src0: 1 full epoch + remainder; src1-3: remainder-only), so
    # the upsampled stream carries src0 MORE than once and the
    # others strictly less — total id mass lands between 40% and
    # 100% of v9's one-pass doc-major pack of the same FIM stream
    v9_rows = entry.q_pipeline_curation_v9(spark, sf_dir).collect()
    v10_ids = sum(r["n_ids"] for r in rows)
    v9_ids = sum(r["n_ids"] for r in v9_rows)
    assert 0.4 * v9_ids < v10_ids < v9_ids, (v10_ids, v9_ids)
    assert any(r["doc_starts"] for r in rows)


def test_dsir_logratio_ranks_target_like_docs_higher(spark):
    """DSIR law on a planted fixture: docs sharing the target
    sample's vocabulary must outscore docs that don't — the
    importance weight is a real distribution-similarity signal, not
    just a hash artifact."""
    from parquet_editor_spark.functions.text import dsir_logratio

    rows = []
    for i in range(24):
        if i % 2 == 0:
            rows.append((i, "alpha beta gamma alpha beta"))
        else:
            rows.append((i, "zig zag zork quux flux"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # target sample: a subset of the alpha-beta population
    target = df.filter("doc_id % 2 = 0 AND doc_id < 12")
    out = {
        r["id"]: r["logratio"]
        for r in dsir_logratio(df, target, "doc_id", "text").collect()
    }
    alpha = [out[i] for i in range(24) if i % 2 == 0]
    other = [out[i] for i in range(24) if i % 2 == 1]
    assert min(alpha) > max(other), (alpha, other)
    # negative-zero fold: no -0.0 survives the rounding boundary
    assert all(
        not (v == 0.0 and str(v).startswith("-")) for v in out.values()
    )


def test_pipeline_curation_v11_learned_tokenizer_packs(
    spark, entry, sf_dir
):
    """v11 pin: the self-trained byte tokenizer really learned (some
    packed id >= 256 would require a merge to have fired — checked
    via block id mass vs a merge-free byte count), every non-tail
    block is exactly 64 ids, and doc_starts carries the resets."""
    rows = sorted(
        entry.q_pipeline_curation_v11(spark, sf_dir).collect(),
        key=lambda r: r["block_id"],
    )
    assert rows
    assert all(r["n_ids"] == 64 for r in rows[:-1])
    assert rows[-1]["n_ids"] <= 64
    assert any(r["doc_starts"] for r in rows)
    # learned merges fire: total packed ids < total UTF-8 bytes of
    # the selected corpus (each fired merge removes >= 1 id)
    sel, _ = entry._v9_fim_stream(spark, sf_dir)
    total_bytes = sel.select(
        F.sum(
            F.octet_length(F.col("kept_text"))
        ).alias("b")
    ).collect()[0]["b"]
    total_ids = sum(r["n_ids"] for r in rows)
    assert 0 < total_ids < total_bytes, (total_ids, total_bytes)
