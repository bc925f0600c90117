"""Chunking / packing operators (training-sequence prep)."""

import pytest
from pyspark.sql import functions as F

from parquet_editor_spark.operators import textprep as TP


def test_chunk_documents_covers_every_token(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(70))),   # 3 chunks at stride 24
         (2, "a b c"),                                 # short → 1 chunk
         (3, "")],                                     # empty → dropped
        "doc_id long, text string",
    )
    out = TP.chunk_documents(df, "doc_id", "text", 32, 24)
    rows = sorted(
        (r["id"], r["chunk_id"], r["n_chunk_tokens"], r["chunk"])
        for r in out.collect()
    )
    assert [r[:3] for r in rows] == [(1, 0, 32), (1, 1, 32), (1, 2, 22), (2, 0, 3)]
    # chunk 1 starts at token 24 and overlaps chunk 0 by 8 tokens
    assert rows[1][3].split()[0] == "w24"
    assert rows[0][3].split()[24:] == rows[1][3].split()[:8]
    assert rows[3][3] == "a b c"
    with pytest.raises(ValueError):
        TP.chunk_documents(df, "doc_id", "text", 8, 9)


def test_pack_sequences_offsets_and_bins(spark):
    df = spark.createDataFrame(
        [(i, "s", " ".join(["w"] * 100)) for i in range(1, 8)],
        "doc_id long, source string, text string",
    )
    out = {r["id"]: (r["start_offset"], r["pack_id"])
           for r in TP.pack_sequences(df, "doc_id", "text", 256,
                                      partition_col="source").collect()}
    # 100-token docs, 256 budget: offsets 0,100,...,600 → packs 0,0,0,1,1,1,2
    assert out == {1: (0, 0), 2: (100, 0), 3: (200, 0), 4: (300, 1),
                   5: (400, 1), 6: (500, 1), 7: (600, 2)}


def test_pack_sequences_partitions_independent(documents):
    out = TP.pack_sequences(documents, "doc_id", "text", 512,
                            partition_col="source")
    firsts = out.groupBy("source").agg(
        F.min("start_offset").alias("lo")).collect()
    assert all(r["lo"] == 0 for r in firsts)   # each source stream restarts


def test_label_centroids_matches_numpy(embeddings):
    import numpy as np
    from parquet_editor_spark.operators import sim as S

    rows = embeddings.select("vec_id", "label", "embedding").collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float32)
    lab_arr = np.array([r["label"] for r in rows])
    got = {(r["label"], r["dim"]): r["c"]
           for r in S.label_centroids(embeddings).collect()}
    for lab in set(lab_arr):
        want = mat[lab_arr == lab].astype(np.float64).mean(axis=0)
        for d in (1, 32, 64):
            assert got[(lab, d)] == pytest.approx(round(want[d - 1], 6), abs=2e-6)


def test_pipeline_training_data_structure(spark, sf_dir):
    """Composite pipeline: chunk-level output, unique (doc, chunk)
    keys, valid splits, and strictly fewer surviving docs than the
    raw corpus (quality + decontamination really drop rows)."""
    import __spark_entry__ as M

    out = M.queries()["pipeline_training_data"](spark, sf_dir).collect()
    assert len(out) > 0
    keys = [(r["doc_id"], r["chunk_id"]) for r in out]
    assert len(keys) == len(set(keys))
    assert {r["split"] for r in out} <= {"train", "val", "test"}
    corpus = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("source != 'src0'")
        .count()
    )
    assert len({d for d, _ in keys}) < corpus


class TestMixtureSampleTokens:
    """Corpus mixing to target token shares (mixture_sample_tokens)."""

    @pytest.fixture(scope="class")
    def mixed(self, documents):
        from parquet_editor_spark.operators.textprep import mixture_sample_tokens

        docs = documents.filter(F.col("source").isin("src0", "src1", "src2"))
        return (
            docs,
            mixture_sample_tokens(
                docs, "source", "doc_id", "text",
                {"src0": 0.6, "src1": 0.3, "src2": 0.1},
            ),
        )

    def test_limiting_source_kept_whole(self, mixed):
        """The source with the smallest toks/share ratio keeps rate 1.0 —
        every one of its documents survives."""
        docs, out = mixed
        from parquet_editor_spark.functions.text import tokens

        per = {
            r["source"]: r["toks"]
            for r in docs.groupBy("source")
            .agg(F.sum(F.size(tokens("text"))).alias("toks"))
            .collect()
        }
        shares = {"src0": 0.6, "src1": 0.3, "src2": 0.1}
        limiting = min(per, key=lambda s: per[s] / shares[s])
        n_in = docs.filter(F.col("source") == limiting).count()
        n_out = out.filter(F.col("source") == limiting).count()
        assert n_out == n_in

    def test_realized_token_shares_near_targets(self, mixed):
        """Kept token mass per source lands near the 60/30/10 targets
        (document-level sampling → statistical, so wide bands)."""
        _, out = mixed
        kept = {
            r["source"]: r["t"]
            for r in out.groupBy("source").agg(F.sum("n_toks").alias("t")).collect()
        }
        total = sum(kept.values())
        shares = {s: kept.get(s, 0) / total for s in ("src0", "src1", "src2")}
        assert abs(shares["src0"] - 0.6) < 0.15
        assert abs(shares["src1"] - 0.3) < 0.12
        assert abs(shares["src2"] - 0.1) < 0.08

    def test_deterministic_across_runs_and_partitioning(self, mixed):
        from parquet_editor_spark.operators.textprep import mixture_sample_tokens

        docs, out = mixed
        again = mixture_sample_tokens(
            docs.repartition(7), "source", "doc_id", "text",
            {"src0": 0.6, "src1": 0.3, "src2": 0.1},
        )
        assert sorted(r["id"] for r in out.collect()) == sorted(
            r["id"] for r in again.collect()
        )

    def test_unlisted_sources_dropped(self, documents):
        from parquet_editor_spark.operators.textprep import mixture_sample_tokens

        out = mixture_sample_tokens(
            documents, "source", "doc_id", "text", {"src0": 1.0}
        )
        assert {r["source"] for r in out.select("source").distinct().collect()} == {"src0"}

    def test_empty_shares_rejected(self, documents):
        from parquet_editor_spark.operators.textprep import mixture_sample_tokens

        with pytest.raises(ValueError):
            mixture_sample_tokens(documents, "source", "doc_id", "text", {})


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"),    # bigrams: ab ba ab ba → 4 total, 2 distinct
         (2, "x y z"),        # xy yz → no repeats
         (3, "solo")],        # < 2 tokens → no grams, dropped
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in TP.repetition_stats(df, "doc_id", "text", 2).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["n_grams"], out[1]["top_gram_n"]) == (4, 2)
    assert out[1]["dup_fraction"] == 0.5
    assert (out[2]["n_grams"], out[2]["top_gram_n"]) == (2, 1)
    assert out[2]["dup_fraction"] == 0.0


def test_vocab_coverage_boundary_word_counted(spark):
    # counts: a×8, b×1, c×1 → total 10; 90% needs a AND one more word
    # (after 'a' coverage is 80 < 90, after 'b' it's exactly 90)
    df = spark.createDataFrame(
        [(1, "en", "a a a a a a a a b c")], "doc_id long, lang string, text string"
    )
    row = TP.vocab_coverage(df, "text", "lang", 90).collect()[0]
    assert (row["total_tokens"], row["distinct_words"], row["vocab_90"]) == (10, 3, 2)
    # exact-boundary rule: a word is needed iff coverage is short BEFORE it,
    # so 'c' (cum-before exactly 9/10 = 90%) is NOT needed


def test_source_budget_trim_prefix_semantics(spark):
    """Within each source, the longest-first prefix whose cumulative
    weight fits the budget survives; the crossing row is dropped even
    if a later smaller row would still fit (prefix, not knapsack)."""
    from pyspark.sql import functions as F

    from parquet_editor_spark.operators.textprep import source_budget_trim

    df = spark.createDataFrame(
        [
            (1, "a", 60), (2, "a", 50), (3, "a", 40),  # 60,110 |150>120 ✗
            (4, "b", 200),                             # crosses alone → ✗
            (5, "c", 10),
        ],
        "doc_id long, source string, n_chars long",
    )
    out = source_budget_trim(
        df, "source", "n_chars", 120,
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
    )
    got = {r["doc_id"]: r["cum_weight"] for r in out.collect()}
    assert got == {1: 60, 2: 110, 5: 10}


def test_source_token_divergence_hand_computed(spark):
    """Two-source toy corpus with a known KL: source A = {x x y},
    source B = {y}; corpus = {x:2, y:2}. KL(A‖C) = 2/3·ln((2/3)/(1/2))
    + 1/3·ln((1/3)/(1/2)); KL(B‖C) = 1·ln(1/(1/2)) = ln 2."""
    import math

    from parquet_editor_spark.operators.textprep import (
        source_token_divergence,
    )

    df = spark.createDataFrame(
        [("A", "x x y"), ("B", "y")], "source string, text string"
    )
    got = {
        r["source"]: (r["n_words"], r["kl"])
        for r in source_token_divergence(df, "source", "text").collect()
    }
    kl_a = (2 / 3) * math.log((2 / 3) / (1 / 2)) + (1 / 3) * math.log(
        (1 / 3) / (1 / 2)
    )
    assert got["A"] == (2, round(kl_a, 4))
    assert got["B"] == (1, round(math.log(2), 4))


def test_bpe_pair_counts_matches_python_reference(spark):
    texts = [
        "low lower lowest low",
        "new newer newest new new",
        "wide wider low",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["pair"]: (r["pair_count"], r["n_words"])
        for r in TP.bpe_pair_counts(df, "text", top_n=1000).collect()
    }
    # pure-python reference: word-frequency-weighted adjacent char pairs
    from collections import Counter

    wc = Counter(w for t in texts for w in t.split())
    pair_count: Counter = Counter()
    n_words: dict = {}
    for w, c in wc.items():
        if len(w) < 2:
            continue
        seen = set()
        for i in range(len(w) - 1):
            p = w[i : i + 2]
            pair_count[p] += c
            seen.add(p)
        for p in seen:
            n_words[p] = n_words.get(p, 0) + 1
    want = {p: (c, n_words[p]) for p, c in pair_count.items()}
    assert got == want


def test_bpe_pair_counts_orders_and_limits(spark):
    df = spark.createDataFrame(
        [("aa ab aa",)], "text string"
    )
    rows = TP.bpe_pair_counts(df, "text", top_n=1).collect()
    assert len(rows) == 1
    assert rows[0]["pair"] == "aa" and rows[0]["pair_count"] == 2


def test_char_entropy_known_values(spark):
    import math

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd")], "doc_id long, text string"
    )
    got = {
        r["id"]: (r["n_chars"], r["entropy_bits"])
        for r in TP.char_entropy(df, "doc_id", "text").collect()
    }
    assert got[1] == (4, 0.0)          # single symbol: zero entropy
    assert got[2] == (2, 1.0)          # two equiprobable symbols: 1 bit
    assert got[3] == (4, 2.0)          # four equiprobable symbols: 2 bits
    # spaces count as characters (pre-tokenization signal)
    df2 = spark.createDataFrame([(9, "a a")], "doc_id long, text string")
    r = TP.char_entropy(df2, "doc_id", "text").collect()[0]
    assert r["n_chars"] == 3
    want = round(-(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3), 4)
    assert r["entropy_bits"] == want


def test_corpus_health_report_exact_counts(spark):
    rows = [
        (0, "s1", "en", "the cat sat"),
        (1, "s1", "en", "the cat sat"),          # exact dup of 0
        (2, "s1", "de", "ein anderer text hier"),
        (3, "s2", "en", "completely different words"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    got = {
        r["source"]: r
        for r in TP.corpus_health_report(
            df, "source", "doc_id", "text", "lang"
        ).collect()
    }
    s1 = got["s1"]
    assert (s1["n_docs"], s1["n_dup_docs"], s1["n_langs"]) == (3, 1, 2)
    assert s1["total_tokens"] == 3 + 3 + 4
    assert s1["avg_tokens"] == round(10 / 3, 4)
    s2 = got["s2"]
    assert (s2["n_docs"], s2["n_dup_docs"], s2["n_langs"]) == (1, 0, 1)


def test_token_dropout_deterministic_and_rate(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(50))) for i in range(40)],
        "doc_id long, text string",
    )
    out1 = TP.token_dropout(df, "doc_id", "text", rate_permille=200)
    rows1 = sorted(
        (r["id"], r["n_kept"], r["text_aug"]) for r in out1.collect()
    )
    # deterministic across repartition
    out2 = TP.token_dropout(
        df.repartition(7), "doc_id", "text", rate_permille=200
    )
    assert sorted(
        (r["id"], r["n_kept"], r["text_aug"]) for r in out2.collect()
    ) == rows1
    # realized drop rate near 20% over 2000 tokens
    total = sum(r[1] for r in rows1)
    assert 0.70 <= total / 2000 <= 0.90
    # kept tokens preserve order and come from the original
    for _id, _nk, aug in rows1[:3]:
        toks = aug.split()
        idx = [int(t[1:]) for t in toks]
        assert idx == sorted(idx)
    # a different seed gives a different view
    out3 = TP.token_dropout(df, "doc_id", "text", rate_permille=200, seed=7)
    assert sorted(
        (r["id"], r["n_kept"], r["text_aug"]) for r in out3.collect()
    ) != rows1


def test_shard_stats_covers_all_docs(spark):
    df = spark.createDataFrame(
        [(i, "a b c") for i in range(1000)], "doc_id long, text string"
    )
    rows = TP.shard_stats(df, "doc_id", "text", n_shards=4).collect()
    assert sum(r["n_docs"] for r in rows) == 1000
    assert sum(r["total_tokens"] for r in rows) == 3000
    # roughly balanced: no shard more than 2x the mean
    assert max(r["n_docs"] for r in rows) < 2 * 250


def test_token_dropout_seeds_decorrelate(spark):
    """Different seeds must give (near-)independent drop sets — with
    the seed added AFTER the multiplicative mix they were mere shifted
    intervals overlapping ~90%."""
    df = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(100))) for i in range(20)],
        "doc_id long, text string",
    )

    def dropped(seed):
        out = TP.token_dropout(df, "doc_id", "text", rate_permille=200, seed=seed)
        d = set()
        for r in out.collect():
            kept = set(r["text_aug"].split())
            d |= {(r["id"], f"w{j}") for j in range(100) if f"w{j}" not in kept}
        return d

    a, b = dropped(40503), dropped(40504)
    overlap = len(a & b) / max(1, len(a))
    assert overlap < 0.45, overlap  # independent views ~0.2 expected


def test_strip_common_shingles_removes_planted_boilerplate(spark):
    """A 3-gram planted in >max_docs docs is stripped everywhere,
    including overlap coverage of its full span; rare text survives."""
    from parquet_editor_spark.operators.textprep import strip_common_shingles

    boiler = "accept all cookies"
    rows = [(i, f"unique{i} words {boiler} tail{i}") for i in range(4)]
    rows.append((99, "totally original content here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["clean_text"]
        for r in strip_common_shingles(
            df, "doc_id", "text", n=3, max_docs=3
        ).collect()
    }
    assert len(out) == 5
    for i in range(4):
        # "words" is covered too: the boundary shingle "words accept
        # all" is itself shared by all four docs
        assert out[i] == f"unique{i} tail{i}"
    assert out[99] == "totally original content here"


def test_strip_common_shingles_full_boilerplate_doc_goes_empty(spark):
    from parquet_editor_spark.operators.textprep import strip_common_shingles

    rows = [(i, "one two three") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = strip_common_shingles(df, "doc_id", "text", n=3, max_docs=3).collect()
    assert len(out) == 5
    assert all(r["clean_text"] == "" for r in out)


def test_strip_common_shingles_short_docs_untouched(spark):
    """Docs shorter than n have no shingles — they pass through even
    if their words appear inside common shingles elsewhere."""
    from parquet_editor_spark.operators.textprep import strip_common_shingles

    rows = [(i, "a b c d") for i in range(5)] + [(50, "a b"), (51, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["clean_text"]
        for r in strip_common_shingles(
            df, "doc_id", "text", n=3, max_docs=3
        ).collect()
    }
    assert out[50] == "a b"
    assert out[51] == ""
    assert out[0] == ""  # the common doc is fully covered


def test_strip_common_shingles_partial_overlap_coverage(spark):
    """Coverage is per-position across overlapping common shingles:
    'x a b c y' with common 'a b c' keeps exactly 'x y'."""
    from parquet_editor_spark.operators.textprep import strip_common_shingles

    rows = [(i, "a b c") for i in range(5)] + [(9, "x a b c y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["clean_text"]
        for r in strip_common_shingles(
            df, "doc_id", "text", n=3, max_docs=4
        ).collect()
    }
    assert out[9] == "x y"


def test_pack_documents_spans_and_positions(spark):
    """4 docs × known token counts at block=5: the concatenated
    stream is |3|4|6|2| → offsets 0,3,7,13; doc 3 (6 tokens at
    offset 7) spans blocks 1 and 2."""
    from parquet_editor_spark.operators.textprep import pack_documents

    rows = [
        (1, "a b c"),            # n=3, o=0  -> block 0 pos 0
        (2, "d e f g"),          # n=4, o=3  -> block 0 pos 3 (2 toks), block 1 (2 toks)
        (3, "h i j k l m"),      # n=6, o=7  -> block 1 pos 2 (3), block 2 (3)
        (4, "n o"),              # n=2, o=13 -> block 2 pos 3
        (5, ""),                 # empty doc dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["block_id"], r["id"], r["tok_start"], r["n_block_tokens"], r["block_pos"])
        for r in pack_documents(
            df, "doc_id", "text", block_tokens=5, bucket_docs=2
        ).orderBy("block_id", "id").collect()
    ]
    assert got == [
        (0, 1, 0, 3, 0),
        (0, 2, 0, 2, 3),
        (1, 2, 2, 2, 0),
        (1, 3, 0, 3, 2),
        (2, 3, 3, 3, 0),
        (2, 4, 0, 2, 3),
    ]
    # every block except the last is exactly full
    import collections
    per_block = collections.Counter()
    for b, _, _, nb, _ in got:
        per_block[b] += nb
    assert per_block[0] == per_block[1] == 5 and per_block[2] == 5


def test_pack_documents_bucket_stitching_matches_single_stream(spark):
    """The distributed prefix sum (many small buckets) must place
    every token exactly where one global cumsum would."""
    from parquet_editor_spark.operators.textprep import pack_documents

    rows = [(i, " ".join(["w"] * (1 + i % 7))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = pack_documents(df, "doc_id", "text", 16, bucket_docs=3)
    b = pack_documents(df, "doc_id", "text", 16, bucket_docs=1000)
    key = lambda r: (r["block_id"], r["id"])
    assert sorted(map(tuple, a.collect()), key=lambda t: (t[0], t[1])) == \
        sorted(map(tuple, b.collect()), key=lambda t: (t[0], t[1]))


def test_pack_documents_rejects_bad_block(spark):
    import pytest

    from parquet_editor_spark.operators.textprep import pack_documents

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="block_tokens"):
        pack_documents(df, "doc_id", "text", 0)


def test_pack_blocks_materializes_exact_stream(spark):
    """The packed text must equal the concatenated token stream cut
    every block_tokens — docs crossing block boundaries included."""
    from parquet_editor_spark.operators.textprep import pack_blocks

    rows = [
        (1, "a b c"),
        (2, "d e f g"),
        (3, "h i j k l m"),
        (4, "n o"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["block_id"]: (r["n_docs"], r["n_tokens"], r["block_text"])
        for r in pack_blocks(
            df, "doc_id", "text", block_tokens=5, bucket_docs=2
        ).collect()
    }
    assert got == {
        0: (2, 5, "a b c d e"),
        1: (2, 5, "f g h i j"),
        2: (2, 5, "k l m n o"),
    }


def test_hash_stratified_sample_deterministic_and_rate_accurate(spark):
    """Same keep set on every run/partitioning; per-stratum rate lands
    near the requested percentage; pct=0 and pct=100 are exact."""
    from pyspark.sql import functions as F

    from parquet_editor_spark.operators.textprep import (
        hash_stratified_sample,
    )

    rows = [(i, ["a", "b", "none", "all"][i % 4]) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    pct = (
        F.when(F.col("source") == "a", 25)
        .when(F.col("source") == "b", 75)
        .when(F.col("source") == "none", 0)
        .otherwise(100)
    )
    kept1 = hash_stratified_sample(df, "doc_id", pct).collect()
    kept2 = hash_stratified_sample(
        df.repartition(13), "doc_id", pct
    ).collect()
    assert sorted(r["doc_id"] for r in kept1) == sorted(
        r["doc_id"] for r in kept2
    )
    by_src = {}
    for r in kept1:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    assert by_src.get("none", 0) == 0
    assert by_src["all"] == 1000
    assert abs(by_src["a"] - 250) < 60
    assert abs(by_src["b"] - 750) < 60


# ---------------------------------------------------------------------------
# bpe_tokenize / pack_id_blocks (r10)
# ---------------------------------------------------------------------------

_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("o", "n"), ("an", "d"), ("in", "g"), ("e", "n"), ("o", "r"),
]


def _mk_vocab(merges):
    vocab = {chr(c): i for i, c in enumerate(range(ord("a"), ord("z") + 1))}
    for i, (a, b) in enumerate(merges):
        vocab[a + b] = 26 + i
    return vocab


def _scalar_bpe(word, merges):
    """Independent scalar reference: the GPT-2 encoder.py loop,
    written separately from the kernel (min over ranks dict)."""
    ranks = {m: i for i, m in enumerate(merges)}
    parts = list(word)
    while True:
        pairs = {p for p in zip(parts, parts[1:]) if p in ranks}
        if not pairs:
            return parts
        a, b = min(pairs, key=lambda p: ranks[p])
        out, i = [], 0
        while i < len(parts):
            if i + 1 < len(parts) and (parts[i], parts[i + 1]) == (a, b):
                out.append(a + b)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out


def _replace_mirror(word, merges):
    """Sequential full-replacement mirror over a one-char-per-token
    encoding — the exact construction the DuckDB oracle uses."""
    reprs = {}  # token -> 1-char representation
    s = word
    for i, (a, b) in enumerate(merges):
        pat = reprs.get(a, a) + reprs.get(b, b)
        ph = chr(ord("A") + i)
        reprs[a + b] = ph
        s = s.replace(pat, ph)
    back = {v: k for k, v in reprs.items()}
    return [back.get(c, c) for c in s]


def test_bpe_tokenize_matches_scalar_reference(spark):
    texts = [
        "the theory of everything",
        "anding inin thhe ther ethe anon nin ein ien",
        "winter morning ran on and on thinking",
        "",
        "zzz qqq the the the",
    ]
    vocab = _mk_vocab(_MERGES)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["id"]: (list(r["tokens"]), list(r["input_ids"]))
        for r in TP.bpe_tokenize(
            df, "doc_id", "text", _MERGES, vocab
        ).collect()
    }
    for i, t in enumerate(texts):
        want_toks = [tok for w in t.split() for tok in _scalar_bpe(w, _MERGES)]
        assert got[i][0] == want_toks, (i, t)
        assert got[i][1] == [vocab[tok] for tok in want_toks], (i, t)


def test_bpe_greedy_equals_sequential_replace_mirror():
    """The oracle's soundness: for a VALID merge list, greedy
    lowest-rank-first == sequential full replacement in rank order.
    Property-tested over random words; this is what lets a DuckDB
    replace chain mirror the kernel exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="theraindogn", min_size=0, max_size=24))
    def check(word):
        assert _scalar_bpe(word, _MERGES) == _replace_mirror(word, _MERGES)

    check()


def test_bpe_tokenize_unk_and_validation(spark):
    vocab = _mk_vocab(_MERGES)
    df = spark.createDataFrame([(1, "the x9")], "doc_id long, text string")
    # '9' is outside the vocab: unk_id maps it, no unk_id raises
    row = TP.bpe_tokenize(
        df, "doc_id", "text", _MERGES, vocab, unk_id=-1
    ).collect()[0]
    assert row["tokens"] == ["the", "x", "9"]
    assert row["input_ids"] == [27, 23, -1]
    with pytest.raises(Exception, match="not in vocab"):
        TP.bpe_tokenize(df, "doc_id", "text", _MERGES, vocab).collect()
    with pytest.raises(ValueError, match="merge output"):
        TP.bpe_tokenize(df, "doc_id", "text", [("q", "q")], vocab)


def test_pack_id_blocks_exact_assembly(spark):
    rows = [
        (1, [10, 11, 12]),
        (2, [20]),
        (3, []),  # empty doc: contributes nothing
        (4, [40, 41, 42, 43, 44, 45]),
        (5, [50, 51]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, ids array<int>")
    out = {
        r["block_id"]: r
        for r in TP.pack_id_blocks(
            df, "doc_id", "ids", block_tokens=4, bucket_docs=2
        ).collect()
    }
    stream = [v for _, ids in rows for v in ids]
    want_blocks = [stream[i : i + 4] for i in range(0, len(stream), 4)]
    assert len(out) == len(want_blocks)
    for b, want in enumerate(want_blocks):
        assert list(out[b]["input_ids"]) == want, b
        assert out[b]["n_ids"] == len(want)
    assert out[0]["n_docs"] == 2  # docs 1 and 2
    assert out[1]["n_docs"] == 1  # doc 4 alone spans block 1


def _scalar_bpe_train(texts, n_merges):
    """Independent scalar trainer: token-LIST based (no placeholder
    string trick), but sharing the documented tie-break — max count,
    then lexicographic on the pair's one-char-per-token ENCODING
    (merge j's output encodes as chr('A'+j))."""
    from collections import Counter

    words = Counter(w for t in texts for w in t.split() if w)
    vocab = {w: list(w) for w in words}
    ph = {}  # token string -> placeholder char
    merges = []
    for j in range(n_merges):
        counts = Counter()
        for w, toks in vocab.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] += words[w]
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(),
            key=lambda kv: (
                -kv[1],
                ph.get(kv[0][0], kv[0][0]) + ph.get(kv[0][1], kv[0][1]),
            ),
        )
        merges.append((a, b, cnt))
        ph[a + b] = chr(ord("A") + j)
        for w, toks in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and (toks[i], toks[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_train_matches_scalar_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the theory the thing",
        "banana bandana and another band",
        "singing ringing winging",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "norm string")
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in TP.bpe_train(df, "norm", n_merges=6)
        .orderBy("merge_rank")
        .collect()
    ]
    want = [
        (j, a, b, c)
        for j, (a, b, c) in enumerate(_scalar_bpe_train(texts, 6))
    ]
    assert got == want


def test_bpe_train_oracle_sql_matches_scalar(spark):
    """The unrolled DuckDB mirror implements the same iteration."""
    import duckdb

    texts = [
        "the cat sat on the mat",
        "the theory the thing",
        "banana bandana and another band",
        "singing ringing winging",
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(norm VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in texts])
    sql = TP.bpe_train_oracle_sql("SELECT norm FROM t", n_merges=6)
    duck = [tuple(r) for r in con.sql(sql).fetchall()]
    want = [
        (j, a, b, c)
        for j, (a, b, c) in enumerate(_scalar_bpe_train(texts, 6))
    ]
    assert duck == want


def test_bpe_train_prefix_stability(spark):
    """Greedy BPE selection depends only on the vocabulary state the
    PRIOR merges produced, so (with a batch that divides both
    budgets) a smaller training IS the larger training's merge-rank
    prefix — the law the merge-count sweep entries rely on to train
    once at the largest budget and read the smaller points off
    (r16 optimization)."""
    texts = [
        "the cat sat on the mat",
        "the theory the thing",
        "banana bandana and another band",
        "singing ringing winging",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "norm string")

    def train(n):
        return [
            (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
            for r in TP.bpe_train(df, "norm", n_merges=n, batch=4)
            .orderBy("merge_rank")
            .collect()
        ]

    full = train(16)
    for n in (4, 8):
        assert train(n) == [r for r in full if r[0] < n], f"n={n}"


def test_byte_bpe_train_prefix_stability(spark):
    """Byte-tier twin of the char prefix-stability law — the byte
    merge-count sweep trains once at 32 and slices prefixes."""
    texts = [
        "caffè crème naïve ☕",
        "the cat sat on the mat",
        "banana bandana and another band",
        "данные данные",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")

    def train(n):
        return [
            (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
            for r in TP.byte_bpe_train(df, "text", n_merges=n, batch=4)
            .orderBy("merge_rank")
            .collect()
        ]

    full = train(16)
    for n in (4, 8):
        assert train(n) == [r for r in full if r[0] < n], f"n={n}"


def test_bpe_train_validates_and_ties_deterministic(spark):
    df = spark.createDataFrame([("ab ab ba",)], "norm string")
    with pytest.raises(ValueError, match="n_merges"):
        TP.bpe_train(df, "norm", n_merges=0)
    rows = TP.bpe_train(df, "norm", n_merges=1).collect()
    # ('a','b') x2 beats ('b','a') x2 on the lexicographic tie-break
    assert [(r["lhs"], r["rhs"], r["pair_count"]) for r in rows] == [
        ("a", "b", 2)
    ]


def test_pack_id_blocks_null_ids_count_zero(spark):
    """size(NULL) is -1 in non-ANSI Spark; a null array must not
    subtract from the packing prefix sums."""
    df = spark.createDataFrame(
        [(1, [10, 11]), (2, None), (3, [30, 31])],
        "doc_id long, ids array<int>",
    )
    out = {
        r["block_id"]: list(r["input_ids"])
        for r in TP.pack_id_blocks(
            df, "doc_id", "ids", block_tokens=3, bucket_docs=2
        ).collect()
    }
    assert out == {0: [10, 11, 30], 1: [31]}


def _scalar_bpe_train_batched(texts, n_merges, batch, window_factor):
    """Independent scalar trainer for the r11 BATCHED slot spec:
    rank pairs once per iteration, examine the top batch*window_factor
    by (count desc, encoded pair asc), greedily accept char-disjoint
    (in the one-char-per-token encoding) pairs up to the batch size,
    apply them all, repeat.  Token-LIST based — no placeholder string
    trick — so it is an independent oracle for both engines."""
    from collections import Counter

    words = Counter(w for t in texts for w in t.split() if w)
    vocab = {w: list(w) for w in words}
    ph = {}  # token string -> placeholder char
    merges = []
    window = batch * window_factor
    slot = 0
    while slot < n_merges:
        take = min(batch, n_merges - slot)
        counts = Counter()
        for w, toks in vocab.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] += words[w]
        if not counts:
            break
        enc = lambda t: ph.get(t, t)
        ranked = sorted(
            counts.items(),
            key=lambda kv: (-kv[1], enc(kv[0][0]) + enc(kv[0][1])),
        )[:window]
        accepted = []
        for (a, b), cnt in ranked:
            if len(accepted) >= take:
                break
            cand = enc(a) + enc(b)
            if any(
                c in enc(x) + enc(y) for c in cand for (x, y), _ in accepted
            ):
                continue
            accepted.append(((a, b), cnt))
        for (a, b), cnt in accepted:
            merges.append((slot, a, b, cnt))
            ph[a + b] = TP.bpe_placeholder(slot)
            slot += 1
            for w, toks in vocab.items():
                out, i = [], 0
                while i < len(toks):
                    if (
                        i + 1 < len(toks)
                        and (toks[i], toks[i + 1]) == (a, b)
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                vocab[w] = out
        slot = (slot + batch - 1) // batch * batch  # skip empty slots
    return merges


def test_bpe_placeholder_crosses_26_and_gates():
    assert TP.bpe_placeholder(0) == "A"
    assert TP.bpe_placeholder(25) == "Z"
    assert TP.bpe_placeholder(26) == chr(0xE000)
    assert TP.bpe_placeholder(100) == chr(0xE000 + 74)
    with pytest.raises(ValueError, match="private-use"):
        TP.bpe_placeholder(26 + 6400)


def test_bpe_train_batched_matches_scalar(spark):
    texts = [
        "the cat sat on the mat",
        "the theory the thing thinks",
        "banana bandana and another band",
        "singing ringing winging zing",
        "persistent insistent consistent",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "norm string")
    for batch in (2, 4):
        got = [
            (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
            for r in TP.bpe_train(df, "norm", n_merges=8, batch=batch)
            .orderBy("merge_rank")
            .collect()
        ]
        want = _scalar_bpe_train_batched(texts, 8, batch, 4)
        assert got == want, batch


def test_bpe_train_batched_oracle_matches_spark_past_26(spark):
    """64 merges at batch=4 — past the r10 placeholder ceiling, 16
    Spark jobs — must match the unrolled DuckDB mirror row-for-row
    (the r11 done-criterion)."""
    import duckdb

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs every single day",
        "how vexingly quick daft zebras jump while wizards watch",
        "sphinx of black quartz judge my vow said the old sage",
        "the sage and the fox and the dog walked to the box",
    ] * 3
    df = spark.createDataFrame([(t,) for t in texts], "norm string")
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in TP.bpe_train(df, "norm", n_merges=64, batch=4)
        .orderBy("merge_rank")
        .collect()
    ]
    assert len(got) >= 40  # deep past the 26-slot ceiling
    con = duckdb.connect()
    con.execute("CREATE TABLE t(norm VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in texts])
    sql = TP.bpe_train_oracle_sql(
        "SELECT norm FROM t", n_merges=64, batch=4
    )
    duck = [tuple(r) for r in con.sql(sql).fetchall()]
    assert duck == got


def test_bpe_train_deep_into_pua_matches_scalar(spark):
    """128 merges at batch=16 (8 Spark jobs): placeholders run >100
    slots into the private-use block — the 32k-vocab encoding claim,
    exercised against the independent scalar trainer."""
    base = [
        "interdependence independence interdependent independently",
        "understanding understated understood underwriting underdog",
        "reconstruction reconnaissance reconciliation recognition",
        "transformation transportation transcription translation",
        "internationalization institutionalization industrialization",
        "characterization categorization standardization organization",
    ]
    texts = [" ".join(base[i % len(base)].split()[: 2 + i % 3])
             for i in range(24)] + base * 4
    df = spark.createDataFrame([(t,) for t in texts], "norm string")
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in TP.bpe_train(df, "norm", n_merges=128, batch=16)
        .orderBy("merge_rank")
        .collect()
    ]
    want = _scalar_bpe_train_batched(texts, 128, 16, 4)
    assert got == want
    assert len(got) > 90  # ~70 slots past A-Z: PUA placeholders held
    # the decoded merge table reconstructs real token strings, not
    # placeholder chars
    assert all(
        all(0x61 <= ord(c) <= 0x7A for c in lhs + rhs)
        for _, lhs, rhs, _ in got
    )


def test_bpe_train_checkpoint_bounds_plan_depth(spark, monkeypatch):
    """r12 (the r11 verdict's watch-item): the per-batch projection
    chain is truncated by localCheckpoint every ``checkpoint_every``
    batches, so the analyzed plan's Project depth stays bounded
    across >=8 batches instead of growing linearly — AND the learned
    merges are identical to the unchecked-pointed run."""
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pre-4.0 layout
        from pyspark.sql import DataFrame

    texts = [
        "the cat sat on the mat",
        "the theory the thing thinks",
        "banana bandana and another band",
        "singing ringing winging zing",
        "persistent insistent consistent",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "norm string")

    depths_at_ckpt: list[int] = []
    n_ckpts = [0]
    real_lc = DataFrame.localCheckpoint

    def spy(self, eager=True):
        n_ckpts[0] += 1
        plan = self._jdf.queryExecution().analyzed().toString()
        depths_at_ckpt.append(plan.count("Project"))
        return real_lc(self, eager)

    monkeypatch.setattr(DataFrame, "localCheckpoint", spy)
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in TP.bpe_train(
            df, "norm", n_merges=10, batch=1, checkpoint_every=3
        )
        .orderBy("merge_rank")
        .collect()
    ]
    # 10 batches at K=3 -> checkpoints after batches 3, 6, 9
    assert n_ckpts[0] == 3
    # depth at each checkpoint is the K-batch chain over a leaf (or
    # the initial vocab agg), never the cumulative batch count
    assert max(depths_at_ckpt) <= 6, depths_at_ckpt
    assert depths_at_ckpt[-1] <= depths_at_ckpt[0], depths_at_ckpt

    monkeypatch.setattr(DataFrame, "localCheckpoint", real_lc)
    want = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in TP.bpe_train(
            df, "norm", n_merges=10, batch=1, checkpoint_every=1000
        )
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want

    with pytest.raises(ValueError, match="checkpoint_every"):
        TP.bpe_train(df, "norm", n_merges=1, checkpoint_every=0)


def test_pack_documents_overflow_policies(spark):
    """r12 SFT truncation semantics: wrap splits a crossing doc,
    truncate keeps only the starting-block prefix, drop discards the
    crossing doc — and offsets stay the full cumsum under every
    policy (discarded symbols are implicit padding)."""
    rows = [(0, "a " * 5), (1, "b " * 6), (2, "c " * 4), (3, "d " * 3)]
    # lengths 5,6,4,3 -> offsets 0,5,11,15; block=8:
    #   doc0 [0,5) fits block 0
    #   doc1 [5,11) CROSSES 0->1
    #   doc2 [11,15) fits block 1
    #   doc3 [15,18) CROSSES 1->2
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def placements(overflow):
        out = {}
        for r in TP.pack_documents(
            df, "doc_id", "text", block_tokens=8, overflow=overflow
        ).collect():
            out.setdefault(r["id"], []).append(
                (r["block_id"], r["tok_start"], r["n_block_tokens"],
                 r["block_pos"])
            )
        return {k: sorted(v) for k, v in out.items()}

    wrap = placements("wrap")
    assert wrap[1] == [(0, 0, 3, 5), (1, 3, 3, 0)]
    assert wrap[3] == [(1, 0, 1, 7), (2, 1, 2, 0)]

    trunc = placements("truncate")
    assert trunc[0] == [(0, 0, 5, 0)]
    assert trunc[1] == [(0, 0, 3, 5)]   # tail discarded
    assert trunc[2] == [(1, 0, 4, 3)]   # offset unchanged
    assert trunc[3] == [(1, 0, 1, 7)]

    drop = placements("drop")
    assert 1 not in drop and 3 not in drop
    assert drop[0] == [(0, 0, 5, 0)] and drop[2] == [(1, 0, 4, 3)]

    with pytest.raises(ValueError, match="overflow"):
        TP.pack_documents(df, "doc_id", "text", overflow="pad")


def test_pack_id_blocks_overflow_truncate_blocks_underfull(spark):
    rows = [
        (0, list(range(100, 105))),
        (1, list(range(200, 206))),
        (2, list(range(300, 304))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, ids array<int>")
    out = {
        r["block_id"]: r
        for r in TP.pack_id_blocks(
            df, "doc_id", "ids", block_tokens=8, overflow="truncate"
        ).collect()
    }
    # block 0: doc0 full + doc1 prefix [200,201,202]; block 1: doc2
    assert out[0]["input_ids"] == [100, 101, 102, 103, 104, 200, 201, 202]
    assert out[1]["input_ids"] == [300, 301, 302, 303]
    assert out[1]["n_ids"] == 4  # underfull: truncation padding slots


def test_sft_pack_v2_loss_mask_invariants(spark, sf_dir):
    """r12: the v2 SFT pack's popcount invariants — every block's
    trained-token count is the odd-symbol count (masks ride inside
    symbols); drop-policy blocks hold only WHOLE segments (no
    truncated piece can appear), so per-policy totals order
    wrap >= truncate >= drop."""
    import __spark_entry__ as M

    rows = M.queries()["sft_pack_docs_v2"](spark, sf_dir).collect()
    by_policy = {}
    for r in rows:
        assert 0 <= r["n_loss_ids"] <= r["n_syms"]
        assert r["n_syms"] <= 64
        # head_syms odd-count never exceeds the block's popcount
        head = [int(x) for x in r["head_syms"].split(",") if x != ""]
        assert sum(1 for x in head if x % 2) <= r["n_loss_ids"]
        p = by_policy.setdefault(
            r["policy"], {"syms": 0, "loss": 0, "segs": 0}
        )
        p["syms"] += r["n_syms"]
        p["loss"] += r["n_loss_ids"]
        p["segs"] += r["n_segments"]
    assert set(by_policy) == {"truncate", "drop"}
    t, d = by_policy["truncate"], by_policy["drop"]
    # truncate keeps every segment's prefix; drop discards crossing
    # segments entirely
    assert t["segs"] >= d["segs"]
    assert t["syms"] >= d["syms"] and t["loss"] >= d["loss"]
    assert d["segs"] > 0  # fixture actually exercises both policies


# ---------------------------------------------------------------------------
# r14: ngram_novelty short-doc guard (the r13 ADVICE crash repro)
# ---------------------------------------------------------------------------

def test_ngram_novelty_short_docs_null_branch(spark):
    """Docs with <3 tokens must emit zero counts and NULL novelty —
    NOT crash: unguarded sequence(1, size-2) DESCENDS into [1, 0]
    when size < 3 and element_at(t, 0) raises under ANSI (confirmed
    r13 ADVICE repro)."""
    df = spark.createDataFrame(
        [
            (1, "a b c d"),        # 2 trigrams, both novel
            (2, "a b c"),          # 1 trigram, duplicate of doc 1's
            (3, "a b"),            # 2 tokens  → NULL novelty
            (4, "a"),              # 1 token   → NULL novelty
            (5, ""),               # 0 tokens  → NULL novelty
            (6, "  "),             # whitespace-only → NULL novelty
        ],
        "doc_id long, norm string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in TP.ngram_novelty(df, "doc_id", "norm").collect()
    }
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (1, 0, 0.0)
    for short in (3, 4, 5, 6):
        assert got[short] == (0, 0, None), (short, got[short])


def test_ngram_novelty_counts_distinct_gram_types(spark):
    """A gram repeated inside one doc counts ONCE (distinct types),
    and first-occurrence is by min id."""
    df = spark.createDataFrame(
        [(10, "x y z x y z x y z"), (20, "x y z q")],
        "doc_id long, norm string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"])
        for r in TP.ngram_novelty(df, "doc_id", "norm").collect()
    }
    # doc 10: grams {xyz, yzx, zxy} all novel; doc 20: {xyz, yzq},
    # xyz already introduced by doc 10
    assert got[10] == (3, 3)
    assert got[20] == (2, 1)


# ---------------------------------------------------------------------------
# r14: stratified_exact_k — scale-safe exact top-K per stratum
# ---------------------------------------------------------------------------

def _sek_fixture(spark, n=500):
    rows = [(i, f"lang{i % 3}") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    return df.withColumn(
        "__h", F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8"))
    )


def test_stratified_exact_k_matches_single_window(spark):
    """The bucketed selection AND its global ranks must be
    bit-identical to the skewed single-key window it replaces."""
    from pyspark.sql import Window as W

    df = _sek_fixture(spark)
    quotas = spark.createDataFrame(
        [("lang0", 7), ("lang1", 40), ("lang2", 0)],
        "lang string, quota long",
    )
    got = {
        (r["lang"], r["doc_id"]): r["r"]
        for r in TP.stratified_exact_k(
            df, "lang", "__h", "doc_id", quotas
        ).collect()
    }
    ref_rank = F.row_number().over(
        W.partitionBy("lang").orderBy(
            F.col("__h").asc(), F.col("doc_id").asc()
        )
    )
    want = {
        (r["lang"], r["doc_id"]): r["r"]
        for r in df.withColumn("r", ref_rank)
        .join(F.broadcast(quotas), "lang")
        .filter(F.col("r") <= F.col("quota"))
        .collect()
    }
    assert got == want
    assert sum(1 for (lg, _) in got if lg == "lang0") == 7
    assert sum(1 for (lg, _) in got if lg == "lang2") == 0


def test_stratified_exact_k_quota_exceeds_population(spark):
    """quota > stratum size keeps the whole stratum, exact ranks."""
    df = _sek_fixture(spark, n=30)
    quotas = spark.createDataFrame(
        [("lang0", 999), ("lang1", 999), ("lang2", 999)],
        "lang string, quota long",
    )
    out = TP.stratified_exact_k(
        df, "lang", "__h", "doc_id", quotas
    ).collect()
    assert len(out) == 30
    ranks = sorted(r["r"] for r in out if r["lang"] == "lang0")
    assert ranks == list(range(1, len(ranks) + 1))


def test_stratified_exact_k_rank_window_is_bucket_keyed(spark):
    """The data-sized rank window must partition on (stratum, bucket),
    never on the stratum alone — the 100 TB skew guarantee.  Read the
    physical plan: every row_number window over the corpus must carry
    the __b bucket key in its partition spec."""
    df = _sek_fixture(spark)
    quotas = spark.createDataFrame(
        [("lang0", 5), ("lang1", 5), ("lang2", 5)],
        "lang string, quota long",
    )
    out = TP.stratified_exact_k(df, "lang", "__h", "doc_id", quotas)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    windows = [
        ln for ln in plan.splitlines() if "row_number()" in ln
    ]
    assert windows, "expected a row_number window in the plan"
    for ln in windows:
        spec = ln[ln.index("row_number()"):]
        assert "__b" in spec, f"lang-only rank window in plan: {ln}"


# ---------------------------------------------------------------------------
# r14: byte-level BPE with byte fallback
# ---------------------------------------------------------------------------

_BB_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("o", "r"),
    ("e", "r"), (" ", "the"), (" ", "a"),
]


def test_byte_bpe_exact_roundtrip_and_fallback(spark):
    """Every string tokenizes (no OOV), detok == NFC(input) exactly,
    and multibyte chars fall back to their raw bytes."""
    import unicodedata

    cases = [
        (1, "the cat in the hat"),
        (2, "café composed"),         # NFC composes to café
        (3, "試験 \U0001F600"),     # CJK + astral emoji
        (4, ""),
        (5, "naïve mixed مرحبا"),
        (6, "ththe tthhe"),                  # greedy adversarial
    ]
    df = spark.createDataFrame(cases, "doc_id long, t string")
    out = {
        r["id"]: r
        for r in TP.byte_bpe_tokenize(
            df, "doc_id", "t", _BB_MERGES
        ).collect()
    }
    for i, t in cases:
        r = out[i]
        nfc = unicodedata.normalize("NFC", t)
        assert r["exact"] == 1, (i, r["detok"], nfc)
        assert r["detok"] == nfc
        want_fb = sum(1 for b in nfc.encode("utf-8") if b >= 128)
        assert r["n_fallback"] == want_fb, (i, r["n_fallback"], want_fb)
        assert all(0 <= x < 256 + len(_BB_MERGES) for x in r["input_ids"])
    # composed char ids: é = 0xC3 0xA9
    assert out[2]["input_ids"][3:5] == [0xC3, 0xA9]
    # merges actually fire: 'the' -> 257 after ' the'(262) bootstrap
    assert 262 in out[1]["input_ids"] or 257 in out[1]["input_ids"]


def test_byte_bpe_oracle_sql_matches_kernel(spark):
    """The DuckDB replace-chain mirror must reproduce the kernel's id
    stream value-for-value on every UTF-8 length class."""
    import duckdb

    cases = [
        (1, "the cat in the hat"),
        (2, "or er and the café"),
        (3, "試験 \U0001F680\U0001F680 test"),
        (4, ""),
        (5, " a an or"),
    ]
    df = spark.createDataFrame(cases, "doc_id long, t string")
    got = {
        r["id"]: list(r["input_ids"])
        for r in TP.byte_bpe_tokenize(
            df, "doc_id", "t", _BB_MERGES
        ).collect()
    }
    con = duckdb.connect()
    expr = TP.byte_bpe_oracle_sql("t", _BB_MERGES)
    for i, t in cases:
        want = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS t)", [t]
        ).fetchone()[0]
        assert got[i] == list(want or []), (i, got[i], want)


def test_byte_bpe_validates_merge_list(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, t string")
    with pytest.raises(ValueError, match="earlier merge output"):
        TP.byte_bpe_tokenize(df, "doc_id", "t", [("ab", "c")])
    with pytest.raises(ValueError, match="duplicate merge output"):
        TP.byte_bpe_tokenize(
            df, "doc_id", "t", [("a", "b"), ("a", "b")]
        )


def test_mixture_epochs_integer_plan(spark):
    """Integer plan arithmetic against hand-computed values, plus the
    deterministic remainder selection (same (id, seed) hash as
    hash_split)."""
    rows = [(i, "s0" if i < 10 else "s1", "a b c d e") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, src string, t string")
    out = {
        r["source"]: r
        for r in TP.mixture_epochs(
            df, "src", "id", "t", {"s0": 75, "s1": 25},
            budget_tokens=1000,
        ).collect()
    }
    # s0: 10 docs x 5 toks = 50; desired 750 -> 15 epochs, rem 0
    assert out["s0"]["toks"] == 50
    assert out["s0"]["epochs"] == 15
    assert out["s0"]["rem_millis"] == 0
    assert out["s0"]["total_toks"] == 750
    # s1: 30 docs x 5 = 150; desired 250 -> 1 epoch, rem 100/150
    assert out["s1"]["epochs"] == 1
    assert out["s1"]["rem_millis"] == (100 * 1000) // 150
    # remainder selection is the portable bucket — recompute
    want = sum(
        1 for i in range(10, 40)
        if ((i % 1000003) * 2654435761 + 40503) % 4294967296 % 1000
        < out["s1"]["rem_millis"]
    )
    assert out["s1"]["rem_docs"] == want
    assert out["s1"]["total_toks"] == 150 + out["s1"]["rem_toks"]
    with pytest.raises(ValueError, match="non-empty"):
        TP.mixture_epochs(df, "src", "id", "t", {}, 10)
    with pytest.raises(ValueError, match="int percent"):
        TP.mixture_epochs(df, "src", "id", "t", {"s0": 0.5}, 10)
