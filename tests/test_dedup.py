"""Differential tests for operators/dedup.py: brute-force Python
Jaccard as ground truth; an independent SimHash implementation; LSH
recall against the exact pair set (SURVEY.md §5)."""

import hashlib
import re

import pytest

from parquet_editor_spark.operators import dedup as D


def py_shingles(t, n=3):
    toks = [w for w in re.split(r"\s+", t) if w]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)} if len(toks) >= n else set()


@pytest.fixture(scope="module")
def ground_truth_pairs(documents):
    """Brute-force all-pairs 3-gram Jaccard ≥ 0.7 in pure Python."""
    rows = documents.select("doc_id", "text").collect()
    sets = {r["doc_id"]: py_shingles(r["text"]) for r in rows}
    ids = sorted(sets)
    out = {}
    for i, a in enumerate(ids):
        sa = sets[a]
        if not sa:
            continue
        for b in ids[i + 1 :]:
            sb = sets[b]
            if not sb:
                continue
            inter = len(sa & sb)
            if inter == 0:
                continue
            j = inter / (len(sa) + len(sb) - inter)
            if j >= 0.7:
                out[(a, b)] = round(j, 4)
    return out


def test_jaccard_pairs_exact(documents, ground_truth_pairs):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.jaccard_pairs(documents, "doc_id", "text", 3, 0.7).collect()
    }
    assert got == pytest.approx(ground_truth_pairs)


def test_minhash_lsh_recall_and_precision(documents, ground_truth_pairs):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.minhash_lsh_pairs(documents, "doc_id", "text", 3, 0.7).collect()
    }
    # precision is exact by construction (candidates verified);
    # recall on the J≈0.98 corpus must be 1.0
    assert got == pytest.approx(ground_truth_pairs)


def test_jaccard_max_df_lower_bounds(documents, ground_truth_pairs):
    got = D.jaccard_pairs(documents, "doc_id", "text", 3, 0.7, max_df=50).collect()
    keys = {(r["id_a"], r["id_b"]) for r in got}
    assert keys <= set(ground_truth_pairs)


def test_exact_dedup_rows(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "id long, text string"
    )
    assert D.exact_dedup(df, ["text"]).count() == 2
    groups = {r["canonical_id"]: r["n_docs"] for r in D.exact_dup_groups(df, "id", "text").collect()}
    assert groups == {1: 2, 3: 1}


def py_simhash(text):
    votes = [0] * 64
    for w in str(text).split():
        h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    v = sum(1 << b for b in range(64) if votes[b] > 0)
    return v - (1 << 64) if v >= (1 << 63) else v


def test_simhash_matches_python(documents):
    got = {r["id"]: r["simhash"] for r in D.simhash(documents, "doc_id", "text").collect()}
    for r in documents.select("doc_id", "text").limit(30).collect():
        assert got[r["doc_id"]] == py_simhash(r["text"])


def test_simhash_pairs_complete(documents):
    """Block-join candidate generation is exact for hamming ≤ 3
    (pigeonhole): compare against brute-force over all simhashes."""
    sh = {r["id"]: r["simhash"] for r in D.simhash(documents, "doc_id", "text").collect()}
    ids = sorted(sh)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1") <= 3:
                want.add((a, b))
    got = {
        (r["id_a"], r["id_b"])
        for r in D.simhash_pairs(documents, "doc_id", "text", 3).collect()
    }
    assert got == want


def test_contamination_finds_planted_crosssource_dups(documents):
    from pyspark.sql import functions as F

    corpus = documents.filter(F.col("source") != "src0")
    bench = documents.filter(F.col("source") == "src0")
    got = D.contamination(corpus, bench, "doc_id", "text", threshold=0.2)
    rows = {r["id"]: (r["overlap"], r["contaminated"]) for r in got.collect()}
    assert len(rows) == corpus.count()          # every corpus doc scored
    flagged = [ov for ov, c in rows.values() if c]
    clean = [ov for ov, c in rows.values() if not c]
    # the planted cross-source near-dups surface at overlap ≈ 1.0
    assert max(flagged) >= 0.99
    assert all(ov >= 0.2 for ov in flagged) and all(ov < 0.21 for ov in clean)


def test_contamination_identical_benchmark_is_full_overlap(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "totally different words here now")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, "a b c d e f")], "doc_id long, text string")
    rows = {r["id"]: r for r in
            D.contamination(df, bench, "doc_id", "text").collect()}
    assert rows[1]["overlap"] == 1.0 and rows[1]["contaminated"]
    assert rows[2]["overlap"] == 0.0 and not rows[2]["contaminated"]


def test_common_shingle_fraction_differential(documents):
    """Python ground truth: per-doc fraction of distinct 3-gram
    shingles whose corpus document-frequency is >= min_docs."""
    from collections import Counter

    import pytest as _pytest

    rows = documents.select("doc_id", "text").collect()
    sets = {r["doc_id"]: py_shingles(r["text"]) for r in rows}
    dfreq = Counter()
    for s in sets.values():
        dfreq.update(s)
    got = {
        r["id"]: r
        for r in D.common_shingle_fraction(
            documents, "doc_id", "text", n=3, min_docs=4
        ).collect()
    }
    scored = {d for d, s in sets.items() if s}
    assert set(got) == scored
    for d in scored:
        s = sets[d]
        n_common = sum(1 for g in s if dfreq[g] >= 4)
        assert got[d]["n_shingles"] == len(s)
        assert got[d]["n_common"] == n_common
        assert got[d]["common_frac"] == _pytest.approx(
            n_common / len(s), abs=5.1e-5
        )


def test_incremental_dedup_keeps_unseen_first(spark):
    new = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa"), (5, "cc")], "id long, text string"
    )
    seen = spark.createDataFrame([(9, "bb")], "id long, text string")
    out = D.incremental_dedup(new, seen, "id", "text")
    assert {r["id"] for r in out.collect()} == {1, 5}
    assert "fp" in out.columns


def test_incremental_dedup_column_key(spark):
    """The dedup key may be an expression — here a 1-char prefix."""
    from pyspark.sql import functions as F

    new = spark.createDataFrame(
        [(1, "axx"), (2, "ayy"), (3, "bzz")], "id long, text string"
    )
    seen = spark.createDataFrame([(9, "bqq")], "id long, text string")
    out = D.incremental_dedup(new, seen, "id", F.substring("text", 1, 1))
    assert {r["id"] for r in out.collect()} == {1}


def test_exact_dedup_keep_priority_wins(spark):
    """Keeper policy: lowest (priority, id) wins its fingerprint
    group; group size rides out as n_dups; uniques pass through."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "aa", "web"),
            (2, "aa", "curated"),   # same text, better source → wins
            (3, "bb", "web"),
            (4, "aa", "curated"),   # tie on priority → lower id (2) wins
        ],
        "id long, text string, source string",
    )
    prio = F.when(F.col("source") == "curated", 0).otherwise(1)
    out = {
        r["id"]: (r["source"], r["n_dups"])
        for r in D.exact_dedup_keep(df, "id", "text", prio).collect()
    }
    assert out == {2: ("curated", 3), 3: ("web", 1)}


def test_exact_dedup_keep_plan_is_single_agg(spark):
    """Scale shape: the keeper is ONE hash aggregate (min_by partial-
    combines map-side) — no window, no join in the plan."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "aa", "x"), (2, "aa", "y")], "id long, text string, source string"
    )
    out = D.exact_dedup_keep(df, "id", "text", F.lit(0))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Join" not in plan
    assert plan.count("Exchange") == 1


def test_incremental_minhash_dedup_cross_and_in_batch(spark):
    """Near-dup admission: a new doc matching a SEEN doc is rejected,
    a new doc matching only a lower-id batch-mate is rejected, the
    lower-id mate and novel docs are admitted."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    seen = spark.createDataFrame(
        [(0, base), (2, "completely unrelated text about spark plans")],
        "id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, base + " ok"),                       # ≈ seen 0 → rejected
            (3, "novel content one two three four five six seven"),
            (5, "novel content one two three four five six seven yes"),
            # ≈ batch-mate 3 (lower id) → rejected, 3 itself admitted
            (7, "some other genuinely fresh document body here"),
        ],
        "id long, text string",
    )
    kept = sorted(
        r["id"]
        for r in D.incremental_minhash_dedup(
            new, seen, "id", "text", n=3, threshold=0.5
        ).collect()
    )
    assert kept == [3, 7]


def test_source_overlap_matrix_counts(spark):
    from parquet_editor_spark.operators.dedup import source_overlap_matrix

    rows = [
        (0, "A", "w1 w2 w3 w4"),        # shingles: {w1w2w3, w2w3w4}
        (1, "B", "w1 w2 w3"),           # {w1w2w3}
        (2, "C", "x1 x2 x3"),           # {x1x2x3} — disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_matrix(df, "source", "text").collect()
    }
    ab = out[("A", "B")]
    assert (ab["shared"], ab["n_a"], ab["n_b"]) == (1, 2, 1)
    assert ab["overlap"] == 1.0     # B is fully contained in A
    assert ("A", "C") not in out    # zero shared shingles -> no row
    assert ("B", "C") not in out


def test_fuzzy_word_pairs_finds_all_distance1_kinds(spark):
    from parquet_editor_spark.operators.dedup import fuzzy_word_pairs

    # substitution (cat~bat), deletion/insertion (cart~cat is dist 2 —
    # excluded; cars~car dist 1), identical words (no self-pair),
    # transposition (act~cat is dist 2 — must be rejected by verify)
    df = spark.createDataFrame(
        [("cat bat car cars act zebra",)], "text string"
    )
    got = {
        (r["word_a"], r["word_b"]): r["dist"]
        for r in fuzzy_word_pairs(df, "text").collect()
    }
    # exact expectation via python reference
    import itertools

    def lev(a, b):
        m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            m[i][0] = i
        for j in range(len(b) + 1):
            m[0][j] = j
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i][j] = min(
                    m[i - 1][j] + 1,
                    m[i][j - 1] + 1,
                    m[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return m[len(a)][len(b)]

    vocab = sorted(set("cat bat car cars act zebra".split()))
    want = {
        (a, b): 1
        for a, b in itertools.combinations(vocab, 2)
        if lev(a, b) <= 1
    }
    assert got == want
    assert ("act", "cat") not in got  # transposition = distance 2


# --- review-fix regressions ------------------------------------------------


def test_contamination_survives_short_docs(spark):
    """A corpus doc shorter than n tokens has an empty shingle set;
    the overlap must be NULL/uncontaminated, not an ANSI
    DIVIDE_BY_ZERO abort of the whole scan."""
    corpus = spark.createDataFrame(
        [(0, "hi"), (1, "a b c d e")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    rows = {r["id"]: r for r in D.contamination(
        corpus, bench, "doc_id", "text").collect()}
    assert rows[0]["overlap"] is None
    assert rows[0]["contaminated"] is False
    assert rows[1]["contaminated"] is True


def test_simhash_pairs_exact_match_setting(spark):
    """max_hamming=0 (64-bit block) must not overflow the mask."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "x y z")],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"])
             for r in D.simhash_pairs(df, "doc_id", "text", max_hamming=0).collect()}
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)


def test_connected_components_raises_on_non_convergence(spark):
    chain = [(i, i + 1) for i in range(8)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    verts = spark.createDataFrame([(i,) for i in range(9)], "id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(verts, pairs, max_iter=2)
    # and with enough iterations the chain is ONE component
    out = D.connected_components(verts, pairs, max_iter=20)
    assert {r["cluster_id"] for r in out.collect()} == {0}


def test_incremental_dedup_rejects_fp_collision(spark):
    new = spark.createDataFrame([(1, "t", "x")], "id long, text string, fp string")
    seen = spark.createDataFrame([("u",)], "text string")
    with pytest.raises(ValueError, match="'fp'"):
        D.incremental_dedup(new, seen, "id", "text")


def test_release_caches_frees_storage(spark):
    """Tracks the SPECIFIC RDD ids this test creates, not global
    counts: the shared session's ContextCleaner asynchronously
    unpersists RDDs other tests have dropped, so a total-count
    before/after comparison races it (the one-in-many-runs r5/r6
    flake: 'assert 9 > 10' — the global count shrank mid-test)."""

    def rdd_ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    df = spark.createDataFrame(
        [(i, "a b c d e f g h " + str(i)) for i in range(20)],
        "doc_id long, text string",
    )
    before = rdd_ids()
    pairs = D.jaccard_pairs(df, "doc_id", "text")
    pairs.count()  # materialize → shingle cache is now persisted
    created = rdd_ids() - before
    assert created, "jaccard_pairs materialization cached nothing"
    D.release_caches(pairs)
    assert not (rdd_ids() & created), "shingle cache still persisted"


def _winnow_norm(text):
    return " ".join(
        "".join(ch if ch.isalnum() or ch.isspace() else " "
                for ch in text.lower()).split()
    )


def _winnow_ref(text, gram_hash, k=8, w=4):
    """Independent scalar winnowing with a pluggable gram hash."""
    s = _winnow_norm(text)
    hs = [gram_hash(s[i:i + k]) for i in range(len(s) - k + 1)]
    return {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}


def _poly_hash(gram):
    from parquet_editor_spark.operators.dedup import (
        WINNOW_BASE,
        WINNOW_MOD,
    )

    h = 0
    for ch in gram:
        h = (h * WINNOW_BASE + ord(ch)) % WINNOW_MOD
    return h


def test_winnow_fingerprints_matches_reference_and_guarantee(spark):
    """Spark winnowing equals an independent python implementation,
    and the winnowing guarantee holds: two docs sharing a substring
    of length >= k+w-1 share at least one fingerprint."""
    from parquet_editor_spark.operators.dedup import winnow_fingerprints

    shared = "a very distinctive shared phrase here"
    rows = [
        (1, f"alpha {shared} omega"),
        (2, f"{shared} entirely different tail text"),
        (3, "nothing in common with the others at all"),
        (4, "tiny"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = winnow_fingerprints(df, "doc_id", "text", k=8, w=4).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["id"], set()).add(r["fp"])
    assert 4 not in by_id and 5 not in by_id  # too short / null

    for i, text in rows[:3]:
        assert by_id[i] == _winnow_ref(text, _poly_hash), i
    assert by_id[1] & by_id[2], "winnowing guarantee violated"
    assert not (by_id[3] & by_id[1] & by_id[2])


def test_winnow_gram_hash_sql_mirrors_spark_polynomial():
    """The DuckDB Horner chain (winnow_gram_hash_sql) and the Spark
    unrolled polynomial come from one recurrence — pin value equality
    on real grams through the scalar twin of each."""
    import duckdb

    from parquet_editor_spark.operators.dedup import winnow_gram_hash_sql

    con = duckdb.connect()
    sql = winnow_gram_hash_sql("c", "p", 8)
    for gram in ["abcdefgh", "the quic", "zz 99 aa", "        "]:
        duck = con.sql(
            f"SELECT {sql} FROM (SELECT ? AS c, 1 AS p)", params=[gram]
        ).fetchone()[0]
        assert duck == _poly_hash(gram), gram


def test_winnow_pair_output_invariant_under_hash_swap(spark):
    """A/B for the r10 hash swap (r9 verdict item 5): the pair SET a
    winnowing pair join produces on docs with genuine shared
    substrings is identical under the old md5-prefix gram hash and
    the new polynomial — the fingerprints differ, the containment
    signal must not."""
    import hashlib

    from parquet_editor_spark.operators.dedup import winnow_fingerprints

    boiler = "subscribe to our newsletter for updates every week"
    quote = "to be or not to be that is the question"
    rows = [
        (1, f"first article body {boiler} more original prose one"),
        (2, f"{boiler} completely different second article text"),
        (3, f"essay citing {quote} with commentary around it"),
        (4, f"another essay quoting {quote} differently framed"),
        (5, "entirely disjoint prose about gardening tools"),
        (6, "something else covering kitchen recipe notes"),
    ]

    def md5_hash(gram):
        return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)

    def pairs(gram_hash):
        fps = {i: _winnow_ref(t, gram_hash) for i, t in rows}
        out = set()
        for a in fps:
            for b in fps:
                if a < b and len(fps[a] & fps[b]) >= 3:
                    out.add((a, b))
        return out

    assert pairs(md5_hash) == pairs(_poly_hash) == {(1, 2), (3, 4)}

    # and the production operator agrees with the scalar poly pairs
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, "doc_id", "text", k=8, w=4)
    spark_fps = {}
    for r in fps.collect():
        spark_fps.setdefault(r["id"], set()).add(r["fp"])
    got = {
        (a, b)
        for a in spark_fps
        for b in spark_fps
        if a < b and len(spark_fps[a] & spark_fps[b]) >= 3
    }
    assert got == {(1, 2), (3, 4)}


def test_winnow_fingerprints_validates_args(spark):
    import pytest

    from parquet_editor_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k >= 2"):
        winnow_fingerprints(df, "doc_id", "text", k=1)


def test_line_dedup_keeps_global_first_occurrence(spark):
    from parquet_editor_spark.operators.dedup import line_dedup

    boiler = "subscribe to our newsletter"
    rows = [
        (1, f"intro one. {boiler}. body one"),
        (2, f"{boiler}. body two. {boiler}"),  # in-doc repeat too
        (3, "body three. x"),                   # 'x' short: passes thru
        (4, f"x. {boiler}. body three"),        # dup body from doc 3
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r
        for r in line_dedup(
            df, "doc_id", "text", sep=". ", min_chars=2
        ).collect()
    }
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 3)
    assert out[1]["kept_text"] == rows[0][1]
    # doc 2: boiler already seen (doc1,pos1); both copies drop
    assert out[2]["kept_text"] == "body two"
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (3, 1)
    # doc 3 intact; doc 4 keeps short 'x' (unkeyed) but loses dups
    assert out[3]["kept_text"] == "body three. x"
    assert out[4]["kept_text"] == "x"
    assert (out[4]["n_lines"], out[4]["n_kept"]) == (3, 1)
    # empty doc: one empty line, trimmed '' below min_chars -> kept
    assert (out[5]["n_lines"], out[5]["n_kept"]) == (1, 1)
    assert out[5]["kept_text"] == ""


def test_line_dedup_whitespace_canonicalization(spark):
    from parquet_editor_spark.operators.dedup import line_dedup

    rows = [(1, "alpha beta\ngamma"), (2, "  alpha beta  \ndelta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r["kept_text"]
        for r in line_dedup(df, "doc_id", "text").collect()
    }
    # trim-canonical: doc 2's padded copy is the same line
    assert out[1] == "alpha beta\ngamma"
    assert out[2] == "delta"


# ---------------------------------------------------------------------------
# r12: exact-substring dedup (Lee et al. 2022 ExactSubstr)
# ---------------------------------------------------------------------------


def _brute_substring_dedup(rows, min_len, k=8):
    """Reference implementation of substring_dedup's semantics: for
    every pair a<b, char-equality runs at every alignment offset; a
    run of length >= min_len is a span in b; spans merge per doc and
    subtract (keep-first)."""
    spans = {i: [] for i, _ in rows}
    for ia, (a, ta) in enumerate(rows):
        for b, tb in rows[ia + 1:]:
            # offset o = pb - pa (0-based here)
            for o in range(-(len(ta) - 1), len(tb)):
                run = 0
                lo = max(0, o)
                hi = min(len(tb), len(ta) + o)
                for pb in range(lo, hi + 1):
                    same = pb < hi and ta[pb - o] == tb[pb]
                    if same:
                        run += 1
                    else:
                        if run >= max(min_len, k):
                            spans[b].append((pb - run, pb - 1))
                        run = 0
    out = {}
    for i, t in rows:
        sp = sorted(set(spans[i]))
        merged = []
        for s, e in sp:
            if merged and merged[-1][1] >= s - 1:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        kept, nxt = [], 0
        for s, e in merged:
            kept.append(t[nxt:s])
            nxt = e + 1
        kept.append(t[nxt:])
        out[i] = (
            len(merged),
            sum(e - s + 1 for s, e in merged),
            "".join(kept),
        )
    return out


def test_substring_dedup_matches_brute_force_planted(spark):
    from parquet_editor_spark.operators.dedup import substring_dedup

    block_a = "alpha shared passage that runs well past forty characters!"
    block_b = "another, different long block also exceeding the threshold"
    rows = [
        (1, "u1< " + block_a + " >t1"),
        (2, "u2( " + block_a + " )t2 then " + block_b + " end2"),
        (3, "u3[ " + block_b + " ]t3"),
        (4, "no repeats in this one at all, just filler text ok"),
        (5, "u5{ " + block_a + " }t5 " + block_a + " again5"),
        (6, ""),
        (7, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["n_spans"], r["cut_chars"], r["kept_text"])
        for r in substring_dedup(
            df, "doc_id", "text", min_len=40
        ).collect()
    }
    want = _brute_substring_dedup(rows, 40)
    assert got == want
    # the first occurrence is never cut
    assert got[1][1] == 0
    # every later doc containing an earlier doc's block was cut
    # (doc 2's block_b copy is the FIRST occurrence — cut from 3)
    assert got[2][0] >= 1 and got[3][0] >= 1 and got[5][0] >= 2
    # non-skewed planted duplication: the default group_min candidate
    # policy equals the exact all_pairs output (r12 verdict item 1)
    got_ap = {
        r["id"]: (r["n_spans"], r["cut_chars"], r["kept_text"])
        for r in substring_dedup(
            df, "doc_id", "text", min_len=40, candidates="all_pairs"
        ).collect()
    }
    assert got_ap == got


def test_substring_dedup_randomized_matches_brute_force(spark):
    """Randomized A/B: low-alphabet texts with randomly planted
    shared blocks (shared boundary runs, nested/overlapping copies
    arise naturally)."""
    import random

    from parquet_editor_spark.operators.dedup import substring_dedup

    rng = random.Random(1212)
    blocks = [
        "".join(rng.choice("abcd ") for _ in range(rng.randrange(45, 70)))
        for _ in range(4)
    ]
    rows = []
    for i in range(18):
        t = "".join(rng.choice("abcd ") for _ in range(rng.randrange(0, 40)))
        for _ in range(rng.randrange(0, 3)):
            t += rng.choice(blocks)
            t += "".join(
                rng.choice("abcd ") for _ in range(rng.randrange(0, 30))
            )
        rows.append((i, t))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["n_spans"], r["cut_chars"], r["kept_text"])
        for r in substring_dedup(
            df, "doc_id", "text", min_len=40, candidates="all_pairs"
        ).collect()
    }
    want = _brute_substring_dedup(rows, 40)
    assert got == want
    # group_min never cuts MORE than all_pairs, and what it keeps is
    # a superset: the exact kept_text must be recoverable by deleting
    # chars from the group_min kept_text (subsequence containment) —
    # the documented boundary-extension under-cut is the ONLY
    # divergence class
    gm = {
        r["id"]: (r["cut_chars"], r["kept_text"])
        for r in substring_dedup(
            df, "doc_id", "text", min_len=40
        ).collect()
    }

    def _is_subseq(small, big):
        it = iter(big)
        return all(c in it for c in small)

    for i, (cut_ap, kept_ap) in (
        (i, (c, t)) for i, (_, c, t) in got.items()
    ):
        assert gm[i][0] <= cut_ap
        assert _is_subseq(kept_ap, gm[i][1]), i


def test_substring_dedup_skewed_fingerprint_group(spark):
    """The r12 verdict's skew fixture: ONE >= min_len substring
    planted across ~10^3 docs (the license-boilerplate case).  The
    group_min candidate phase must emit exactly m-1 pairs — every doc
    against the group's first occurrence — where all_pairs would blow
    up to m(m-1)/2 = 499500; and the output must still excise the
    planted block from every doc but the first."""
    from parquet_editor_spark.operators.dedup import (
        substring_candidate_pairs,
        substring_dedup,
        winnow_fingerprints,
    )

    planted = (
        "this exact license boilerplate paragraph repeats verbatim "
        "across every page of the crawl"
    )
    m = 1000
    # purest skew: m IDENTICAL docs -> every fingerprint group is the
    # whole corpus with min 0 -> EXACTLY m-1 pairs (all_pairs: 499500)
    ident = spark.createDataFrame(
        [(i, planted) for i in range(m)], "doc_id long, text string"
    )
    fps_i = winnow_fingerprints(
        ident.selectExpr("doc_id AS id", "text AS __t"),
        "id", "__t", k=8, w=4, normalize=False,
    )
    assert substring_candidate_pairs(fps_i, "group_min").count() == m - 1
    # framed variant: per-doc id frames around the global block; frame
    # grams sharing digit suffixes add a few O(1)-partner groups, so
    # the count stays LINEAR in m (quadratic would be ~5*10^5)
    rows = [(i, f"<{i:04d}>" + planted + f"[{i:04d}]") for i in range(m)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(
        df.selectExpr("doc_id AS id", "text AS __t"),
        "id", "__t", k=8, w=4, normalize=False,
    )
    n_pairs = substring_candidate_pairs(fps, "group_min").count()
    assert m - 1 <= n_pairs <= 4 * m, n_pairs
    out = {
        r["id"]: (r["cut_chars"], r["kept_text"])
        for r in substring_dedup(df, "doc_id", "text", min_len=40)
        .collect()
    }
    assert out[0][0] == 0 and planted in out[0][1]
    for i in range(1, m):
        assert out[i][0] >= len(planted), i
        assert planted not in out[i][1], i


def test_substring_dedup_raw_punctuation_run_recall(spark):
    """The r12 ADVICE medium finding: a shared RAW run whose
    normalized image collapses below k+w-1 (a 60-char punctuation
    separator) must still be a candidate — phase 1 fingerprints the
    raw text since r13."""
    from parquet_editor_spark.operators.dedup import substring_dedup

    sep = "!!!###@@@" * 7  # 63 chars, normalizes to ''
    rows = [(1, "alpha doc " + sep + " one"), (2, "beta doc " + sep + " two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["cut_chars"], r["kept_text"])
        for r in substring_dedup(df, "doc_id", "text", min_len=40)
        .collect()
    }
    assert got[1][0] == 0
    assert got[2][0] >= len(sep)
    assert sep not in got[2][1]


def test_substring_dedup_validates_min_len(spark):
    from parquet_editor_spark.operators.dedup import substring_dedup

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_len"):
        substring_dedup(df, "doc_id", "text", min_len=5, k=8, w=4)


def test_substring_dedup_plan_no_cartesian_no_single_partition(spark):
    from parquet_editor_spark import plans as P
    from parquet_editor_spark.operators.dedup import substring_dedup

    df = spark.createDataFrame(
        [(i, f"text {i} " + "shared block far past forty characters ok!")
         for i in range(6)],
        "doc_id long, text string",
    )
    out = substring_dedup(df, "doc_id", "text", min_len=40)
    plan = P.executed_plan(out)
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


# ---------------------------------------------------------------------------
# r12: Bloom-filter seen-set
# ---------------------------------------------------------------------------


def _brute_bloom(keys, n_words, k):
    MOD, BASE = 36028797018963913, 131

    def poly(s):
        h = 0
        for ch in s:
            h = (h * BASE + ord(ch)) % MOD
        return h

    m = n_words * 63
    words = {}
    positions = {}
    for s in keys:
        h1, h2 = poly(s), poly(s[::-1])
        ps = [(h1 + i * h2) % m for i in range(k)]
        positions[s] = ps
        for p in ps:
            words[p // 63] = words.get(p // 63, 0) | (1 << (p % 63))
    return words, positions


def test_bloom_build_and_member_match_brute_force(spark):
    from parquet_editor_spark.operators.dedup import (
        bloom_build,
        bloom_member,
    )

    seen = [f"https://h{i % 5}.com/p/{i}" for i in range(0, 60, 3)]
    cand = [f"https://h{i % 5}.com/p/{i}" for i in range(40)]
    n_words, k = 8, 4  # deliberately tiny -> real false positives
    sdf = spark.createDataFrame([(s,) for s in seen], "key string")
    bloom = bloom_build(sdf, "key", n_words=n_words, k=k)
    words, _ = _brute_bloom(seen, n_words, k)
    got_words = {r["word_idx"]: r["word"] for r in bloom.collect()}
    assert got_words == words

    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cand)], "i long, key string"
    )
    got = {
        r["key"]: r["member"]
        for r in bloom_member(
            cdf, bloom, "key", n_words=n_words, k=k
        ).collect()
    }
    _, cpos = _brute_bloom(cand, n_words, k)
    fp = 0
    for c in cand:
        want = int(
            all(
                words.get(p // 63, 0) >> (p % 63) & 1 for p in cpos[c]
            )
        )
        assert got[c] == want, c
        if want and c not in seen:
            fp += 1
    # every true member is found (no false negatives — the Bloom law)
    for c in cand:
        if c in seen:
            assert got[c] == 1, c
    assert fp > 0  # the tiny filter really exercises the FP path


def test_bloom_member_plan_broadcasts_bitmap(spark):
    from parquet_editor_spark import plans as P
    from parquet_editor_spark.operators.dedup import (
        bloom_build,
        bloom_member,
    )

    df = spark.createDataFrame(
        [(f"k{i}",) for i in range(50)], "key string"
    )
    bloom = bloom_build(df, "key")
    out = bloom_member(df, bloom, "key")
    plan = P.executed_plan(out)
    assert P.has_broadcast_join(out)
    assert "Python" not in plan and "ArrowEval" not in plan, plan

    with pytest.raises(ValueError, match="n_words"):
        bloom_build(df, "key", n_words=0)
    with pytest.raises(ValueError, match="n_words"):
        bloom_member(df, bloom, "key", k=65)


def test_bloom_member_expr_equals_join_probe(spark):
    from parquet_editor_spark.operators.dedup import (
        bloom_build,
        bloom_member,
        bloom_member_expr,
        bloom_words,
    )

    seen = spark.createDataFrame(
        [(f"u{i * 7}",) for i in range(30)], "key string"
    )
    cand = spark.createDataFrame(
        [(i, f"u{i}") for i in range(80)], "i long, key string"
    )
    bloom = bloom_build(seen, "key", n_words=4, k=3)
    via_join = {
        r["key"]: r["member"]
        for r in bloom_member(cand, bloom, "key", n_words=4, k=3).collect()
    }
    words = bloom_words(bloom, 4)
    via_expr = {
        r["key"]: r["m"]
        for r in cand.select(
            "key", bloom_member_expr("key", words, k=3).alias("m")
        ).collect()
    }
    assert via_join == via_expr
    assert sum(via_expr.values()) >= 12  # true members all hit


def test_bloom_union_is_bitwise_or_and_preserves_members(spark):
    """r13 (the r12 verdict's Missing #5): merging two bitmaps must
    equal building over the concatenated key set word-for-word (OR is
    exact set-union at equal m/k), so yesterday's members AND its
    false positives are preserved and new keys absorbed."""
    from parquet_editor_spark.operators.dedup import (
        bloom_build,
        bloom_union,
        bloom_words,
    )

    day1 = [f"a{i}" for i in range(25)]
    day2 = [f"b{i}" for i in range(25)]
    n_words, k = 6, 4
    d1 = spark.createDataFrame([(s,) for s in day1], "key string")
    d2 = spark.createDataFrame([(s,) for s in day2], "key string")
    both = spark.createDataFrame(
        [(s,) for s in day1 + day2], "key string"
    )
    ba = bloom_build(d1, "key", n_words=n_words, k=k)
    bb = bloom_build(d2, "key", n_words=n_words, k=k)
    merged = bloom_words(bloom_union(ba, bb), n_words)
    rebuilt = bloom_words(
        bloom_build(both, "key", n_words=n_words, k=k), n_words
    )
    assert merged == rebuilt
    # superset law: every bit of each day's bitmap survives the merge
    wa = bloom_words(ba, n_words)
    wb = bloom_words(bb, n_words)
    for i in range(n_words):
        assert merged[i] & wa[i] == wa[i]
        assert merged[i] & wb[i] == wb[i]
    # brute-force ground truth on the merged bitmap
    want, _ = _brute_bloom(day1 + day2, n_words, k)
    assert merged == [want.get(i, 0) for i in range(n_words)]
    with pytest.raises(ValueError, match="at least one"):
        bloom_union()
