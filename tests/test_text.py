"""Differential tests for functions/text.py against independent
pure-Python implementations (SURVEY.md §5: the oracle for non-SQL ops
is a second, simpler implementation)."""

import hashlib
import re

import pytest

from parquet_editor_spark.functions import text as X


@pytest.fixture(scope="module")
def doc_rows(documents):
    return documents.select("doc_id", "text").orderBy("doc_id").limit(50).collect()


def py_tokens(t):
    return [w for w in re.split(r"\s+", t) if w]


def test_token_and_char_counts(documents, doc_rows):
    got = {
        r["doc_id"]: (r["nt"], r["nc"])
        for r in documents.select(
            "doc_id",
            X.token_count("text").alias("nt"),
            X.char_count("text").alias("nc"),
        ).collect()
    }
    for r in doc_rows:
        assert got[r["doc_id"]] == (len(py_tokens(r["text"])), len(r["text"]))


def test_word_shingles(documents, doc_rows):
    got = {
        r["doc_id"]: sorted(r["s"])
        for r in documents.select(
            "doc_id", X.word_shingles("text", 3).alias("s")
        ).collect()
    }
    for r in doc_rows:
        toks = py_tokens(r["text"])
        want = sorted({" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}) if len(toks) >= 3 else []
        assert got[r["doc_id"]] == want


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",), ("",), ("one two three",)], "text string")
    sizes = [r[0] for r in df.select(__import__("pyspark.sql.functions", fromlist=["F"]).size(X.word_shingles("text", 3))).collect()]
    assert sizes == [0, 0, 1]


def test_fingerprint_matches_md5(documents, doc_rows):
    got = {
        r["doc_id"]: r["fp"]
        for r in documents.select("doc_id", X.fingerprint("text").alias("fp")).collect()
    }
    for r in doc_rows:
        normalized = re.sub(r"\s+", " ", r["text"].strip()).lower()
        assert got[r["doc_id"]] == hashlib.md5(normalized.encode()).hexdigest()


def test_rolling_hash_matches_python(documents, doc_rows):
    got = {
        r["doc_id"]: r["rh"]
        for r in documents.select("doc_id", X.rolling_hash("text").alias("rh")).collect()
    }
    import hashlib as _hl

    B, M = 31, 1_000_000_007
    for r in doc_rows:
        h, p = 0, 1
        for w in py_tokens(r["text"]):
            wv = int(_hl.md5(w.encode()).hexdigest()[:8], 16)
            h = (h + wv * p) % M
            p = (p * B) % M
        assert got[r["doc_id"]] == h


def test_rolling_hash_order_sensitive(spark):
    df = spark.createDataFrame([("ab cde",), ("cde ab",)], "text string")
    vals = [r[0] for r in df.select(X.rolling_hash("text")).collect()]
    assert vals[0] != vals[1]


def test_rolling_hash_is_content_sensitive(spark):
    """Equal word-length shapes must NOT collide (the hash once used
    only length(w) and grouped 'hello world' with 'earth moons')."""
    df = spark.createDataFrame(
        [("hello world",), ("earth moons",), ("aaa bbb",), ("bbb aaa",)],
        "text string",
    )
    vals = [r[0] for r in df.select(X.rolling_hash("text")).collect()]
    assert len(set(vals)) == 4


def test_lang_id_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("the el",), ("xyz qqq",), ("el la de",), ("the the a",)], "text string"
    )
    got = [r[0] for r in df.select(X.lang_id("text")).collect()]
    # 'the el' → en 1 hit, es 1 hit → alphabetical first of max = en
    assert got == ["en", "und", "es", "en"]


def test_quality_score_monotone(spark):
    rows = [
        ("the quick brown fox jumps over the lazy dog " * 6,),  # long prose
        ("!!! ??? ### $$$ %%%",),  # punctuation garbage
        ("",),
    ]
    df = spark.createDataFrame(rows, "text string")
    scores = [r[0] for r in df.select(X.quality_score("text")).collect()]
    assert scores[0] > scores[1]
    assert scores[1] == 0.0  # punct ratio beyond 0.25 → zero
    assert scores[2] == 0.0


def test_normalize_text_collapses_case_punct(spark):
    df = spark.createDataFrame(
        [("Hello,   WORLD!",), ("hello world",), ("  hello---world  ",)],
        "text string",
    )
    got = [r[0] for r in df.select(X.normalize_text("text")).collect()]
    assert got == ["hello world", "hello world", "hello world"]


def test_stratified_sample_proportions(documents):
    from parquet_editor_spark.operators import query as q

    fr = {"en": 0.5, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 1.0}
    sampled = q.stratified_sample(documents, "lang", fr)
    by_lang = {r["lang"]: r["n"] for r in sampled.groupBy("lang").agg(
        __import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n")
    ).collect()}
    full = {r["lang"]: r["n"] for r in documents.groupBy("lang").agg(
        __import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n")
    ).collect()}
    # full-fraction strata kept entirely; en roughly halved
    for lang in ["de", "es", "fr", "zh"]:
        assert by_lang[lang] == full[lang]
    assert 0.3 * full["en"] <= by_lang["en"] <= 0.7 * full["en"]


def test_redact_pii_replaces_each_kind(spark):
    df = spark.createDataFrame(
        [
            ("mail me at john.doe+x@sub.example.co.uk now",),
            ("call 555-867-5309 or 555.123.4567 or 5551234567",),
            ("server at 192.168.1.254 is down",),
            ("plain text with numbers 42 and 1234 stays",),
        ],
        "text string",
    )
    got = [r[0] for r in df.select(X.redact_pii("text")).collect()]
    assert got[0] == "mail me at <EMAIL> now"
    assert got[1] == "call <PHONE> or <PHONE> or <PHONE>"
    assert got[2] == "server at <IP> is down"
    assert got[3] == "plain text with numbers 42 and 1234 stays"


def test_mean_word_length_and_distinct_ratio(spark):
    df = spark.createDataFrame(
        [("aa bbbb cc aa",), ("x x x x",), ("",)], "text string"
    )
    rows = df.select(
        X.mean_word_length("text").alias("mwl"),
        X.distinct_token_ratio("text").alias("dtr"),
    ).collect()
    assert rows[0]["mwl"] == pytest.approx(10 / 4)
    assert rows[0]["dtr"] == pytest.approx(3 / 4)
    assert rows[1]["mwl"] == pytest.approx(1.0)
    assert rows[1]["dtr"] == pytest.approx(1 / 4)
    assert rows[2]["mwl"] is None and rows[2]["dtr"] is None


def test_gopher_keep_nondegenerate_on_corpus(documents):
    from pyspark.sql import functions as F

    docs = documents.withColumn("__toks", X.tokens("text"))
    t = F.col("__toks")
    staged = docs.select(
        X.token_count("text", t).alias("n"),
        X.mean_word_length("text", t).alias("mwl"),
        X.distinct_token_ratio("text", t).alias("dtr"),
    )
    flags = staged.select(
        X.gopher_keep(F.col("n"), F.col("mwl"), F.col("dtr")).alias("keep")
    )
    counts = {r["keep"]: r["n"] for r in
              flags.groupBy("keep").agg(F.count("*").alias("n")).collect()}
    # thresholds drop some docs and keep some — filter is doing work
    assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0


def test_token_estimate_at_least_tokens(documents):
    from pyspark.sql import functions as F

    bad = documents.select(
        (X.token_estimate("text") < X.token_count("text")).alias("bad")
    ).filter(F.col("bad")).count()
    assert bad == 0


def test_unigram_logprob_orders_rare_docs_lower(spark):
    df = spark.createDataFrame(
        [(1, "common common common common"),
         (2, "common common rare1 rare2")],
        "doc_id long, text string",
    )
    rows = {r["id"]: r["avg_logprob"]
            for r in X.unigram_logprob(df, "doc_id", "text").collect()}
    # doc 2 carries two singleton words → strictly lower mean logprob
    assert rows[2] < rows[1] < 0.0
    # hand-check doc 1: p(common) = 6/8 → ln(0.75)
    import math
    assert rows[1] == pytest.approx(round(math.log(6 / 8), 4))


def test_bigram_logprob_hand_computed(spark):
    import math

    from parquet_editor_spark.functions.text import bigram_logprob

    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "b a"), (2, "a")],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_logprob(df, "doc_id", "text", alpha=0.5).collect()
    }
    # corpus: unigrams a=4 b=3, V=2; bigrams: (a,b)=2 (b,a)=2
    V = 2.0
    p_ab = (2 + 0.5) / (4 + 0.5 * V)   # prev=a count 4
    p_ba = (2 + 0.5) / (3 + 0.5 * V)   # prev=b count 3
    d0 = round((2 * math.log(p_ab) + math.log(p_ba)) / 3, 4)
    d1 = round(math.log(p_ba), 4)
    assert got[0] == (3, d0)
    assert got[1] == (1, d1)
    assert 2 not in got  # single-token doc has no bigrams


def test_quality_score_null_text_scores_zero(spark):
    """least() skips NULLs — a NULL text once scored 0.5 (full length
    credit), outranking every short real document."""
    df = spark.createDataFrame(
        [(None,), ("",), ("the cat sat on the mat",)], "text string"
    )
    vals = [r[0] for r in df.select(X.quality_score("text")).collect()]
    assert vals[0] == 0.0 and vals[1] == 0.0
    assert vals[2] > 0.0


def test_punct_ratio_unicode_and_whitespace(spark):
    df = spark.createDataFrame(
        [("día y noche",), ("的是了",), ("a\tb\nc",), ("a,b!c",)],
        "text string",
    )
    vals = [r[0] for r in df.select(X.punct_ratio("text")).collect()]
    assert vals[0] == 0.0      # accented letters are letters
    assert vals[1] == 0.0      # CJK letters are letters
    assert vals[2] == 0.0      # tabs/newlines are whitespace
    assert vals[3] == pytest.approx(2 / 5)  # ',' and '!' only


def test_with_lang_id_accepts_column_arg(spark):
    """ADVICE r5: both ternary branches were F.col(col), so passing a
    Column (allowed by the module's convention elsewhere) raised inside
    F.col.  A Column argument must behave identically to its name."""
    import pyspark.sql.functions as F

    from parquet_editor_spark.functions.text import with_lang_id

    df = spark.createDataFrame(
        [("the quick brown fox and the lazy dog",),
         ("el perro y el gato en la casa",)],
        ["body"],
    )
    by_name = with_lang_id(df, "body").select("body", "lang_pred")
    by_col = with_lang_id(df, F.col("body")).select("body", "lang_pred")
    assert sorted(map(tuple, by_name.collect())) == sorted(
        map(tuple, by_col.collect())
    )


def test_shared_scan_quality_projection_value_identical(spark, sf_dir):
    """r5 verdict item 8: the shared-scan quality projection
    (fingerprint from the tokens array, stopword hits from the kept
    lang-marker matches) must be VALUE-identical to the independent
    per-metric scans on the real corpus, including NULL and edge
    texts."""
    import pyspark.sql.functions as F

    from parquet_editor_spark.functions import text as X

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    edge = spark.createDataFrame(
        [(100001, None), (100002, ""), (100003, "  the  and\tof \n"),
         (100004, "x"), (100005, " leading and trailing  ")],
        ["doc_id", "text"],
    )
    docs = docs.unionByName(edge).withColumn("__toks", X.tokens("text"))
    toks = F.col("__toks")

    slow = X.with_lang_id(docs, "text", toks=toks).select(
        "doc_id",
        "lang_pred",
        X.quality_score("text", toks).alias("q"),
        X.fingerprint("text").alias("fp"),
    )
    fast = X.with_lang_id(
        docs, "text", toks=toks, keep_matches="__lm"
    ).select(
        "doc_id",
        "lang_pred",
        X.quality_score("text", toks, F.col("__lm")).alias("q"),
        X.fingerprint("text", toks).alias("fp"),
    )
    a = sorted(map(tuple, slow.collect()))
    b = sorted(map(tuple, fast.collect()))
    assert a == b


def test_strip_markup_edges(spark):
    """Tag removal, wholesale script/style dropping, entity order
    (&amp; last so double-escapes surface as literal entities), and
    NULL pass-through."""
    import pyspark.sql.functions as F

    from parquet_editor_spark.functions import text as X

    cases = [
        ("<p>a &amp; b</p>", "a & b"),
        ("x &amp;lt; y", "x &lt; y"),  # double-escape stays literal
        ('<script>if (1 < 2) { s = "<div>"; }</script>after', "after"),
        ("<style>p{color:red}</style>text", "text"),
        ("a&nbsp;b", "a b"),
        ("no markup at all", "no markup at all"),
        ("<unclosed attr='x' y", "<unclosed attr='x' y"),  # no '>' -> kept
        ("", ""),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "id long, t string"
    )
    got = {
        r["id"]: r["c"]
        for r in df.select(
            "id", X.strip_markup("t").alias("c")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_script_counts_classes_and_argmax(spark):
    from parquet_editor_spark.functions import text as X

    df = spark.createDataFrame(
        [
            (1, "Héllo Мир 世界 مرحبا abc123"),
            (2, "Привет мир"),
            (3, "٣٤٥"),  # Arabic-Indic digits: Arabic script AND Nd
            (4, ""),
            (5, None),
        ],
        "id long, t string",
    )
    sc = X.script_counts("t")
    rows = {
        r["id"]: r
        for r in df.select(
            "id", *[c.alias(k) for k, c in sc.items()]
        ).collect()
    }
    assert rows[1]["n_latin"] == 8 and rows[1]["n_cyrillic"] == 3
    assert rows[1]["n_han"] == 2 and rows[1]["n_arabic"] == 5
    assert rows[1]["n_digit"] == 3
    assert rows[1]["script_pred"] == "latin"
    assert rows[2]["script_pred"] == "cyrillic"
    assert rows[3]["n_arabic"] == 3 and rows[3]["n_digit"] == 3
    assert rows[3]["script_pred"] == "arabic"
    assert rows[4]["script_pred"] == "und"
    assert rows[5]["script_pred"] == "und" and rows[5]["n_latin"] is None


# ---------------------------------------------------------------------------
# hash_linear_score (r10)
# ---------------------------------------------------------------------------

def _hl_scalar(text, weights, bias=0.0):
    from parquet_editor_spark.functions.hashing import POLY_BASE, POLY_MOD

    toks = [t for t in text.split(" ") if t]
    feats = toks + [
        f"{a}_{b}" for a, b in zip(toks, toks[1:])
    ]

    def bucket(t):
        h = 0
        for ch in t:
            h = (h * POLY_BASE + ord(ch)) % POLY_MOD
        return h % len(weights)

    if not feats:
        return round(bias, 6)
    s = 0.0
    for t in feats:
        s = s + weights[bucket(t)]
    return round(bias + s / len(feats), 6)


_HL_W = [
    ((b * 2654435761) % 1000003) / 1000003.0 - 0.5 for b in range(64)
]
_HL_W_SQL = "(((__B__ * 2654435761) % 1000003) / 1000003.0 - 0.5)"


def test_hash_linear_score_matches_scalar(spark):
    from parquet_editor_spark.functions.text import hash_linear_score

    texts = [
        "the cat sat on the mat today",
        "one",
        "",
        "a b c d e f g h i j k l",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = {
        r["i"]: r["s"]
        for r in df.select(
            "i", hash_linear_score("t", _HL_W, bias=0.1).alias("s")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == pytest.approx(_hl_scalar(t, _HL_W, 0.1), abs=0), (i, t)


def test_hash_linear_score_sql_mirror_matches_scalar():
    import duckdb

    from parquet_editor_spark.functions.text import hash_linear_score_sql

    sql = hash_linear_score_sql("t", 64, _HL_W_SQL, bias=0.1)
    con = duckdb.connect()
    for t in ["the cat sat on the mat", "", "solo", "x y z x y z"]:
        duck = con.sql(
            f"SELECT round({sql}, 6) FROM (SELECT ? AS t)", params=[t]
        ).fetchone()[0]
        assert duck == pytest.approx(_hl_scalar(t, _HL_W, 0.1), abs=0), t
    import pytest as _pt
    with _pt.raises(ValueError, match="__B__"):
        hash_linear_score_sql("t", 64, "0.5")


def test_hash_linear_score_validates():
    from parquet_editor_spark.functions.text import hash_linear_score

    with pytest.raises(ValueError, match="non-empty"):
        hash_linear_score("t", [])


# ---------------------------------------------------------------------------
# trigram_backoff_logprob (r10)
# ---------------------------------------------------------------------------

def _tri_scalar(score_texts, train_texts, lam=0.4, alpha=0.5):
    import math
    from collections import Counter

    def toks(t):
        return (t or "").split()

    c1, c2, c3 = Counter(), Counter(), Counter()
    for t in train_texts:
        w = toks(t)
        c1.update(w)
        c2.update(zip(w, w[1:]))
        c3.update(zip(w, w[1:], w[2:]))
    N, V = sum(c1.values()), len(c1)
    out = {}
    for i, t in enumerate(score_texts):
        w = toks(t)
        tris = list(zip(w, w[1:], w[2:]))
        if not tris:
            continue
        logs = []
        for a, b, c in tris:
            if (a, b, c) in c3:
                s = c3[(a, b, c)] / c2[(a, b)]
            elif (b, c) in c2:
                s = lam * c2[(b, c)] / c1[b]
            else:
                s = lam * lam * (c1.get(c, 0) + alpha) / (N + alpha * V)
            logs.append(math.log(s))
        out[i] = (len(tris), round(sum(logs) / len(logs), 4))
    return out


def test_trigram_backoff_logprob_matches_scalar(spark):
    from parquet_editor_spark.functions.text import (
        trigram_backoff_logprob,
    )

    train = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog",
    ]
    score = [
        "the cat sat on the rug",     # seen trigrams + bigram backoff
        "the zebra sat quietly here", # unigram backoff + unseen words
        "on the mat",                 # exactly one trigram
        "too short",                  # <3 tokens: drops out
    ]
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score)], "doc_id long, text string"
    )
    got = {
        r["id"]: (r["n_trigrams"], r["avg_logprob"])
        for r in trigram_backoff_logprob(
            sdf, tdf, "doc_id", "text"
        ).collect()
    }
    assert got == _tri_scalar(score, train)


# ---------------------------------------------------------------------------
# train_hash_classifier (r11)
# ---------------------------------------------------------------------------


def _thc_scalar(rows, n_buckets, iters, lr):
    """Independent scalar trainer: same spec — quasi-sigmoid link,
    2^-20 error quantization, exact integer gradient sums, pinned
    float update tree."""
    import math

    from parquet_editor_spark.functions.hashing import POLY_BASE, POLY_MOD

    def buckets(text):
        toks = [t for t in text.split(" ") if t]
        feats = toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
        out = []
        for t in feats:
            h = 0
            for ch in t:
                h = (h * POLY_BASE + ord(ch)) % POLY_MOD
            out.append(h % n_buckets)
        return out

    feat = [(y, buckets(t)) for y, t in rows if buckets(t)]
    nd = len(feat)
    w = [0.0] * n_buckets
    for _ in range(iters):
        g = [0] * n_buckets
        for y, b in feat:
            s = 0.0
            for i in b:
                s = s + w[i]
            m = 0.0 + s / len(b)
            p = 0.5 + 0.5 * (m / (1.0 + abs(m)))
            q = math.floor(((p - float(y)) / len(b)) * 1048576.0)
            for i in b:
                g[i] += q
        for i in range(n_buckets):
            w[i] -= lr * (float(g[i]) / (1048576.0 * nd))
    return w


_THC_ROWS = [
    (1, "the quick brown fox jumps over the lazy dog near the barn"),
    (1, "a well written sentence with many distinct common words"),
    (0, "spam spam spam spam spam spam spam"),
    (0, "buy now buy now buy now cheap cheap"),
    (1, "reading long books improves careful thought over many years"),
    (0, "zzz zzz zzz"),
    (0, ""),
    (1, "another normal document with a healthy mix of english words"),
]


def test_train_hash_classifier_matches_scalar_bitwise(spark):
    from parquet_editor_spark.functions.text import train_hash_classifier

    df = spark.createDataFrame(_THC_ROWS, "y int, norm string")
    got = train_hash_classifier(df, "norm", "y", n_buckets=32, iters=3,
                                lr=0.5)
    want = _thc_scalar(_THC_ROWS, 32, 3, 0.5)
    assert got == want  # bit-identical, abs=0
    assert any(x != 0.0 for x in got)


def test_train_hash_classifier_duckdb_mirror_bitwise(spark):
    import duckdb

    from parquet_editor_spark.functions.text import (
        train_hash_classifier_ctes,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE d(y INT, norm VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", _THC_ROWS)
    ctes, final = train_hash_classifier_ctes(
        "SELECT y, norm FROM d", n_buckets=32, iters=3, lr=0.5
    )
    duck = con.sql(
        f"WITH {ctes} SELECT w.w[r.b::INT + 1] AS wt "
        f"FROM range(32) r(b), {final} w ORDER BY r.b"
    ).fetchall()
    want = _thc_scalar(_THC_ROWS, 32, 3, 0.5)
    assert [r[0] for r in duck] == want  # bit-identical, abs=0


def test_train_hash_classifier_learns_the_labels(spark):
    """Sanity: after training, scoring the training set with the
    learned weights separates the classes."""
    from parquet_editor_spark.functions.text import (
        hash_linear_score,
        train_hash_classifier,
    )

    df = spark.createDataFrame(_THC_ROWS, "y int, norm string")
    w = train_hash_classifier(df, "norm", "y", n_buckets=64, iters=8,
                              lr=1.0)
    scored = df.select(
        "y", hash_linear_score("norm", w, bias=0.0).alias("s")
    ).collect()
    for r in scored:
        if r["s"] is not None and r["s"] != 0.0:
            assert (r["s"] > 0) == (r["y"] == 1), r


def test_main_content_extract_keeps_prose_drops_nav(spark):
    from parquet_editor_spark.functions.text import main_content_extract

    html = (
        "<html><header><a href='/'>Home</a> <a href='/a'>About</a>"
        " <a href='/c'>Contact</a></header>"
        "<p>This paragraph is long enough to be considered real prose"
        " content for sure.</p>"
        "<div>Another solid block of content text here, see the"
        " <a href='/m'>details page</a> for more.</div>"
        "<li><a href='/t/3'>tag3</a></li>"
        "<footer>copyright site</footer>"
        "<p>tiny</p>"
        "<nav><a href='/x'>One</a><a href='/y'>Two</a>"
        "<a href='/z'>Three</a><a href='/w'>Four</a>"
        "<a href='/v'>Five much longer link farm text here</a></nav>"
        "</html>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    (got,) = df.select(
        main_content_extract("html").alias("m")
    ).collect()
    assert got["m"] == (
        "This paragraph is long enough to be considered real prose"
        " content for sure.\n"
        "Another solid block of content text here, see the"
        " details page for more."
    )


def test_main_content_extract_null_and_plain(spark):
    from parquet_editor_spark.functions.text import main_content_extract

    df = spark.createDataFrame(
        [(None,), ("just plain text with no markup at all in sight",)],
        "html string",
    )
    rows = df.select(main_content_extract("html").alias("m")).collect()
    assert rows[0]["m"] is None
    assert rows[1]["m"] == (
        "just plain text with no markup at all in sight"
    )
