"""Text-analysis functions for the LLM-data-pipeline surface
(SURVEY.md §2.7, BASELINE.json north star): tokenization, shingling,
language-ID heuristic, quality scoring, token counting, document
fingerprinting.

Everything here is a Column expression over built-ins — at 100 TB the
whole pipeline stays inside whole-stage codegen; no Python touches the
data. The reference has no text surface at all (SURVEY.md §2.6), so
these are EXT operators designed for the ``documents`` table.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..litexpr import lit_doubles

# ---------------------------------------------------------------------------
# tokenization / shingling
# ---------------------------------------------------------------------------

def tokens(col: str | Column) -> Column:
    """Whitespace tokenization, empty-safe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda x: x != F.lit(""))


def token_count(col: str | Column, toks: Optional[Column] = None) -> Column:
    """Pass a pre-tokenized ``toks`` column when several text metrics
    run in one projection — re-tokenizing per metric is the measured
    hot spot at corpus scale."""
    return F.size(toks if toks is not None else tokens(col))


def char_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles — the unit of near-dup detection.

    Pure SQL expression: sequence + slice + concat_ws; guarded so a
    document shorter than ``n`` words yields an empty set (``sequence``
    would otherwise run DESCENDING for size < n and fabricate
    shingles)."""
    name = col if isinstance(col, str) else None
    toks = f"filter(split({name}, '\\\\s+'), x -> x != '')" if name else None
    if toks is None:
        raise ValueError("word_shingles requires a column name")
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {n})))) "
        f"ELSE array() END"
    )


def word_ngrams_all(toks: Column, n: int = 2) -> Column:
    """ALL word n-grams in order, duplicates kept — the unit of
    repetition measurement (``word_shingles`` distinct-ifies, which is
    right for dedup but destroys the repeat counts Gopher-style
    repetition signals need). Guarded like ``word_shingles`` so a
    document shorter than ``n`` tokens yields an empty array rather
    than a descending ``sequence`` fabricating grams."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# BPE-ish token estimate (north star: token counting)
# ---------------------------------------------------------------------------

def token_estimate(col: str | Column, toks: Optional[Column] = None) -> Column:
    """Sub-word token-count estimate without a tokenizer model: words
    plus an extra token per 6 chars of long words (BPE splits long
    words), matching the common chars/4 heuristic shape but exactly
    reproducible in ANSI SQL for the oracle."""
    c = F.col(col) if isinstance(col, str) else col
    return (token_count(c, toks) + F.floor(F.length(c) / 24)).cast("long")


# ---------------------------------------------------------------------------
# language ID (n-gram/markers heuristic)
# ---------------------------------------------------------------------------

#: marker words per language — a deterministic stopword heuristic.
#: Real corpora would use character n-gram profiles; the mechanism
#: (per-language hit counts → argmax with stable tiebreak) is the
#: operator under test and is reproduced verbatim in the SQL oracle.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "et", "est", "un"),
    "de": ("der", "die", "und", "ist", "ein"),
    "zh": ("的", "是", "了", "在", "和"),
}


def lang_hits(
    col: str | Column, markers: Sequence[str], toks: Optional[Column] = None
) -> Column:
    """Occurrences (with multiplicity) of marker words, as ONE
    ``regexp_count`` over the whitespace-padded text: zero-width
    ``\\s`` lookarounds bound the words without consuming separators,
    so adjacent markers all count. Value-identical to the previous
    ``filter(tokens)`` form but codegen'd — higher-order array
    functions run interpreted and measured ~1.7× slower at sf0.1.
    ``toks`` is accepted for API compatibility and unused."""
    import re

    c = F.col(col) if isinstance(col, str) else col
    alts = "|".join(re.escape(m) for m in markers)
    padded = F.concat(F.lit(" "), F.coalesce(c, F.lit("")), F.lit(" "))
    return F.regexp_count(padded, F.lit(f"(?<=\\s)({alts})(?=\\s)"))


def lang_id(col: str | Column, toks: Optional[Column] = None) -> Column:
    """Argmax over per-language marker hits; ties and zero hits resolve
    to the alphabetically-first candidate ('und' when nothing hits).

    Single-Column form — fine for ad-hoc use, but the nested when-chain
    re-evaluates hit expressions; prefer :func:`with_lang_id` in
    full-corpus projections (measured ~4× faster)."""
    hit_cols = {
        lang: lang_hits(col, m, toks) for lang, m in sorted(LANG_MARKERS.items())
    }
    best = F.lit("und")
    best_hits = F.lit(0)
    # forward-alphabetical iteration with strict >: on ties the
    # alphabetically-first language keeps the slot
    for lang in sorted(hit_cols):
        h = hit_cols[lang]
        take = h > best_hits
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_hits = F.when(take, h).otherwise(best_hits)
    return best


def with_lang_id(
    df,
    col: str,
    out: str = "lang_pred",
    toks: Optional[Column] = None,
    keep_matches: Optional[str] = None,
):
    """DataFrame-level language ID: per-language hit counts land in a
    real intermediate array column (each marker filter evaluated
    exactly once per row), then the argmax works on plain ints.
    Same semantics as :func:`lang_id`; the staged projection keeps
    Catalyst from inlining the expensive filters into every branch of
    the argmax when-chain.

    One regex pass, not one per language: a single ``regexp_extract_all``
    over the union alternation collects every marker occurrence, then
    per-language hits are ``size(filter(...))`` over that SMALL match
    array (markers only, a fraction of the tokens).  Value-identical to
    per-language ``regexp_count``: the ``(?=\\s)`` bound makes
    alternation order irrelevant (a prefix alternative fails the
    lookahead and backtracks), and a marker shared by two languages
    still counts for both at classification.  Measured 2.24 → 0.9 s on
    the 50 k-doc sf1 corpus.

    ``keep_matches``: name under which to KEEP the raw marker-match
    array — downstream metrics (``stopword_ratio``'s en-hit numerator)
    can then share this scan instead of paying their own regexp_count
    over the full text (r5 verdict item 8)."""
    import re

    langs = sorted(LANG_MARKERS)
    c = F.col(col) if isinstance(col, str) else col
    all_alts = "|".join(
        sorted({re.escape(m) for lang in langs for m in LANG_MARKERS[lang]})
    )
    padded = F.concat(F.lit(" "), F.coalesce(c, F.lit("")), F.lit(" "))
    matches = F.regexp_extract_all(
        padded, F.lit(f"(?<=\\s)({all_alts})(?=\\s)"), F.lit(1)
    )
    m_col = keep_matches or "__lang_m"
    staged0 = df.withColumn(m_col, matches)
    hits_arr = F.array(
        *[
            F.size(
                F.filter(
                    F.col(m_col),
                    lambda x: x.isin(*LANG_MARKERS[lang]),
                )
            )
            for lang in langs
        ]
    )
    staged = staged0.withColumn("__lang_hits", hits_arr)
    if not keep_matches:
        staged = staged.drop(m_col)
    lh = F.col("__lang_hits")
    maxv = F.array_max(lh)
    pred = F.lit("und")
    for i in range(len(langs) - 1, -1, -1):
        pred = F.when(F.element_at(lh, i + 1) == maxv, F.lit(langs[i])).otherwise(pred)
    pred = F.when(maxv > 0, pred).otherwise(F.lit("und"))
    return staged.withColumn(out, pred).drop("__lang_hits")


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

def punct_ratio(col: str | Column) -> Column:
    r"""Share of characters that are not letters/digits/whitespace —
    unicode-aware (\p{L}/\p{N}), so non-Latin scripts and newlines
    are NOT counted as punctuation (an ASCII-only class floored
    quality_score to 0 for every zh/es/accented document)."""
    c = F.col(col) if isinstance(col, str) else col
    # regexp_count of the complement class == length of the stripped
    # copy regexp_replace would build (every match is one char), minus
    # the allocation of that copy per document
    n_punct = F.regexp_count(c, F.lit(r"[^\p{L}\p{N}\s]"))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(
    col: str | Column,
    toks: Optional[Column] = None,
    matches: Optional[Column] = None,
) -> Column:
    """Share of tokens that are (English-ish) stopwords — a prose-ness
    signal; pure garbage and keyword lists score near 0.

    The numerator is the codegen'd ``lang_hits`` regexp_count rather
    than an interpreted array filter — value-identical (whitespace-
    bounded occurrences in the text ≡ exact-equal tokens of a
    whitespace tokenization; both integer counts).  With the
    punct_ratio regexp_count twin, the quality projection measured
    1.73 → 1.39 s on the 50 k-doc sf1 corpus.

    ``matches``: the marker-match array ``with_lang_id(...,
    keep_matches=...)`` already extracted — counting en markers inside
    it is value-identical to the regexp_count (same alternation, same
    whitespace bounds) and skips this function's own full-text regex
    scan entirely (r5 verdict item 8: 5 scans → 3 in the quality
    projection)."""
    t = toks if toks is not None else tokens(col)
    n = F.size(t)
    if matches is not None:
        en = LANG_MARKERS["en"]
        hits = F.size(F.filter(matches, lambda x: x.isin(*en)))
    else:
        hits = lang_hits(col, LANG_MARKERS["en"])
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def quality_score(
    col: str | Column,
    toks: Optional[Column] = None,
    matches: Optional[Column] = None,
) -> Column:
    """Composite [0,1] quality: length saturation × (1 − punctuation
    excess) with a stopword-presence floor. Deterministic, portable to
    ANSI SQL, monotone in the obvious directions.  ``matches`` forwards
    to :func:`stopword_ratio` to share with_lang_id's marker scan."""
    # coalesce: least() SKIPS nulls, so a NULL text would take the
    # full length credit (score 0.5) instead of scoring 0
    length_part = F.least(
        F.lit(1.0), F.coalesce(token_count(col, toks) / F.lit(50.0), F.lit(0.0))
    )
    punct_part = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 4)
    stop_part = F.least(
        F.lit(1.0), F.lit(0.5) + stopword_ratio(col, toks, matches) * 5
    )
    return F.round(length_part * punct_part * stop_part, 4)


def _hash_feats(c: Column) -> Column:
    """Whitespace unigrams + '_'-joined adjacent bigrams, in feature
    order — the shared featurizer of :func:`hash_linear_score` and
    :func:`train_hash_classifier`."""
    toks = F.filter(F.split(c, " "), lambda t: t != F.lit(""))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.element_at(toks, i),
                F.lit("_"),
                F.element_at(toks, i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _poly_bucket(t: Column, n_buckets: int) -> Column:
    """Portable polynomial hash of one feature string → bucket id."""
    from parquet_editor_spark.functions.hashing import (
        POLY_BASE,
        POLY_MOD,
    )

    h = F.aggregate(
        F.split(t, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * POLY_BASE + F.ascii(ch)) % POLY_MOD,
    )
    return (h % n_buckets).cast("int")


def hash_feature_buckets(
    col: str | Column, n_buckets: int
) -> Column:
    """Bucket-id array of a doc's hashed n-gram features, in feature
    order — the cached representation :func:`train_hash_classifier`
    iterates over (hashing runs once, not once per iteration)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        _hash_feats(c), lambda t: _poly_bucket(t, n_buckets)
    )


def hash_linear_score(
    col: str | Column,
    weights: Sequence[float],
    bias: float = 0.0,
    round_to: int = 6,
) -> Column:
    """fastText-style hashed linear text scorer (r10): features are
    the whitespace unigrams plus '_'-joined adjacent bigrams, each
    hashed into ``len(weights)`` buckets with the portable polynomial
    string hash, and the score is the MEAN bucket weight plus bias —
    the linear margin of a bag-of-ngrams classifier (the standard
    pretraining quality-filter architecture; the sigmoid is monotone,
    so thresholding the margin IS thresholding the probability and
    the margin stays engine-portable where ``exp`` is not).

    ``weights`` is the trained (r10: pinned; r11:
    :func:`train_hash_classifier` output) weight table, shipped as a
    literal array — broadcast once per executor inside the plan.
    Pure codegen: split + transform + one sequential fold, no Python,
    no shuffle; the fold order is the feature order, so float
    summation is bit-reproducible in any engine.  Empty docs score
    ``round(bias, round_to)``."""
    c = F.col(col) if isinstance(col, str) else col
    n_b = len(weights)
    if n_b < 1:
        raise ValueError("weights must be non-empty")
    feats = _hash_feats(c)
    # one F.expr parse, not one Py4J lit per weight (r16, see litexpr)
    w_arr = lit_doubles(float(w) for w in weights)

    def bucket(t):
        return _poly_bucket(t, n_b)

    total = F.aggregate(
        feats,
        F.lit(0.0),
        lambda acc, t: acc + F.element_at(w_arr, bucket(t) + 1),
    )
    margin = F.when(
        F.size(feats) > 0,
        F.lit(float(bias)) + total / F.size(feats),
    ).otherwise(F.lit(float(bias)))
    return F.round(margin, round_to)


def _hash_feats_sql(norm_expr: str) -> str:
    """DuckDB mirror of :func:`_hash_feats`."""
    toks = (
        f"list_filter(string_split({norm_expr}, ' '), t -> t <> '')"
    )
    return f"""list_concat({toks},
        CASE WHEN len({toks}) >= 2 THEN
            list_transform(range(1, len({toks})::BIGINT),
                i -> {toks}[i::INT] || '_' || {toks}[i::INT + 1])
        ELSE [] END)"""


def _poly_bucket_sql(var: str, n_buckets: int) -> str:
    """DuckDB mirror of :func:`_poly_bucket` over variable ``var``."""
    from parquet_editor_spark.functions.hashing import (
        POLY_BASE,
        POLY_MOD,
    )

    return (
        f"(list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({var}, ''), "
        f"ch -> ascii(ch)::BIGINT)), "
        f"(h, c) -> (h * {POLY_BASE} + c) % {POLY_MOD}) % {n_buckets})"
    )


def hash_linear_score_sql(
    norm_expr: str, n_buckets: int, weight_sql: str, bias: float = 0.0
) -> str:
    """DuckDB mirror of :func:`hash_linear_score` — same features,
    same fold order, same constants; ``weight_sql`` maps the bucket
    placeholder ``__B__`` to its weight (one formula, two engines)."""
    feats = _hash_feats_sql(norm_expr)
    bucket = _poly_bucket_sql("t", n_buckets)
    if "__B__" not in weight_sql:
        raise ValueError("weight_sql must reference __B__")
    w_of_t = weight_sql.replace("__B__", f"({bucket})")
    return f"""(CASE WHEN len({feats}) > 0 THEN
        {bias} + list_reduce(list_prepend(0.0::DOUBLE,
            list_transform({feats}, t -> {w_of_t})),
            (acc, x) -> acc + x) / len({feats})
        ELSE {bias} END)"""


def _feat_boundary(df: DataFrame) -> DataFrame:
    """Eager stage boundary for the trainer's featurized frame (r16,
    the sim.py `_train_boundary` convention): ``localCheckpoint``
    instead of ``persist`` so each gradient iteration's collect
    analyzes a truncated RDD leaf instead of re-walking the
    higher-order featurization projection.  Same rows; values
    unchanged.  Routed through
    ``parquet_editor_spark.boundary.stage_boundary`` (r17): reliable
    production checkpoints via SPARK_GRAFT_CHECKPOINT_DIR."""
    from parquet_editor_spark.boundary import stage_boundary

    return stage_boundary(df)


def train_hash_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    n_buckets: int = 256,
    iters: int = 3,
    lr: float = 0.5,
) -> list[float]:
    """TRAIN the hashed linear quality classifier (r11 — the r10
    verdict's #5: ``hash_linear_score`` consumed pinned weights; this
    is the missing training step).  Fixed-iteration full-batch
    gradient descent on a quasi-logistic loss whose every operation
    is IEEE-exact, so the learned weights are BIT-IDENTICAL across
    engines and the whole trainer is differential-testable
    (:func:`train_hash_classifier_ctes` is the unrolled mirror):

      - link: the Elliott fast sigmoid ``p = 0.5 + 0.5·(m/(1+|m|))``
        — only +,·,/,abs, all correctly-rounded IEEE ops, where
        ``exp`` would differ between libm implementations;
      - margin: the :func:`hash_linear_score` mean-bucket fold (same
        expression tree, bias 0), summed in feature order;
      - the per-doc error is QUANTIZED to the 2⁻²⁰ integer grid —
        ``q = floor(((p − y)/n)·2²⁰)`` — so per-bucket gradients are
        exact INTEGER sums: order-free, partitioning-free,
        engine-free;
      - update: ``w_b ← w_b − lr·(g_b/(2²⁰·n_docs))`` on the driver
        (Python doubles ARE IEEE doubles — the same pinned tree the
        mirror evaluates).

    Returns the final weight list, sized for
    :func:`hash_linear_score`.

    Scale shape: featurization runs ONCE into a persisted bucket-id
    array (pure codegen); each iteration is one explode + integer
    hash agg collecting ≤ ``n_buckets`` rows (bounded metadata, the
    kmeans-loop contract) — gradient traffic is model-sized, never
    corpus-sized, at any corpus size."""
    if n_buckets < 1 or iters < 1:
        raise ValueError("n_buckets and iters must be >= 1")
    feat = _feat_boundary(
        df.select(
            F.col(label_col).cast("int").alias("y"),
            hash_feature_buckets(text_col, n_buckets).alias("b"),
        )
        .filter(F.size("b") > 0)
    )
    try:
        n_docs = feat.count()
        if n_docs == 0:
            raise ValueError("no documents with features to train on")
        w = [0.0] * n_buckets
        for _ in range(iters):
            w_arr = lit_doubles(w)
            total = F.aggregate(
                F.col("b"),
                F.lit(0.0),
                lambda acc, i: acc + F.element_at(w_arr, i + 1),
            )
            m = F.lit(0.0) + total / F.size("b")
            p = F.lit(0.5) + F.lit(0.5) * (m / (F.lit(1.0) + F.abs(m)))
            q = F.floor(
                ((p - F.col("y").cast("double")) / F.size("b"))
                * F.lit(1048576.0)
            ).cast("long")
            grad = (
                feat.select(q.alias("q"), F.explode("b").alias("bk"))
                .groupBy("bk")
                .agg(F.sum("q").alias("g"))
                .collect()
            )
            for r in grad:
                w[r["bk"]] -= lr * (float(r["g"]) / (1048576.0 * n_docs))
    finally:
        feat.unpersist()
    return w


def train_hash_classifier_ctes(
    doc_sql: str,
    n_buckets: int = 256,
    iters: int = 3,
    lr: float = 0.5,
) -> tuple[str, str]:
    """DuckDB mirror of :func:`train_hash_classifier`, unrolled —
    generated from the SAME iteration (one spec, two engines).
    ``doc_sql`` must select ``y`` (0/1) and ``norm`` (the feature
    text).  Returns ``(ctes, final_w_cte)``: append the CTE chain to
    a WITH clause, then read the trained weight LIST from the one-row
    CTE ``final_w_cte`` (column ``w``, 1-indexed)."""
    feats = _hash_feats_sql("norm")
    bucket = _poly_bucket_sql("t", n_buckets)
    parts = [
        f"""thc_d AS MATERIALIZED (
            SELECT y,
                   list_transform({feats}, t -> {bucket}) AS b
            FROM ({doc_sql}) src
            WHERE len({feats}) > 0)""",
        "thc_n AS (SELECT COUNT(*)::BIGINT AS nd FROM thc_d)",
        f"""thc_w0 AS (SELECT list_transform(range({n_buckets}),
            x -> 0.0::DOUBLE) AS w)""",
    ]
    for t in range(iters):
        parts.append(
            f"""thc_q{t} AS (
            SELECT floor(((0.5 + 0.5 * (m / (1.0 + abs(m)))
                           - y::DOUBLE) / n) * 1048576.0)::BIGINT AS q,
                   b
            FROM (
                SELECT y, b, len(b) AS n,
                       0.0 + list_reduce(list_prepend(0.0::DOUBLE,
                           list_transform(b, i -> w.w[i + 1])),
                           (acc, x) -> acc + x) / len(b) AS m
                FROM thc_d, thc_w{t} w) s)"""
        )
        parts.append(
            f"""thc_g{t} AS (
            SELECT bk, SUM(q)::BIGINT AS g
            FROM (SELECT q, unnest(b) AS bk FROM thc_q{t}) x
            GROUP BY bk)"""
        )
        parts.append(
            f"""thc_gl{t} AS (
            SELECT list(COALESCE(g.g, 0) ORDER BY r.b) AS gl
            FROM range({n_buckets}) r(b)
            LEFT JOIN thc_g{t} g ON g.bk = r.b)"""
        )
        parts.append(
            f"""thc_w{t + 1} AS MATERIALIZED (
            SELECT list_transform(range({n_buckets}),
                i -> w.w[i::INT + 1] - {lr!r} * (gl.gl[i::INT + 1]::DOUBLE
                     / (1048576.0 * n.nd))) AS w
            FROM thc_w{t} w, thc_gl{t} gl, thc_n n)"""
        )
    return ", ".join(parts), f"thc_w{iters}"


def mean_word_length(col: str | Column, toks: Optional[Column] = None) -> Column:
    """Mean characters per token — a Gopher-style quality signal
    (machine-generated text skews short or long). Single sequential
    aggregate pass; NULL on empty docs (``try_divide``)."""
    t = toks if toks is not None else tokens(col)
    total = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return F.try_divide(total.cast("double"), F.size(t))


def distinct_token_ratio(col: str | Column, toks: Optional[Column] = None) -> Column:
    """|distinct tokens| / |tokens| — the repetition signal: looping or
    boilerplate-heavy generations score low. NULL on empty docs."""
    t = toks if toks is not None else tokens(col)
    return F.try_divide(F.size(F.array_distinct(t)).cast("double"), F.size(t))


#: Gopher-style keep thresholds (Rae et al. 2021, "Scaling Language
#: Models" §A.1.1 shape — bounds tuned to the synthetic corpus so the
#: filter is non-degenerate in tests: corpus docs span 10–99 tokens
#: with ~0.5 distinct-token ratio).
GOPHER_MIN_TOKENS = 30
GOPHER_MAX_TOKENS = 100_000
GOPHER_MWL_RANGE = (3.0, 8.0)
GOPHER_MIN_DISTINCT_RATIO = 0.45


def gopher_keep(
    n_tokens: Column, mwl: Column, dtr: Column
) -> Column:
    """Boolean keep-flag combining the three repetition/shape signals.
    Pass staged metric columns (not re-derived expressions) so each is
    computed once per row."""
    lo, hi = GOPHER_MWL_RANGE
    return (
        (n_tokens >= GOPHER_MIN_TOKENS)
        & (n_tokens <= GOPHER_MAX_TOKENS)
        & (mwl >= lo)
        & (mwl <= hi)
        & (dtr >= GOPHER_MIN_DISTINCT_RATIO)
    )


def unigram_logprob(df, id_col: str, text_col: str, round_to: int = 4):
    """Corpus-LM quality score (DataFrame-level: needs the corpus,
    not just a row): mean log p(word) under the corpus's own unigram
    distribution — the cheap stand-in for model-perplexity filtering.
    Rare-vocab/garbage docs score very negative; common-vocab prose
    scores high.

    Plan: one explode + count builds the vocabulary, the 1-row total
    broadcasts (nested-loop join against one row, not a cross join of
    data), and the vocab joins back to the exploded tokens — at corpus
    scale the vocab is orders of magnitude smaller than the corpus, so
    the only full-size shuffle is the final per-doc aggregation."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("w")
    )
    vocab = toks.groupBy("w").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").cast("double").alias("T"))
    return (
        toks.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("c") / F.col("T"))), round_to).alias(
                "avg_logprob"
            ),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: (pattern, replacement) applied in order. Patterns restrict
#: themselves to the regex subset with identical semantics in Java
#: regex (Spark) and RE2 (DuckDB oracle): character classes,
#: non-capturing groups, bounded repetition, ASCII \b. Email first so
#: its local part isn't half-eaten by the phone pattern; IP before
#: phone so dotted quads aren't read as phone fragments.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[-. ]?\d{3}[-. ]?\d{4}\b", "<PHONE>"),
)


def dsir_logratio(
    df,
    target,
    id_col: str,
    text_col: str,
    n_buckets: int = 256,
    round_to: int = 4,
    weight_round: int = 6,
):
    """DSIR-style importance weights (r15 — Xie et al. 2023, Data
    Selection via Importance Resampling: the selection method behind
    several production pretraining mixes): featurize every doc as
    hashed unigram+bigram buckets (the classifier tier's shared
    featurizer over the canonical normalization), estimate each
    bucket's add-1-smoothed probability under a curated TARGET sample
    and under the RAW corpus, and score each doc by the MEAN
    per-feature log probability ratio — high scores read "looks like
    the target distribution".  Selection is then a top-K by
    (rounded score, id), the resampling step.

    Engine-exact by the corpus-LM construction
    (:func:`trigram_backoff_logprob`'s proven class): counts are
    exact integers, each bucket weight ``ln((t+1)/(T+B)) −
    ln((r+1)/(R+B))`` rounds to ``weight_round`` before any
    aggregation, the per-doc mean rounds to ``round_to``.

    Returns ``(id, n_feats, logratio)`` — docs with zero features
    (empty normalized text) emit no row.

    Scale shape: two explode + bucket-count aggs whose results are ≤
    ``n_buckets`` rows each (the trained-weight-table metadata
    class), two 1-row totals broadcast, the weight table broadcast
    back onto the exploded features, one id-keyed agg — the
    :func:`unigram_logprob` plan with a bounded vocab.  Top-K
    selection downstream should be ``orderBy().limit(k)`` —
    Spark's TakeOrderedAndProject, per-partition heads merged, no
    global sort."""
    b_lit = float(n_buckets)

    # The featurized frames are consumed THREE times (bucket counts,
    # totals, the scoring join) for the corpus and twice for the
    # target; without a persist each reference re-runs the whole
    # normalize+hash text pass (r16: 3 corpus passes measured at
    # sf0.01 — 17 s cold for 500 docs).  Persist the per-doc BUCKET
    # ARRAY — the lightweight proxy (one int-array row per doc, far
    # smaller than the text, spillable at corpus scale) — and explode
    # from it per reference: one text pass total, and the exploded
    # row order (hence every float accumulation order downstream) is
    # unchanged, so results are bit-identical.
    from pyspark import StorageLevel

    def feats_arr(d):
        return d.select(
            F.col(id_col).alias("id"),
            hash_feature_buckets(
                normalize_text(F.coalesce(F.col(text_col), F.lit(""))),
                n_buckets,
            ).alias("__bs"),
        ).persist(StorageLevel.MEMORY_AND_DISK)

    raw_arr = feats_arr(df)
    tgt_arr = feats_arr(target)
    rawf = raw_arr.select("id", F.explode("__bs").alias("b"))
    tgtf = tgt_arr.select("id", F.explode("__bs").alias("b"))
    r_cnt = rawf.groupBy("b").agg(
        F.count("*").cast("long").alias("rc")
    )
    t_cnt = tgtf.groupBy("b").agg(
        F.count("*").cast("long").alias("tc")
    )
    totals = (
        rawf.agg(F.count("*").cast("double").alias("R"))
        .crossJoin(tgtf.agg(F.count("*").cast("double").alias("T")))
    )
    w = (
        r_cnt.join(t_cnt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + 1.0)
                    / (F.col("T") + b_lit)
                )
                - F.log((F.col("rc") + 1.0) / (F.col("R") + b_lit)),
                weight_round,
            ).alias("lw"),
        )
    )
    out = (
        rawf.join(F.broadcast(w), "b")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            # + 0.0 folds IEEE −0.0 (a tiny negative mean rounded
            # away) onto +0.0 — the engines reach zero from opposite
            # sides and the differential hashes the sign bit
            (F.round(F.avg("lw"), round_to) + F.lit(0.0)).alias(
                "logratio"
            ),
        )
    )
    # see dedup.jaccard_pairs: caches attached for release_caches(out)
    out._pes_caches = [raw_arr, tgt_arr]
    return out


def redact_pii(col: str | Column) -> Column:
    """Scrub emails / IPv4s / US-shaped phone numbers to typed tags —
    the standard pre-training privacy pass. Pure ``regexp_replace``
    chain (JVM, codegen); compare the result to the input for a
    had-PII flag (stage the redacted text first so the regex chain
    runs once)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in PII_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    return c


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------

def normalize_text(col: str | Column) -> Column:
    """Dedup pre-processing normalization: lowercase, strip
    non-alphanumeric (keeping spaces), squeeze whitespace, trim —
    the canonical form fingerprints and shingles should be computed
    over so near-dups differing only in case/punctuation collapse.
    Portable regex (same semantics in Java regex and RE2/DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    stripped = F.regexp_replace(lowered, r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def fingerprint(col: str | Column, toks: Optional[Column] = None) -> Column:
    """Canonical-text content fingerprint: md5 over the
    whitespace-normalized, lowercased text. md5 is bit-identical across
    engines (Spark, DuckDB, Python hashlib), which makes exact-dup
    grouping oracle-checkable; at 128 bits collisions are negligible
    at any corpus size.

    The canonical form is the token join ``concat_ws(' ',
    tokens(x))`` — equivalent to Python's ``' '.join(x.split())`` for
    every input, including leading/trailing tabs/newlines (the earlier
    ``regexp_replace(trim(x), '\\s+', ' ')`` form used SQL's
    space-only ``trim`` and kept a stray edge space around non-space
    whitespace).  Passing a pre-tokenized ``toks`` array shares the
    quality projection's one tokens scan instead of paying a second
    full-text regex pass (r5 verdict item 8).  NULL text stays NULL on
    both paths (concat_ws alone would fold NULL to '')."""
    c = F.col(col) if isinstance(col, str) else col
    t = toks if toks is not None else tokens(col)
    return F.when(
        c.isNull(), F.lit(None).cast("string")
    ).otherwise(F.md5(F.lower(F.concat_ws(" ", t))))


def rolling_hash(col: str | Column, base: int = 31, mod: int = 1_000_000_007) -> Column:
    """Order-sensitive polynomial rolling hash over words (document
    fingerprint variant where word ORDER matters but the alphabet is
    open): h = Σ len(word_i)·base^i mod m, via a single aggregate
    expression — no UDF."""
    name = col if isinstance(col, str) else None
    if name is None:
        raise ValueError("rolling_hash requires a column name")
    toks = f"filter(split({name}, '\\\\s+'), x -> x != '')"
    # word value = first 8 md5 hex chars (the repo's portable hash) —
    # hashing only length(w) was content-blind: any equal-shaped
    # documents (or equal-length word swaps) collided
    wv = "CAST(conv(substr(md5(w), 1, 8), 16, 10) AS BIGINT)"
    return F.expr(
        f"aggregate({toks}, "
        f"named_struct('h', CAST(0 AS BIGINT), 'p', CAST(1 AS BIGINT)), "
        f"(acc, w) -> named_struct("
        f"'h', (acc.h + {wv} * acc.p) % {mod}, "
        f"'p', (acc.p * {base}) % {mod}), "
        f"acc -> acc.h)"
    )


def bigram_logprob(
    df, id_col: str, text_col: str, alpha: float = 0.5, round_to: int = 4
):
    """Bigram-LM quality score: mean log P(wᵢ | wᵢ₋₁) per document
    under the corpus's own add-α-smoothed bigram model — one modeling
    step up from ``unigram_logprob`` (driver-green r2): it penalizes
    improbable word ORDER, not just rare vocabulary, so shuffled or
    template-stitched text scores low even when every word is common.

    P(cur|prev) = (c₂(prev,cur) + α) / (c₁(prev) + α·V) from exact
    integer corpus counts (V = unigram vocabulary size), evaluated in
    one fixed expression — same cross-engine stability class as
    unigram_logprob (the per-doc avg is the one engine-ordered
    reduction, rounded at ``round_to``).

    Plan: one bigram explode feeds BOTH the model counts and the
    scoring join (the relation is reused, not re-derived from text);
    bigram counts join on the pair key (bigram-vocab-sized, far below
    corpus scale), unigram counts and the 1-row V broadcast.  Docs
    with <2 tokens have no bigrams and drop out."""
    toks = tokens(text_col)
    staged = df.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    # guard like word_ngrams_all: sequence(1, 0) would DESCEND and
    # fabricate out-of-range indices on docs shorter than 2 tokens
    pairs = F.when(
        F.size("__toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__toks") - 1),
            lambda i: F.struct(
                F.element_at("__toks", i).alias("prev"),
                F.element_at("__toks", i + 1).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    big = staged.select("id", F.explode(pairs).alias("bg")).select(
        "id", "bg.prev", "bg.cur"
    )
    c2 = big.groupBy("prev", "cur").agg(F.count("*").alias("c2"))
    uni = df.select(F.explode(tokens(text_col)).alias("w"))
    c1 = uni.groupBy("w").agg(F.count("*").alias("c1"))
    vocab = c1.agg(F.count("*").cast("double").alias("V"))
    p = (F.col("c2") + F.lit(alpha)) / (
        F.col("c1") + F.lit(alpha) * F.col("V")
    )
    return (
        big.join(c2, ["prev", "cur"])
        .join(c1.withColumnRenamed("w", "prev"), "prev")
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg(F.log(p)), round_to).alias("avg_logprob"),
        )
    )


def trigram_backoff_logprob(
    score_df,
    train_df,
    id_col: str,
    text_col: str,
    backoff: float = 0.4,
    alpha: float = 0.5,
    round_to: int = 4,
):
    """Held-out trigram LM quality score with stupid backoff (r10 —
    the CCNet architecture: score a corpus under a REFERENCE language
    model trained on different text, the perplexity filter real
    pretraining pipelines run).  Per doc: mean log S(w₃|w₁w₂) where

        S(w₃|w₁w₂) = c₃/c₂(w₁w₂)              if the trigram was seen
                   = λ·c₂(w₂w₃)/c₁(w₂)         else if the bigram was
                   = λ²·(c₁(w₃)+α)/(N+α·V)     else (add-α unigram —
                                               unseen words can't zero)

    with λ = ``backoff`` (Brants et al. 2007's 0.4).  Training on
    ``train_df`` and scoring ``score_df`` makes every backoff level
    fire — a self-trained model never backs off because each scored
    n-gram counted itself.

    All counts are exact integers, S is one fixed expression, and the
    per-doc mean is the single engine-ordered float reduction,
    rounded at ``round_to`` — the ``bigram_logprob`` cross-engine
    stability class.

    Plan: the scored trigram relation feeds five LEFT joins against
    the model tables (c₃ / context-c₂ / c₂ / context-c₁ / c₁ — all
    n-gram-vocabulary-sized, far below corpus scale, broadcast or
    shuffled by size) plus the 1-row (N, V) broadcast; docs with <3
    tokens drop out."""

    def grams(df, n):
        toks = tokens(text_col)
        staged = df.select(
            F.col(id_col).alias("id"), toks.alias("__toks")
        )
        fields = [
            (f"w{j + 1}", j) for j in range(n)
        ]
        arr = F.when(
            F.size("__toks") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("__toks") - (n - 1)),
                lambda i: F.struct(
                    *[
                        F.element_at("__toks", i + off).alias(name)
                        for name, off in fields
                    ]
                ),
            ),
        ).otherwise(
            F.array().cast(
                "array<struct<"
                + ",".join(f"{name}:string" for name, _ in fields)
                + ">>"
            )
        )
        out = staged.select("id", F.explode(arr).alias("g"))
        return out.select("id", *[f"g.{name}" for name, _ in fields])

    c3 = (
        grams(train_df, 3)
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("c3"))
    )
    c2 = (
        grams(train_df, 2)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    c1 = grams(train_df, 1).groupBy("w1").agg(F.count("*").alias("c1"))
    nv = c1.agg(
        F.sum("c1").cast("double").alias("N"),
        F.count("*").cast("double").alias("V"),
    )

    tri = grams(score_df, 3)
    j = (
        tri.join(c3, ["w1", "w2", "w3"], "left")
        .join(
            c2.select(
                F.col("w1"), F.col("w2"), F.col("c2").alias("c2ctx")
            ),
            ["w1", "w2"],
            "left",
        )
        .join(
            c2.select(
                F.col("w1").alias("w2"),
                F.col("w2").alias("w3"),
                F.col("c2").alias("c2hit"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            c1.select(
                F.col("w1").alias("w2"), F.col("c1").alias("c1ctx")
            ),
            ["w2"],
            "left",
        )
        .join(
            c1.select(
                F.col("w1").alias("w3"), F.col("c1").alias("c1hit")
            ),
            ["w3"],
            "left",
        )
        .crossJoin(F.broadcast(nv))
    )
    lam = F.lit(float(backoff))
    s = (
        F.when(
            F.col("c3").isNotNull(),
            F.col("c3") / F.col("c2ctx"),
        )
        .when(
            F.col("c2hit").isNotNull(),
            lam * F.col("c2hit") / F.col("c1ctx"),
        )
        .otherwise(
            lam
            * lam
            * (F.coalesce(F.col("c1hit"), F.lit(0)) + F.lit(alpha))
            / (F.col("N") + F.lit(alpha) * F.col("V"))
        )
    )
    return j.groupBy("id").agg(
        F.count("*").cast("long").alias("n_trigrams"),
        F.round(F.avg(F.log(s)), round_to).alias("avg_logprob"),
    )


# ---------------------------------------------------------------------------
# crawl-text markup removal + script profiling (EXT, new r6)
# ---------------------------------------------------------------------------

def strip_markup(col: str | Column) -> Column:
    """HTML/XML markup removal for crawl-sourced text — the step every
    web-corpus pipeline runs before quality scoring and dedup (the
    reference has no text surface; EXT like the rest of §2.7).

    - ``<script>``/``<style>`` blocks go wholesale (content included),
      one non-greedy ``(?s)`` pass per tag — no backreference, so the
      exact same pattern runs on Java regex and RE2 (DuckDB oracle).
    - remaining tags become a space (``<[^>]*>`` — forgiving of
      attributes and unclosed fragments).
    - the six common named entities unescape, ``&amp;`` LAST so
      double-escaped ``&amp;lt;`` lands on literal ``&lt;`` text, not
      on ``<``.
    - whitespace collapses to single spaces, edges trimmed (post-
      collapse edges are plain spaces, where SQL ``trim`` is
      engine-portable).

    Scale shape: a pure column expression — whole-stage codegen, no
    shuffle, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    x = F.regexp_replace(c, r"(?s)<script[^>]*>.*?</script>", " ")
    x = F.regexp_replace(x, r"(?s)<style[^>]*>.*?</style>", " ")
    x = F.regexp_replace(x, r"<[^>]*>", " ")
    for ent, ch in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&"),
    ):
        x = F.replace(x, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(x, r"\s+", " "))


#: script classes profiled by :func:`script_counts` — (name, Java regex,
#: and the RE2 spelling differs only by the Is prefix, kept in
#: ``__spark_entry__``'s oracle)
_SCRIPT_CLASSES = (
    ("latin", r"\p{IsLatin}"),
    ("cyrillic", r"\p{IsCyrillic}"),
    ("han", r"\p{IsHan}"),
    ("arabic", r"\p{IsArabic}"),
)


def script_counts(col: str | Column) -> dict[str, Column]:
    """Per-character Unicode-script histogram — the language signal
    that works when marker words don't (short strings, non-Latin
    scripts the marker list misses).  Returns named count columns plus
    ``script_pred``, an argmax label with the explicit precedence
    latin > cyrillic > han > arabic on ties and ``und`` for empty/NULL
    text.  Counts are ``regexp_count`` of single-char script classes —
    verified value-identical between Java regex (``\\p{IsLatin}``) and
    RE2 (``\\p{Latin}``), which keeps the operator oracle-checkable.

    Scale shape: N single-pass regex projections fused by codegen into
    one scan of the text column; no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    counts = {
        f"n_{name}": F.regexp_count(c, F.lit(pat))
        for name, pat in _SCRIPT_CLASSES
    }
    counts["n_digit"] = F.regexp_count(c, F.lit(r"\p{Nd}"))
    counts["n_chars"] = F.length(c)
    l, cy, h, a = (
        counts["n_latin"], counts["n_cyrillic"],
        counts["n_han"], counts["n_arabic"],
    )
    pred = (
        F.when(F.coalesce(F.greatest(l, cy, h, a), F.lit(0)) == 0, "und")
        .when((l >= cy) & (l >= h) & (l >= a), "latin")
        .when((cy >= h) & (cy >= a), "cyrillic")
        .when(h >= a, "han")
        .otherwise("arabic")
    )
    counts["script_pred"] = pred
    return counts


# Block-level tag boundaries for main-content extraction — the tags
# that terminate a text block in the jusText/trafilatura heuristic.
_BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|td|tr|table|section|article|"
    r"nav|header|footer|br|blockquote)[^>]*>"
)


def main_content_extract(
    col: str | Column,
    min_chars: int = 25,
    max_link_density: float = 0.4,
) -> Column:
    """Main-content extraction from raw HTML (r12 — the jusText /
    trafilatura-lite heuristic every serious web-corpus pipeline runs
    INSTEAD of whole-page :func:`strip_markup`): split the page into
    blocks at block-level tag boundaries, score each block's stripped
    text length and LINK DENSITY (share of its text living inside
    ``<a>`` elements — navigation, tag clouds and footers are link-
    dense, prose is not), keep blocks with ≥ ``min_chars`` of text and
    link density ≤ ``max_link_density``, and rejoin survivors in
    document order with newlines.

    Pure Catalyst: one split + per-block expression work inside
    ``transform`` — whole-stage codegen, zero Python, zero shuffle;
    the hot crawl map at 100 TB, same cost class as strip_markup."""
    c = F.col(col) if isinstance(col, str) else col
    blocks = F.split(c, _BLOCK_TAG_RE)

    def one(b: Column) -> Column:
        txt = strip_markup(b)
        link_raw = F.array_join(
            F.regexp_extract_all(
                b, F.lit(r"(?is)<a\b[^>]*>(.*?)</a>"), 1
            ),
            " ",
        )
        ltxt = strip_markup(link_raw)
        keep = (F.length(txt) >= min_chars) & (
            F.length(ltxt).cast("double")
            <= F.lit(float(max_link_density)) * F.length(txt)
        )
        return F.when(keep, txt)

    kept = F.filter(
        F.transform(blocks, one), lambda t: t.isNotNull()
    )
    return F.array_join(kept, "\n")
