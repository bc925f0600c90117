"""Lexical retrieval over the document corpus: BM25 scoring + top-k.

A training-data pipeline needs lexical retrieval in several places —
decontamination lookups ("which corpus docs score high against this
benchmark query?"), targeted quality audits, and hybrid (lexical +
embedding) dedup candidate generation.  No reference counterpart (the
reference has no text surface, SURVEY.md §2.6); this is the
Elasticsearch-default Okapi BM25 formula expressed as three small
aggregations.

Scale shape (the part that matters at 100 TB):

* Document length comes from ``size(tokens(text))`` — a projection,
  never a second explode pass over the corpus.
* The token explode is filtered to the query's terms IN THE SAME STAGE
  (predicate on the exploded rows), so only rows matching one of the
  handful of query terms ever enter the (id, term) shuffle.  Corpus
  tokens that match nothing — almost all of them — die executor-local.
* Per-term document frequencies are at most ``len(terms)`` rows →
  broadcast back.  Corpus size / average doc length is a one-row
  global aggregate (single-partition exchange of partials — benign).
* Top-k is ``orderBy().limit(k)`` → TakeOrderedAndProject, a per-
  partition partial top-k before one k-row-per-partition gather.
* Exactly TWO corpus scans total: the tokenize+explode pass feeding
  (id, term) counts (persisted — dft reuses it rather than triggering
  a second explode), and one explode-free length scan for the global
  n/avgdl stats.  The explode — the expensive pass at corpus scale —
  runs once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parquet_editor_spark.functions.text import tokens


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 score for ``query_terms``.

    Returns ``(id, n_hit_terms, score)`` ordered by (rounded score
    desc, id) — the rounded score is the ORDER key on both this and
    the differential oracle so last-ulp double noise can't reorder
    ties across engines.  Documents matching no term are excluded
    (score would be 0)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})

    base = df.select(
        F.col(id_col).alias("id"),
        F.size(tokens(text_col)).alias("dl"),
        tokens(text_col).alias("__toks"),
    )
    # one-row global stats: corpus size and average doc length (exact:
    # integer sum / count, identical on any engine or parallelism)
    stats = base.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    # (id, term) term frequencies — filter to query terms BEFORE the
    # shuffle; non-matching tokens never leave their executor.
    # PERSISTED: tf feeds both the per-term document frequencies and the
    # scoring join — without it Spark re-scans and re-explodes the whole
    # corpus for dft (the dedup.py:282-295 lesson; tf is tiny,
    # ≤ n_matching_docs × |terms| rows).
    from pyspark import StorageLevel

    tf = (
        base.select("id", "dl", F.explode("__toks").alias("t"))
        .select("id", "dl", F.lower("t").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    dft = tf.groupBy("term").agg(F.count("*").alias("dft"))  # ≤ |terms| rows
    scored = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("id")
        .agg(
            F.count("*").alias("n_hit_terms"),
            F.round(F.sum("contrib"), round_to).alias("score"),
        )
    )
    # tf cache attached for dedup.release_caches(out) — see the
    # dedup module: eager checkpointing to auto-release bypasses AQE
    out = scored.orderBy(F.desc("score"), F.asc("id")).limit(k)
    out._pes_caches = [tf]
    return out


def hybrid_rrf_topk(
    docs: DataFrame,
    embs: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 20,
    rrf_k: int = 60,
    pool: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Hybrid retrieval by reciprocal rank fusion: fuse the BM25
    lexical top-``pool`` with the dense cosine top-``pool`` for one
    query, scoring each doc ``Σ_lists 1/(rrf_k + rank)`` — the
    standard score-free fusion (Cormack et al. 2009) that needs no
    cross-encoder and no score calibration between the two lists.

    Determinism: both input rankings already break rounded-score ties
    by id (bm25_topk / sim.topk_cosine contracts), the fused score is
    exact integer-ratio arithmetic in a fixed addition order, and the
    final order is (rounded rrf desc, id asc).

    Scale shape: each branch keeps its own candidate-bounded plan
    (BM25's pre-shuffle term filter; the dense side's per-batch BLAS
    partial top-k), and fusion itself joins two ≤``pool``-row
    relations — broadcastable trivia regardless of corpus size."""
    from pyspark.sql import Window as W

    raw_lex = bm25_topk(
        docs, query_terms, id_col=id_col, text_col=text_col, k=pool
    )
    lex = raw_lex.select(
        "id",
        F.row_number()
        .over(W.orderBy(F.desc("score"), F.asc("id")))
        .alias("lex_rank"),
    )
    from parquet_editor_spark.operators.sim import topk_cosine

    dense = topk_cosine(
        embs,
        embs.filter(F.col(vec_id_col) == query_vec_id),
        id_col=vec_id_col,
        vec_col=vec_col,
        k=pool,
    ).select(F.col("neighbor_id").alias("id"), F.col("rank").alias("dense_rank"))
    fused = lex.join(dense, "id", "full_outer")
    rrf = F.coalesce(
        1.0 / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("dense_rank")), F.lit(0.0))
    out = (
        fused.select(
            F.col("id").alias(id_col),
            "lex_rank",
            "dense_rank",
            F.round(rrf, round_to).alias("rrf"),
        )
        # the query DOCUMENT itself is excluded from results: the dense
        # branch already self-excludes (topk_cosine contract), so
        # keeping it in the lexical branch would systematically
        # under-rank it anyway — symmetric exclusion is the honest
        # retrieval contract (mirrored in the oracle)
        .filter(F.col(id_col) != F.lit(query_vec_id))
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
    )
    # carry bm25's working cache forward for dedup.release_caches —
    # .select() would otherwise drop the handle and leak the persist
    out._pes_caches = getattr(raw_lex, "_pes_caches", [])
    return out


def tfidf_vectors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 32,
    round_to: int = 6,
) -> DataFrame:
    """Dense tf-idf document vectors over a corpus-derived vocabulary —
    the classic vectorization step between lexical retrieval (BM25,
    here) and learned embeddings: feeds k-means, linear classifiers and
    near-dup cosine on interpretable features.

    Vocabulary = the ``vocab_size`` terms with the highest document
    frequency (ties broken by term, ascending) — deterministic, so the
    vector layout is reproducible across engines and runs; the vector
    length is ``min(vocab_size, |distinct terms|)`` (a corpus with a
    smaller vocabulary yields exactly that many dimensions, not
    trailing dead slots).  Value at vocab index i =
    ``round(tf * (ln((N+1)/(df+1)) + 1), round_to)`` (smoothed idf;
    tf with multiplicity); terms outside the vocabulary contribute
    nothing.

    Scale shape: one token explode feeds BOTH the df aggregate
    (shuffle bounded by distinct terms, map-side combined) and the
    per-(doc, term) tf aggregate; the vocabulary (tiny) broadcasts
    back; the dense vector is built with map_from_entries + transform
    — one (doc)-keyed agg, no per-row Python, no V-way crossJoin."""
    n_docs = df.count()  # scalar by design: N parameterizes idf
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("t")
    )
    tf = toks.groupBy("id", "t").agg(F.count("*").alias("tf"))
    vocab = (
        tf.groupBy("t")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), F.col("t").asc())
        .limit(vocab_size)
    )
    from pyspark.sql import Window as W

    indexed = vocab.withColumn(
        "idx",
        F.row_number().over(
            W.orderBy(F.col("df").desc(), F.col("t").asc())
        ) - 1,
    ).withColumn(
        "idf",
        F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0,
    )
    n_dims = indexed.count()  # tiny by construction (<= vocab_size)
    if n_dims == 0:
        return df.select(
            F.col(id_col),
            F.array().cast("array<double>").alias("tfidf"),
        )
    entries = (
        tf.join(F.broadcast(indexed), "t")
        .select(
            "id",
            F.struct(
                F.col("idx"),
                F.round(F.col("tf") * F.col("idf"), round_to).alias("v"),
            ).alias("e"),
        )
        .groupBy("id")
        .agg(F.map_from_entries(F.collect_list("e")).alias("m"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_dims - 1)),
        lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0.0)),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(entries, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(
                dense,
                F.array_repeat(F.lit(0.0), n_dims),
            ).alias("tfidf"),
        )
    )
