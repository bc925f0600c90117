"""Behavioral pins for the r13 query-level operators beyond the
DuckDB differential: properties a green hash-match could in principle
satisfy vacuously (empty cut sets, never-applied transforms,
position-dependent chunking) are asserted against brute-force Python
references here."""

import hashlib
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as M

    return M


def test_cdc_chunking_is_position_independent(spark):
    """THE content-defined property: a shared passage chunks
    identically no matter what precedes it — so two docs whose only
    relation is a common tail still dedup its interior chunks, which
    fixed-size chunking provably cannot do (any prefix-length delta
    shifts every downstream boundary)."""
    from pyspark.sql import Window as W

    from parquet_editor_spark.functions import text as X

    B, M_, D = 31, 1_000_000_007, 8
    shared = "alpha beta gamma delta eps zeta eta theta " * 6
    docs = spark.createDataFrame(
        [
            (1, "unique lead in words " + shared),
            (2, "a completely different and much longer prefix "
                "with many extra tokens before the tail " + shared),
        ],
        "doc_id long, t string",
    )
    words = docs.select(
        "doc_id", F.posexplode(X.tokens("t")).alias("pos", "w")
    ).withColumn(
        "wv",
        F.expr("CAST(conv(substr(md5(w), 1, 8), 16, 10) AS BIGINT)"),
    )
    dw = W.partitionBy("doc_id").orderBy("pos")
    h = (
        F.lag("wv", 2).over(dw) * (B * B)
        + F.lag("wv", 1).over(dw) * B
        + F.col("wv")
    ) % M_
    chunks = (
        words.withColumn(
            "bflag",
            F.when((F.col("pos") >= 2) & (h % D == 0), 1).otherwise(0),
        )
        .withColumn(
            "cid",
            F.coalesce(
                F.sum("bflag").over(
                    dw.rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .groupBy("doc_id", "cid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("text")
        )
    )
    by_doc = {
        r["doc_id"]: r["texts"]
        for r in chunks.groupBy("doc_id")
        .agg(F.collect_list("text").alias("texts"))
        .collect()
    }
    common = set(by_doc[1]) & set(by_doc[2])
    # the shared tail must produce several identical chunks despite
    # the different (and different-LENGTH) prefixes
    assert len(common) >= 2, (sorted(by_doc[1]), sorted(by_doc[2]))


def test_fim_transform_matches_python_reference(spark, entry, sf_dir):
    """PSM reordering against a literal Python re-implementation over
    the same pinned-BPE ids: sentinels in the right slots, middle
    truly moved to the end, AR docs byte-identical."""
    from parquet_editor_spark.operators import textprep as TP

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", entry._bpe_norm("text").alias("norm")
    )
    toks = {
        r["id"]: list(r["input_ids"])
        for r in TP.bpe_tokenize(
            docs, "doc_id", "norm", entry._BPE_MERGES, entry._BPE_VOCAB
        ).collect()
    }
    got = {
        r["doc_id"]: (r["fim"], r["n_ids"], r["ids_md5"])
        for r in entry.q_fim_transform_docs(spark, sf_dir).collect()
    }
    applied = 0
    for doc_id, ids in toks.items():
        n = len(ids)
        if doc_id % 2 == 0 and n >= 3:
            p1, p2 = n // 3, (2 * n) // 3
            out = (
                [9001] + ids[:p1] + [9002] + ids[p2:] + [9003]
                + ids[p1:p2]
            )
            want_fim = 1
            applied += 1
        else:
            out, want_fim = ids, 0
        csv = ",".join(str(x) for x in out)
        md5 = hashlib.md5(csv.encode()).hexdigest()
        assert got[doc_id] == (want_fim, len(out), md5), doc_id
    assert applied > 0  # the transform really fires on the fixture


def test_mixture_alpha_quota_properties(spark, entry, sf_dir):
    """Audit-row invariants: quotas sum to <= budget, n_kept =
    min(quota, n_docs) per language, and the kept selection is the
    md5-order prefix (re-derived in Python)."""
    import math

    rows = {
        r["lang"]: r
        for r in entry.q_mixture_alpha_sample(spark, sf_dir).collect()
    }
    tw = sum(math.isqrt(r["n_docs"]) for r in rows.values())
    assert sum(r["quota"] for r in rows.values()) <= 200
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    )
    by_lang = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    for lang, r in rows.items():
        w = math.isqrt(r["n_docs"])
        assert r["w"] == w
        assert r["quota"] == 200 * w // tw
        assert r["n_kept"] == min(r["quota"], r["n_docs"])
        order = sorted(
            by_lang[lang],
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )
        kept = sorted(order[: r["quota"]])
        assert r["kept_sum"] == sum(kept)
        csv = ",".join(str(x) for x in kept)
        assert r["kept_md5"] == hashlib.md5(csv.encode()).hexdigest()


def test_substring_decontaminate_benchmark_never_cut_by_train(
    spark, entry, sf_dir
):
    """Split semantics: train docs lose their planted run (shared
    with the benchmark split), and no benchmark doc's text is ever
    cut because of a TRAIN doc — benchmark cuts can only come from
    lower-id benchmark docs (intra-benchmark redundancy)."""
    out = {
        r["doc_id"]: r
        for r in entry.q_substring_decontaminate_docs(
            spark, sf_dir
        ).collect()
    }
    train_cut = [
        r for r in out.values() if r["split"] == "train" and r["cut_chars"] > 0
    ]
    assert len(train_cut) > 0
    # every residue class mod 7 has a benchmark member well below any
    # train doc, so the FIRST benchmark doc of each residue keeps its
    # run intact; verify the minimum benchmark doc overall is uncut
    bench_ids = sorted(k for k, r in out.items() if r["split"] == "benchmark")
    first = out[bench_ids[0]]
    assert first["cut_chars"] == 0


def test_ngram_novelty_first_doc_is_fully_novel(spark, entry, sf_dir):
    """The lowest doc_id with any trigram introduces all of them;
    novelty is within [0, 1] everywhere and NULL exactly on gramless
    docs."""
    rows = entry.q_ngram_novelty_docs(spark, sf_dir).collect()
    with_grams = [r for r in rows if r["n_grams"] > 0]
    first = min(with_grams, key=lambda r: r["doc_id"])
    assert first["n_novel"] == first["n_grams"]
    for r in rows:
        if r["n_grams"] == 0:
            assert r["novelty"] is None
        else:
            assert 0.0 <= r["novelty"] <= 1.0
            assert r["n_novel"] <= r["n_grams"]


def test_roc_auc_agrees_with_sklearn_free_reference(spark, entry, sf_dir):
    """AUC against a brute-force pair-count over the same rounded
    margins (no sklearn in the container — the O(n²) loop IS the
    definition)."""
    from parquet_editor_spark.functions import text as X

    labeled = entry._thc_labeled_docs(spark, sf_dir)
    w = X.train_hash_classifier(
        labeled, "sig", "y",
        n_buckets=entry._THC_BUCKETS,
        iters=entry._THC_ITERS,
        lr=entry._THC_LR,
    )
    scored = labeled.select(
        "y",
        F.round(X.hash_linear_score("sig", w, bias=0.0), 6).alias("m"),
    ).collect()
    pos = [r["m"] for r in scored if r["y"] == 1]
    neg = [r["m"] for r in scored if r["y"] == 0]
    num2 = 0
    for p in pos:
        for q in neg:
            if p > q:
                num2 += 2
            elif p == q:
                num2 += 1
    got = entry.q_classifier_roc_auc_docs(spark, sf_dir).collect()[0]
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert got["auc_num2"] == num2
    assert abs(got["auc"] - num2 / (2 * len(pos) * len(neg))) < 1e-6


def test_pq_encode_codes_match_returned_codebooks(spark, sf_dir):
    """pq_encode's codes and recon_err must re-derive from the
    codebooks it returns: for every vector, the assigned code is the
    rounded-L2 argmin (ties to lower code) against that subspace's
    centroids, and recon_err is the rounded sum of the four assigned
    distances — checked in numpy, independently of both engines."""
    import numpy as np

    from parquet_editor_spark.operators.sim import pq_encode

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    encoded, books = pq_encode(
        emb, "vec_id", "embedding", m=4, k=8, iters=2, round_to=6
    )
    assert len(books) == 4 and all(
        len(b) == 8 and len(b[0]) == 16 for b in books
    )
    got = {r["vec_id"]: r for r in encoded.collect()}
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    for vid, v in vecs.items():
        total = 0.0
        for s in range(4):
            sub = v[s * 16 : (s + 1) * 16]
            ds = [
                round(
                    float(sub @ sub)
                    + float(sum(x * x for x in c))
                    - 2.0 * float(sum(a * b for a, b in zip(sub, c))),
                    6,
                )
                for c in books[s]
            ]
            best = min(range(8), key=lambda i: (ds[i], i))
            assert got[vid][f"code_{s}"] == best, (vid, s)
            total += ds[best]
        assert abs(got[vid]["recon_err"] - round(total, 6)) < 1e-9
    # compression really happened: codes use more than one centroid
    assert len({r["code_0"] for r in got.values()}) > 1
