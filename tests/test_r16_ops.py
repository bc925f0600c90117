"""Behavioral pins for the r16 operators beyond the DuckDB
differential: the shuffle_blocks ≡ one-window-rank equivalence, the
two-stage rerank's exactness + recall dominance over the one-stage
ADC ranking, IVFADC delete/compaction byte-identity (including the
emptied-cell footprint), and the byte merge-sweep monotonicity
laws."""

import sys
from pathlib import Path

import pytest
from pyspark.sql import Window, functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as M

    return M


# ---------------------------------------------------------------------------
# shuffle_blocks
# ---------------------------------------------------------------------------

def test_shuffle_blocks_equals_one_window_rank(spark):
    """The bucketed distributed rank must be BIT-identical to the
    single window ``row_number() OVER (ORDER BY hash, id)`` the SQL
    oracle spells — including hash ties (the id tie-break) — and the
    ranks must be exactly the permutation 1..N."""
    from parquet_editor_spark.functions.hashing import shuffle_hash
    from parquet_editor_spark.operators.textprep import shuffle_blocks

    n = 700
    blocks = spark.range(0, n).withColumnRenamed("id", "block_id")
    for seed in (40503, 271828):
        got = {
            r["block_id"]: r["shuffle_rank"]
            for r in shuffle_blocks(
                blocks, "block_id", seed=seed, n_buckets=16
            ).collect()
        }
        w = Window.orderBy(
            shuffle_hash("block_id", seed).asc(),
            F.col("block_id").asc(),
        )
        want = {
            r["block_id"]: r["r"]
            for r in blocks.withColumn(
                "r", F.row_number().over(w)
            ).collect()
        }
        assert got == want, seed
        assert sorted(got.values()) == list(range(1, n + 1))


def test_shuffle_blocks_seed_reshuffles_and_is_stable(spark):
    """Same seed → identical permutation across runs; different seed
    → a different permutation (the reshuffle-without-repack
    property a dataloader epoch schedule needs)."""
    from parquet_editor_spark.operators.textprep import shuffle_blocks

    blocks = spark.range(0, 300).withColumnRenamed("id", "block_id")

    def perm(seed):
        return tuple(
            r["block_id"]
            for r in shuffle_blocks(blocks, "block_id", seed=seed)
            .orderBy("shuffle_rank")
            .collect()
        )

    a1, a2, b = perm(7), perm(7), perm(8)
    assert a1 == a2
    assert a1 != b


def test_shuffle_blocks_rejects_bad_buckets(spark):
    from parquet_editor_spark.operators.textprep import shuffle_blocks

    blocks = spark.range(0, 4).withColumnRenamed("id", "block_id")
    with pytest.raises(ValueError):
        shuffle_blocks(blocks, "block_id", n_buckets=3)


def test_shuffle_blocks_plan_data_window_is_bucketed(spark):
    """The scale claim, pinned on the EXECUTED plan (formatted-plan
    substring checks are vacuous — see test_plans._sp_benign): the
    data-side rank window is hash-partitioned by the hash-range
    bucket, and the ONLY single-partition frame is the ≤n_buckets-row
    offsets aggregate (the pack-offsets benign class) — never a
    global sort of the blocks."""
    import re

    from parquet_editor_spark import plans as P
    from parquet_editor_spark.operators.textprep import shuffle_blocks

    blocks = spark.range(0, 1000).withColumnRenamed("id", "block_id")
    df = shuffle_blocks(blocks, "block_id")
    ep = P.executed_plan(df)
    assert "hashpartitioning(__bk" in ep, ep
    lines = ep.split("\n")
    sp = 0
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            sp += 1
            below = "\n".join(lines[i + 1 : i + 3])
            assert "HashAggregate" in below, below
    assert sp == 1, ep  # exactly the offsets-window frame
    # the data-side rank window partitions by the bucket key
    for m in re.finditer(r"Window \[row_number\(\)[^\n]*", ep):
        assert "__bk" in m.group(0), m.group(0)


# ---------------------------------------------------------------------------
# two-stage rerank
# ---------------------------------------------------------------------------

def test_exact_rerank_full_shortlist_is_brute_force(spark, embeddings):
    """Law: rerank over the COMPLETE candidate set must equal the
    brute-force exact squared-L2 top-k — the shortlist only ever
    removes candidates, never reorders survivors."""
    from parquet_editor_spark.operators import sim as S

    emb = embeddings
    qset = emb.filter(F.col("vec_id") < 3)
    all_pairs = qset.select(
        F.col("vec_id").alias("query_id")
    ).crossJoin(
        emb.select(F.col("vec_id").alias("neighbor_id"))
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    got = S.exact_rerank(
        emb, qset, all_pairs, "vec_id", "embedding", topk=5
    ).collect()

    vec = F.col("embedding").cast("array<double>")
    qrows = qset.select(F.col("vec_id").alias("qid"), vec.alias("v")).collect()
    want = []
    corpus = {
        r["vec_id"]: [float(x) for x in r["v"]]
        for r in emb.select("vec_id", vec.alias("v")).collect()
    }
    for qr in qrows:
        qv = [float(x) for x in qr["v"]]
        qq = float(sum(x * x for x in qv))
        scored = sorted(
            (
                round(
                    sum(x * x for x in cv)
                    + qq
                    - 2.0 * sum(a * b for a, b in zip(cv, qv)),
                    6,
                ),
                nid,
            )
            for nid, cv in corpus.items()
            if nid != qr["qid"]
        )
        for rank, (d, nid) in enumerate(scored[:5], 1):
            want.append((int(qr["qid"]), rank, nid, d))
    got_t = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["exact_dist"])
        for r in got
    )
    assert got_t == sorted(want)


def test_rerank_recall_dominates_onestage(spark, sf_dir, entry):
    """The r15 verdict's done-condition: at the same nprobe, the
    two-stage rerank's mean recall vs exact brute force must beat
    the one-stage ADC ranking's — the exact pass can only repair
    quantization ranking errors inside the shortlist."""
    rows = entry.queries()["ivfadc_rerank_recall"](
        spark, sf_dir
    ).collect()
    mean_rr = sum(r["recall_rerank"] for r in rows) / len(rows)
    mean_one = sum(r["recall_onestage"] for r in rows) / len(rows)
    assert mean_rr > mean_one, (mean_rr, mean_one)
    # per-query the rerank can only draw from the 20-deep shortlist,
    # so it contains the one-stage top-5's exact-hits or better in
    # aggregate; pin the aggregate hit count too
    assert sum(r["n_rerank"] for r in rows) > sum(
        r["n_onestage"] for r in rows
    )


def test_ivfadc_rerank_plan_broadcasts_shortlist(spark, sf_dir, entry):
    """Scale pin on the EXECUTED plan: stage 2's exact-score join
    enters as a BROADCAST of the shortlist id pairs into the corpus
    scan — never a shuffle of the corpus on the exact side — and the
    whole two-stage plan holds zero single-partition exchanges."""
    from parquet_editor_spark import plans as P

    df = entry.queries()["ivfadc_topk_rerank"](spark, sf_dir)
    ep = P.executed_plan(df)
    assert "BroadcastHashJoin" in ep, ep
    assert "Exchange SinglePartition" not in ep, ep


def test_rerank_depth_sweep_monotone(spark, sf_dir, entry):
    """The depth-sweep law: recall@5 is non-decreasing in the
    shortlist depth — a candidate that displaces a true top-5 member
    from the rerank top-5 is exactly-closer than it, hence itself a
    true top-5 member, so hits can only grow as the shortlist
    widens.  Also pins depth-5 ≡ the one-stage top-5 set (rerank of
    a 5-deep shortlist reorders but cannot change membership)."""
    rows = entry.queries()["ivfadc_rerank_depth_sweep"](
        spark, sf_dir
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["shortlist"]] = r["n_hits"]
    for q, d in by_q.items():
        seq = [d[k] for k in (5, 10, 20, 40)]
        assert seq == sorted(seq), (q, seq)
    rec = entry.queries()["ivfadc_rerank_recall"](spark, sf_dir)
    one = {
        r["query_id"]: r["n_onestage"] for r in rec.collect()
    }
    assert {q: d[5] for q, d in by_q.items()} == one


def test_ivfadc_filtered_is_prefilter_not_postfilter(spark, embeddings):
    """Filtered serving laws: every neighbor satisfies the predicate,
    every query still gets a full top-5 (pre-filter semantics), and
    the result differs from post-filtering the unfiltered top-5 —
    the correctness trap the operator exists to avoid."""
    from parquet_editor_spark.operators import sim as S

    emb = embeddings
    qset = emb.filter(F.col("vec_id") < 5)
    kw = dict(m=4, k=8, topk=5, n_cells=8, nprobe=3, iters=2)
    filt = S.ivfadc_topk(
        emb, qset, "vec_id", "embedding",
        keep=F.col("vec_id") % 2 == 0, **kw,
    ).collect()
    plain = S.ivfadc_topk(
        emb, qset, "vec_id", "embedding", **kw
    ).collect()
    assert all(r["neighbor_id"] % 2 == 0 for r in filt)
    per_q = {}
    for r in filt:
        per_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert all(len(v) == 5 for v in per_q.values())
    post = {}
    for r in plain:
        if r["neighbor_id"] % 2 == 0:
            post.setdefault(r["query_id"], []).append(r["neighbor_id"])
    # post-filtering loses candidates for at least one query
    assert any(len(post.get(q, [])) < 5 for q in per_q)


# ---------------------------------------------------------------------------
# IVFADC delete + compaction
# ---------------------------------------------------------------------------

def _build_append(spark, emb, tmp):
    from parquet_editor_spark.operators import sim as S

    base = emb.filter(F.col("vec_id") % 10 != 9)
    newv = emb.filter(F.col("vec_id") % 10 == 9)
    S.ivfadc_build(
        base, tmp, "vec_id", "embedding", m=4, k=8, n_cells=8,
        iters=2, round_to=6, cell_round=6,
    )
    S.ivfadc_append(spark, tmp, newv, "vec_id", "embedding")


def test_ivfadc_delete_codes_byte_identical(spark, embeddings, tmp_path):
    """After build → append → delete, the stored codes relation must
    be BYTE-IDENTICAL to frozen-encoding the surviving set directly
    under the same tables — no resurrected ids, no lost survivors,
    no encode drift through the rewrite."""
    from parquet_editor_spark.operators import sim as S

    tmp = str(tmp_path / "idx")
    _build_append(spark, embeddings, tmp)
    dels = embeddings.filter(F.col("vec_id") % 3 == 2).select("vec_id")
    affected = S.ivfadc_delete(spark, tmp, dels, "vec_id")
    assert affected  # the fixture delete set touches real cells

    codes = spark.read.parquet(f"{tmp}/codes")
    cents, books = S._ivfadc_load_meta(spark, tmp)
    surv = embeddings.filter(F.col("vec_id") % 3 != 2)
    tagged = S._ivfadc_tag_residual(
        surv, cents, "vec_id", "embedding", 6
    )
    want = S._pq_assign_frozen(
        tagged, "vec_id", "__res", books, 6, keep_cols=("__cell",)
    ).withColumnRenamed("__cell", "cell")
    cols = ["vec_id", "cell", "code_0", "code_1", "code_2", "code_3",
            "recon_err"]
    got_rows = {tuple(r) for r in codes.select(*cols).collect()}
    want_rows = {tuple(r) for r in want.select(*cols).collect()}
    assert got_rows == want_rows


def test_ivfadc_delete_emptied_cell_footprint(spark, embeddings, tmp_path):
    """Deleting EVERY member of a cell must leave a readable zero-row
    footprint for that cell — dynamic overwrite alone would keep the
    stale files and resurrect the ids."""
    from parquet_editor_spark.operators import sim as S

    tmp = str(tmp_path / "idx")
    _build_append(spark, embeddings, tmp)
    codes = spark.read.parquet(f"{tmp}/codes")
    by_cell = {
        int(r["cell"]): int(r["n"])
        for r in codes.groupBy("cell").agg(
            F.count("*").alias("n")
        ).collect()
    }
    victim = min(by_cell, key=by_cell.get)
    dels = codes.filter(F.col("cell") == victim).select("vec_id")
    affected = S.ivfadc_delete(spark, tmp, dels, "vec_id")
    assert victim in affected
    after = spark.read.parquet(f"{tmp}/codes")
    assert after.filter(F.col("cell") == victim).count() == 0
    # untouched cells keep every row
    assert (
        after.count()
        == sum(n for c, n in by_cell.items() if c != victim)
    )


def test_ivfadc_delete_noop_on_absent_ids(spark, embeddings, tmp_path):
    from parquet_editor_spark.operators import sim as S

    tmp = str(tmp_path / "idx")
    _build_append(spark, embeddings, tmp)
    before = spark.read.parquet(f"{tmp}/codes").count()
    dels = spark.range(10_000_000, 10_000_050).select(
        F.col("id").alias("vec_id")
    )
    assert S.ivfadc_delete(spark, tmp, dels, "vec_id") == []
    assert spark.read.parquet(f"{tmp}/codes").count() == before


# ---------------------------------------------------------------------------
# v12 dataloader handoff
# ---------------------------------------------------------------------------

def test_shard_schedule_balance_and_checksum(spark, sf_dir, entry):
    """The v12 stripe laws: workers differ by at most one block
    (round-robin over a permutation), rank ranges tile 1..n, and the
    commutative checksum matches a local recompute from the v12
    (rank, block) mapping — the audit really pins the schedule."""
    qs = entry.queries()
    v12 = qs["pipeline_curation_v12"](spark, sf_dir).collect()
    sched = qs["shard_schedule_v12"](spark, sf_dir).collect()
    n = len(v12)
    assert sorted(r["shuffle_rank"] for r in v12) == list(
        range(1, n + 1)
    )
    counts = [r["n_blocks"] for r in sched]
    assert max(counts) - min(counts) <= 1
    assert sum(counts) == n
    want = {}
    for r in v12:
        w = (r["shuffle_rank"] - 1) % 4
        assert w == r["worker"]
        want[w] = want.get(w, 0) + (
            (r["shuffle_rank"] * 1000003 + r["block_id"]) % 2654435761
        )
    got = {r["worker"]: r["sched_checksum"] for r in sched}
    assert got == want


# ---------------------------------------------------------------------------
# byte merge sweep
# ---------------------------------------------------------------------------

def test_byte_sweep_monotonicity(spark):
    """More merges can only compress harder: total tokens are
    non-increasing in the merge budget and every learned table stays
    a valid tokenize input (train → apply composes at each sweep
    point)."""
    from parquet_editor_spark.operators import textprep as TP

    texts = [
        "the cat in the hat sat on the mat",
        "café the test in the rain",
        "試験 the thing and another thing",
        "in the end the answer is in the air",
    ] * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, t string"
    )
    prev_tokens = None
    for n in (2, 4, 8):
        learned = sorted(
            TP.byte_bpe_train(
                df.select("t"), "t", n_merges=n, batch=4
            ).collect(),
            key=lambda r: r["merge_rank"],
        )
        assert len(learned) <= n
        merges = [(r["lhs"], r["rhs"]) for r in learned]
        agg = TP.byte_bpe_tokenize(df, "doc_id", "t", merges).agg(
            F.sum(F.size("input_ids")).alias("tt"),
            F.sum("exact").alias("ex"),
        ).collect()[0]
        assert agg["ex"] == len(texts)  # exact round-trip everywhere
        if prev_tokens is not None:
            assert agg["tt"] <= prev_tokens, (n, agg["tt"], prev_tokens)
        prev_tokens = agg["tt"]
