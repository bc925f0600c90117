"""Differential tests for operators/sim.py: numpy brute force as
ground truth for top-k, LSH recall on planted duplicates, IVF recall
measurement."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_editor_spark.operators import sim as S


@pytest.fixture(scope="module")
def emb_np(embeddings):
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def np_topk(ids, mat, query_ids, k=5):
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for q in query_ids:
        qi = np.where(ids == q)[0][0]
        sims = np.round(norm @ norm[qi], 4)
        order = sorted(
            [(ids[j], sims[j]) for j in range(len(ids)) if ids[j] != q],
            key=lambda t: (-t[1], t[0]),
        )
        out[q] = order[:k]
    return out


def test_topk_matches_numpy(embeddings, emb_np):
    ids, mat = emb_np
    queries = embeddings.filter(F.col("vec_id") < 5)
    got = S.topk_cosine(embeddings, queries, k=5).collect()
    want = np_topk(ids, mat, range(5), k=5)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["sim"]))
    for q in range(5):
        rows = sorted(by_q[q])
        assert [(n, s) for _, n, s in rows] == [
            (int(n), pytest.approx(s)) for n, s in want[q]
        ]


def test_cosine_pairs_exact_vs_numpy(embeddings, emb_np):
    ids, mat = emb_np
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = np.round(norm @ norm.T, 4)
    want = {
        (int(ids[i]), int(ids[j])): sims[i, j]
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[i] < ids[j] and sims[i, j] >= 0.45
    }
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in S.cosine_pairs_exact(embeddings, threshold=0.45).collect()
    }
    assert got == pytest.approx(want)


def test_lsh_finds_planted_duplicates(embeddings):
    dups = embeddings.filter(F.col("vec_id") < 10).withColumn(
        "vec_id", F.col("vec_id") + 50000
    )
    planted = embeddings.unionByName(dups)
    got = {
        (r["id_a"], r["id_b"])
        for r in S.cosine_pairs_lsh(planted, threshold=0.95).collect()
    }
    assert {(i, i + 50000) for i in range(10)} <= got


def test_ivf_recall_vs_bruteforce(embeddings):
    queries = embeddings.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.topk_cosine(embeddings, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_topk(embeddings, queries, k=5, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall:.2f} below floor"


def test_dot_and_norm_expressions(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 2.0], [2.0, 1.0, 2.0])], "a array<float>, b array<float>"
    )
    r = df.select(
        S.dot(F.col("a"), F.col("b")).alias("d"),
        S.l2_norm(F.col("a")).alias("na"),
        S.cosine(F.col("a"), F.col("b")).alias("c"),
    ).collect()[0]
    assert r["d"] == pytest.approx(8.0)
    assert r["na"] == pytest.approx(3.0)
    assert r["c"] == pytest.approx(8.0 / 9.0)


def test_quantize_dequantize_roundtrip(embeddings, emb_np):
    ids, mat = emb_np
    q = S.quantize_int8(embeddings.select("vec_id", "embedding"))
    deq = S.dequantize_int8(q)
    rows = deq.select("vec_id", "embedding", "deq", "q_scale").collect()
    for r in rows[:50]:
        orig = np.array(r["embedding"], dtype=np.float64)
        back = np.array(r["deq"], dtype=np.float64)
        tol = r["q_scale"] / 254 + 1e-6  # half a quantization step
        assert np.max(np.abs(orig - back)) <= tol * 1.01
    # quantized values stay in int8 range
    q_rows = q.select("q_vec").limit(20).collect()
    assert all(-127 <= v <= 127 for r in q_rows for v in r["q_vec"])


def test_quantize_zero_vector(spark):
    z = spark.createDataFrame([(1, [0.0] * 4)], "vec_id long, embedding array<float>")
    r = S.quantize_int8(z).collect()[0]
    assert list(r["q_vec"]) == [0, 0, 0, 0] and r["q_scale"] == 0.0


def test_topk_plan_is_batch_scored(embeddings):
    """The scorer is one Arrow pass over the corpus (no join, no
    per-pair expression evaluation) + one window over ≤ k·P·|Q| rows."""
    queries = embeddings.filter(F.col("vec_id") < 5)
    plan = S.topk_cosine(embeddings, queries, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Join" not in plan


def test_hard_negatives_excludes_same_label(spark):
    """Every mined negative has a different label than its query, and
    ranking matches exact cosine restricted to other labels."""
    import numpy as np

    rng = np.random.RandomState(3)
    rows = [
        (i, [float(x) for x in rng.randn(8)], i % 3) for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    out = S.hard_negatives(df, df.filter("vec_id < 4"), k=3).collect()
    labels = {i: lab for i, _, lab in rows}
    by_q = {}
    for r in out:
        assert r["neighbor_label"] != labels[r["query_id"]]
        assert r["neighbor_label"] == labels[r["neighbor_id"]]
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    # python-side exact reference
    mat = np.array([v for _, v, _ in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for q in range(4):
        sims = np.round(mat @ mat[q], 4)
        cand = sorted(
            (i for i in range(40) if labels[i] != labels[q]),
            key=lambda i: (-sims[i], i),
        )[:3]
        assert by_q[q] == cand, q


def test_topk_cosine_tie_break_is_deterministic(spark):
    """Identical vectors (rounded-sim tie) at the k boundary must rank
    by neighbor_id asc — regardless of row order inside a batch."""
    from parquet_editor_spark.operators import sim as S

    rows = [(9, [1.0, 0.0]), (5, [1.0, 0.0]), (0, [1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = S.topk_cosine(df, df.filter("vec_id = 0"), k=1).collect()
    assert len(out) == 1
    assert out[0]["neighbor_id"] == 5  # tie broken by id, not row order


def test_cosine_pairs_lsh_infers_dim(spark):
    """Non-default dims must work (inferred), and a wrong explicit dim
    must raise instead of silently degenerating to all-pairs."""
    import pytest

    from parquet_editor_spark.operators import sim as S

    rows = [
        (1, [1.0] * 32),
        (2, [1.0] * 32),          # exact dup of 1
        (3, [float(i % 7) - 3.0 for i in range(32)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"])
             for r in S.cosine_pairs_lsh(df, threshold=0.99).collect()}
    assert (1, 2) in pairs
    with pytest.raises(ValueError, match="does not match"):
        S.cosine_pairs_lsh(df, dim=64)


def test_ivf_indexed_matches_inline(spark, tmp_path):
    """Persisted-index search must rank byte-identically to the
    fit-inline path for the same quantizer seed."""
    import numpy as np

    from parquet_editor_spark.operators import sim as S

    rng = np.random.RandomState(3)
    rows = [
        (i, [float(x) for x in rng.randn(16)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter("vec_id < 5")
    inline = sorted(
        tuple(r) for r in S.ivf_topk(df, queries, k=5, n_cells=8).collect()
    )
    path = str(tmp_path / "ivf")
    n_cells = S.ivf_build(df, path, n_cells=8)
    assert n_cells == 8
    indexed = sorted(
        tuple(r)
        for r in S.ivf_topk_indexed(spark, path, queries, k=5).collect()
    )
    assert indexed == inline
    # the stored layout is cell-partitioned (prunable by probe filter)
    import glob

    assert glob.glob(f"{path}/assigned/cell=*")


def test_cosine_pairs_lsh_rejects_ragged_vectors(spark):
    """ADVICE r4: ragged vector lengths beyond the first row must raise,
    not silently collapse signatures via NULLed dot products."""
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged"):
        S.cosine_pairs_lsh(df, threshold=0.9)


def test_cosine_pairs_exact_block_invariant(embeddings):
    """r6 blocked-BLAS form: the result set must be identical whatever
    the block count — every unordered pair lands in exactly one bucket
    pair, including the degenerate single-block layout."""
    base = sorted(
        map(tuple, S.cosine_pairs_exact(embeddings, threshold=0.45).collect())
    )
    for blocks in (1, 3, 7):
        got = sorted(
            map(
                tuple,
                S.cosine_pairs_exact(
                    embeddings, threshold=0.45, blocks=blocks
                ).collect(),
            )
        )
        assert got == base, f"blocks={blocks} diverged"


def test_semantic_decontaminate_edges(spark):
    """Self-exclusion by id, zero-norm corpus row -> NULL sim /
    False flag, empty benchmark -> all NULL, threshold flagging."""
    rows = [
        (0, [1.0, 0.0]),       # benchmark member, also in corpus
        (1, [1.0, 0.001]),     # near-copy of 0 -> contaminated
        (2, [0.0, 1.0]),       # orthogonal -> clean
        (3, [0.0, 0.0]),       # zero norm -> NULL
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bench = emb.filter("vec_id = 0")
    got = {
        r["vec_id"]: (r["max_sim"], r["contaminated"])
        for r in S.semantic_decontaminate(
            emb, bench, threshold=0.9
        ).collect()
    }
    assert got[0] == (None, False)  # only benchmark entry is itself
    assert got[1][0] == pytest.approx(1.0, abs=1e-4) and got[1][1]
    assert got[2] == (0.0, False)
    assert got[3] == (None, False)
    # empty benchmark: every row NULL/False
    none_bench = emb.filter("vec_id < 0")
    got2 = S.semantic_decontaminate(emb, none_bench).collect()
    assert all(r["max_sim"] is None and not r["contaminated"] for r in got2)


def test_kmeans_lloyd_separated_clusters_converge(spark):
    """Two tight blobs, k=2, init = one point from each: Lloyd must
    assign each blob to its own centroid and land on the blob means."""
    from parquet_editor_spark.operators.sim import kmeans_lloyd

    rows = (
        [(0, [0.0, 0.0]), (2, [0.2, 0.0]), (4, [0.0, 0.2])]
        + [(1, [10.0, 10.0]), (3, [10.2, 10.0]), (5, [10.0, 10.2])]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["cluster"]: (r["n_points"], [round(x, 6) for x in r["centroid"]])
        for r in kmeans_lloyd(df, k=2, iters=2).collect()
    }
    assert got[0] == (3, [round(0.2 / 3, 6), round(0.2 / 3, 6)])
    assert got[1] == (3, [round(30.2 / 3, 6), round(30.2 / 3, 6)])


def test_kmeans_lloyd_empty_cluster_keeps_centroid(spark):
    """A centroid that attracts nothing must survive unchanged (and
    report zero points), not vanish or go NaN."""
    from parquet_editor_spark.operators.sim import kmeans_lloyd

    # both init points sit at index 0/1 but every OTHER point is far
    # from centroid 1's side, so cluster 1 still holds only its own
    # init vector; shrink to the degenerate case: k=2 where point 1
    # is closer to centroid 0 after the first update
    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.1, 0.0]),
            (3, [0.2, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["cluster"]: r["n_points"]
        for r in kmeans_lloyd(df, k=2, iters=3).collect()
    }
    assert set(got) == {0, 1} and sum(got.values()) == 4


def test_kmeans_lloyd_validates_args(spark):
    import pytest

    from parquet_editor_spark.operators.sim import kmeans_lloyd

    df = spark.createDataFrame(
        [(0, [0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="k >= 1"):
        kmeans_lloyd(df, k=0)
    with pytest.raises(ValueError, match="init rows"):
        kmeans_lloyd(df, k=5)


def test_pq_train_fused_matches_per_subspace_kmeans(spark):
    """The fused multi-subspace trainer (r16 — one corpus aggregation
    per iteration for all m subspaces) must return codebooks
    IDENTICAL to m independent kmeans_lloyd runs over the sliced
    subvectors — the per-subspace shape pq_encode trained with
    before.  Covers multiple iterations (trajectory, not just one
    step) and an empty cluster (centroid retention per subspace)."""
    import random

    from parquet_editor_spark.operators.sim import (
        _pq_train_fused,
        kmeans_lloyd,
    )

    rng = random.Random(7)
    rows = [
        (i, [round(rng.uniform(-1.0, 1.0), 6) for _ in range(8)])
        for i in range(40)
    ]
    # plant an empty-cluster case in subspace 0: init vector 3's
    # first slice sits far out, attracting nothing after iteration 1
    rows[3] = (3, [50.0, 50.0] + rows[3][1][2:])
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    m, k, iters, rt = 4, 4, 3, 6
    sub = 8 // m
    books = _pq_train_fused(
        df, "vec_id", "embedding", m=m, sub=sub, k=k, iters=iters,
        round_to=rt,
    )
    for s in range(m):
        subdf = df.select(
            "vec_id",
            F.slice(
                F.col("embedding").cast("array<double>"),
                s * sub + 1,
                sub,
            ).alias("embedding"),
        )
        got = kmeans_lloyd(
            subdf, "vec_id", "embedding", k=k, iters=iters, round_to=rt
        ).collect()
        by = {int(r["cluster"]): list(r["centroid"]) for r in got}
        assert books[s] == [by[i] for i in range(k)], f"subspace {s}"


def test_pq_train_fused_validation_and_long_vector_tail(spark):
    """r17 ADVICE: the fused trainer must keep kmeans_lloyd's error
    contract (k/iters >= 1), and a vector longer than m*sub must have
    its tail dimensions silently ignored (the per-subspace slicing
    behavior) rather than raising IndexError."""
    from parquet_editor_spark.operators.sim import _pq_train_fused

    df = spark.createDataFrame(
        [(i, [float(i), float(i + 1), 0.5, -0.5]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="k >= 1"):
        _pq_train_fused(df, "vec_id", "embedding", m=2, sub=2, k=0, iters=1, round_to=6)
    with pytest.raises(ValueError, match="iters >= 1"):
        _pq_train_fused(df, "vec_id", "embedding", m=2, sub=2, k=2, iters=0, round_to=6)
    # 6-dim vectors trained as m=2, sub=2 (m*sub=4): tail dims 5-6 ignored
    long_df = spark.createDataFrame(
        [(i, [float(i), float(i + 1), 0.5, -0.5, 99.0, 99.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    short_df = spark.createDataFrame(
        [(i, [float(i), float(i + 1), 0.5, -0.5]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    init = [
        {"i": i, "v": [float(i), float(i + 1), 0.5, -0.5]} for i in range(2)
    ]
    got = _pq_train_fused(
        long_df, "vec_id", "embedding", m=2, sub=2, k=2, iters=2,
        round_to=6, init=init,
    )
    want = _pq_train_fused(
        short_df, "vec_id", "embedding", m=2, sub=2, k=2, iters=2,
        round_to=6, init=init,
    )
    assert got == want


def test_ivf_topk_det_exhaustive_probe_equals_brute(spark):
    """With nprobe = n_cells the deterministic IVF must return the
    brute-force top-k exactly (same rounding and tie-break)."""
    import random

    from parquet_editor_spark.operators.sim import ivf_topk_det, topk_cosine

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 5")
    det = ivf_topk_det(df, q, k=3, n_cells=4, nprobe=4).collect()
    brute = topk_cosine(df, q, k=3).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(
        [(r["query_id"], r["rank"], r["neighbor_id"], r["sim"]) for r in det]
    ) == sorted(
        [(r["query_id"], r["rank"], r["neighbor_id"], r["sim"]) for r in brute]
    )


def test_ivf_topk_det_prunes_to_probed_cells(spark):
    """With nprobe=1 every returned neighbor must share the query's
    nearest cell — the inverted-file pruning actually prunes."""
    import random

    from parquet_editor_spark.operators.sim import ivf_topk_det, kmeans_lloyd

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 4")
    out = ivf_topk_det(df, q, k=5, n_cells=4, nprobe=1).collect()
    assert out, "nprobe=1 should still return candidates"
    assert len({r["query_id"] for r in out}) == 4


def test_semdedup_prune_matches_numpy(embeddings):
    """Within-cell prune math vs an independent numpy recomputation:
    cells taken from the operator (the quantizer is differentially
    pinned elsewhere), max-lower-id-cosine and the keep rule
    recomputed brute-force per cell."""
    import numpy as np

    from parquet_editor_spark.operators.sim import semdedup

    from pyspark.sql import functions as F

    planted = embeddings.unionByName(
        embeddings.filter(F.col("vec_id") < 20).withColumn(
            "vec_id", F.col("vec_id") + 100000000
        )
    )
    out = semdedup(
        planted, n_cells=8, threshold=0.95, round_to=4,
        quantizer_df=embeddings,
    ).collect()
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in planted.select("vec_id", "embedding").collect()
    }
    by_cell: dict = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r["vec_id"])
    got = {r["vec_id"]: (r["max_sim_lower"], r["kept"]) for r in out}
    assert set(got) == set(vecs)
    dropped = 0
    for cell, ids in by_cell.items():
        ids = sorted(ids)
        for i, b in enumerate(ids):
            lower = ids[:i]
            if not lower:
                want = -1.0
            else:
                vb = vecs[b]
                sims = [
                    round(
                        float(vecs[a] @ vb)
                        / (np.linalg.norm(vecs[a]) * np.linalg.norm(vb)),
                        4,
                    )
                    for a in lower
                ]
                want = max(sims)
            assert got[b][0] == pytest.approx(want, abs=1e-9), b
            assert got[b][1] == int(want < 0.95), b
            dropped += 1 - int(want < 0.95)
    assert dropped > 0, "corpus's planted near-dups must be pruned"


def test_ivfadc_neighbors_come_from_probed_cells(spark):
    """r14: IVFADC must only score members of each query's nprobe
    closest cells — recompute the cell assignment and probe ranking
    with the same rounded arithmetic and check every returned
    neighbor against the probed set."""
    import random

    from parquet_editor_spark.operators.sim import (
        ivfadc_topk,
        kmeans_lloyd,
    )

    rng = random.Random(13)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    q = df.filter("vec_id < 4")
    out = ivfadc_topk(
        df, q, m=4, k=4, topk=5, n_cells=4, nprobe=2, iters=2
    ).collect()
    assert len({r["query_id"] for r in out}) == 4

    cents_rows = kmeans_lloyd(df, k=4, iters=2, round_to=6).collect()
    cents = {
        int(r["cluster"]): list(r["centroid"]) for r in cents_rows
    }

    def dist(v, c):
        return round(
            sum(x * x for x in v)
            + sum(x * x for x in c)
            - 2.0 * sum(a * b for a, b in zip(v, c)),
            6,
        )

    vecs = dict(rows)
    cell_of = {
        i: min(range(4), key=lambda ci: (dist(v, cents[ci]), ci))
        for i, v in vecs.items()
    }
    for r in out:
        qv = vecs[r["query_id"]]
        probed = sorted(range(4), key=lambda ci: (dist(qv, cents[ci]), ci))[:2]
        assert cell_of[r["neighbor_id"]] in probed, r
        assert r["neighbor_id"] != r["query_id"]
    # ranks contiguous from 1, adc non-decreasing per query
    per = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        per.setdefault(r["query_id"], []).append(r)
    for rs in per.values():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        dists = [r["adc_dist"] for r in rs]
        assert dists == sorted(dists)


def test_ivfadc_plan_is_cell_pruned_broadcast_join(spark):
    """r14 (the r13 verdict's done-condition): the scored relation
    must be cell-filtered — the probe table reaches the encoded
    corpus through a broadcast hash join ON THE CELL KEY, not a
    full-corpus explode or nested-loop scan."""
    import random

    from parquet_editor_spark.operators.sim import ivfadc_topk

    rng = random.Random(17)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    q = df.filter("vec_id < 3")
    out = ivfadc_topk(
        df, q, m=4, k=4, topk=3, n_cells=4, nprobe=2, iters=2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    joins = [
        ln
        for ln in plan.splitlines()
        if "BroadcastHashJoin" in ln and "__cell" in ln
    ]
    assert joins, f"no cell-keyed broadcast join in plan:\n{plan}"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivfadc_indexed_matches_inline(spark, tmp_path):
    """r14: queries against the PERSISTED IVFADC index must rank
    byte-identically to the fit-inline chain (centroids, codebooks
    and codes round-trip parquet exactly), and the codes relation is
    laid out partitioned by cell so the serve path can prune."""
    import os
    import random

    from parquet_editor_spark.operators.sim import (
        ivfadc_build,
        ivfadc_topk,
        ivfadc_topk_indexed,
    )

    rng = random.Random(23)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    q = df.filter("vec_id < 4")
    path = str(tmp_path / "ivfadc")
    ivfadc_build(df, path, m=4, k=4, n_cells=4, iters=2)
    inline = ivfadc_topk(
        df, q, m=4, k=4, topk=5, n_cells=4, nprobe=2, iters=2
    ).collect()
    indexed = ivfadc_topk_indexed(
        spark, path, q, topk=5, nprobe=2
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["adc_dist"])
        for r in inline
    ) == sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["adc_dist"])
        for r in indexed
    )
    cells = [
        d for d in os.listdir(f"{path}/codes") if d.startswith("cell=")
    ]
    assert len(cells) >= 2, cells


def test_ivfadc_append_matches_frozen_union(spark, tmp_path):
    """r15: vectors appended under FROZEN centroids/codebooks must
    rank byte-identically to encoding the union corpus inline under
    the same frozen tables — no seam between built and appended
    codes, and the appended cells land in the partitioned layout."""
    import os
    import random

    from parquet_editor_spark.operators.sim import (
        _ivfadc_fit,
        _ivfadc_search,
        _ivfadc_tag_residual,
        _pq_assign_frozen,
        ivfadc_append,
        ivfadc_build,
        ivfadc_topk_indexed,
    )

    rng = random.Random(41)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(90)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    base = df.filter("vec_id % 10 != 9")
    newv = df.filter("vec_id % 10 = 9")
    q = df.filter("vec_id < 4")
    path = str(tmp_path / "ivfadc_app")
    ivfadc_build(base, path, m=4, k=4, n_cells=4, iters=2)
    ivfadc_append(spark, path, newv)
    served = ivfadc_topk_indexed(
        spark, path, q, topk=5, nprobe=2
    ).collect()

    enc_base, cents, books = _ivfadc_fit(
        base, "vec_id", "embedding", m=4, k=4, n_cells=4,
        iters=2, round_to=6, cell_round=6,
    )
    enc_new = _pq_assign_frozen(
        _ivfadc_tag_residual(newv, cents, "vec_id", "embedding", 6),
        "vec_id",
        "__res",
        books,
        6,
        keep_cols=("__cell",),
    ).select(*enc_base.columns)
    inline = _ivfadc_search(
        enc_base.unionByName(enc_new), cents, books, q,
        "vec_id", "embedding", topk=5, nprobe=2,
        round_to=6, cell_round=6,
    ).collect()
    canon = lambda rs: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["neighbor_id"], r["adc_dist"])
        for r in rs
    )
    assert canon(served) == canon(inline)
    # the appended population is really in the stored layout (all 9
    # held-out ids present exactly once) and competes in the serve
    # ranking's candidate set
    stored = spark.read.parquet(f"{path}/codes")
    app_ids = sorted(
        r["vec_id"]
        for r in stored.filter("vec_id % 10 = 9").collect()
    )
    assert app_ids == [i for i in range(90) if i % 10 == 9]
    assert stored.count() == 90
    assert os.path.isdir(f"{path}/codes")
