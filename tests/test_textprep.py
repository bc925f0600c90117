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
