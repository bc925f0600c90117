"""Multimodal plumbing tests: binary payload round-trip, deterministic
fake decode, feature extraction batch shapes, frame sampling, and the
loud NotImplementedError on real codecs."""

import hashlib

import pytest
from pyspark.sql import functions as F

from parquet_editor_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def payloads(documents):
    return MM.attach_payload(
        documents.select("doc_id", "text").limit(50), "text"
    )


def test_payload_metadata_matches_python(payloads):
    rows = payloads.select("doc_id", "text", "meta.*").collect()
    for r in rows:
        raw = r["text"].encode()
        assert r["n_bytes"] == len(raw)
        assert r["checksum"] == hashlib.md5(raw).hexdigest()
        assert r["media_type"] == "image" and r["codec"] == "fake"


def test_payload_binary_roundtrip_parquet(spark, payloads, tmp_path):
    p = str(tmp_path / "media.parquet")
    payloads.write.parquet(p)
    back = spark.read.parquet(p)
    assert dict(back.dtypes)["payload"] == "binary"
    a = payloads.orderBy("doc_id").first()
    b = back.orderBy("doc_id").first()
    assert bytes(a["payload"]) == bytes(b["payload"])


def test_decode_meta_deterministic(payloads):
    out1 = {r["doc_id"]: (r["width"], r["height"], r["channels"])
            for r in MM.decode_meta(payloads).collect()}
    out2 = {r["doc_id"]: (r["width"], r["height"], r["channels"])
            for r in MM.decode_meta(payloads).collect()}
    assert out1 == out2
    for doc_id, (w, h, c) in out1.items():
        assert 16 <= w < 1040 and 16 <= h < 1040 and 1 <= c <= 4


def test_decode_matches_reference_impl(payloads):
    got = {r["doc_id"]: (r["width"], r["height"], r["channels"])
           for r in MM.decode_meta(payloads).collect()}
    for r in payloads.select("doc_id", "text").collect():
        d = hashlib.md5(r["text"].encode()).digest()
        assert got[r["doc_id"]] == (16 + d[0] % 1024, 16 + d[1] % 1024, 1 + d[2] % 4)


def test_extract_features_shape(payloads):
    out = MM.extract_features(payloads, dim=16)
    rows = out.select("doc_id", "features").collect()
    assert all(len(r["features"]) == 16 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["features"])
    assert dict(out.dtypes)["features"] == "array<float>"


def test_sample_frames_explodes(payloads):
    out = MM.sample_frames(payloads, n_frames=4)
    n_docs = payloads.count()
    assert out.count() == n_docs * 4
    per_doc = out.groupBy("doc_id").agg(
        F.countDistinct("frame_checksum").alias("n")
    ).collect()
    assert all(r["n"] == 4 for r in per_doc)


def test_real_codec_raises():
    # r8: jpeg now has a real header-metadata path — garbage bytes are
    # a ValueError (not a JPEG), while pixel-needing codecs still
    # raise NotImplementedError
    with pytest.raises(ValueError, match="not a JPEG"):
        MM._decode_real(b"bytes", "jpeg")
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        MM._decode_real(b"bytes", "webp")


def test_binary_dir_ingestion_to_payload(spark, tmp_path):
    """binaryFile source → attach_payload → decode_meta: raw files on
    disk become typed media payload rows with correct checksums; the
    glob filter and length pushdown prune at the scan."""
    import hashlib

    from parquet_editor_spark import io as peio

    blobs = {"a.png": b"\x89PNG fakebytes", "b.png": b"\x89PNG more", "c.txt": b"not media"}
    for name, data in blobs.items():
        (tmp_path / name).write_bytes(data)
    df = peio.load_binary_dir(spark, str(tmp_path), glob="*.png")
    rows = df.select("path", "length", "content").collect()
    assert {r["path"].rsplit("/", 1)[-1] for r in rows} == {"a.png", "b.png"}
    payloads = MM.attach_payload(df, "content", media_type="image", codec="fake")
    got = {
        r["meta"]["checksum"]
        for r in payloads.select("meta").collect()
    }
    assert got == {
        hashlib.md5(blobs["a.png"]).hexdigest(),
        hashlib.md5(blobs["b.png"]).hexdigest(),
    }
    capped = peio.load_binary_dir(spark, str(tmp_path), glob="*.png", max_bytes=12)
    assert capped.count() == 1


def test_resize_images_deterministic_and_schema(payloads):
    out = MM.resize_images(payloads, "payload", 64, 48)
    rows = out.collect()
    assert all(r["width"] == 64 and r["height"] == 48 for r in rows)
    # fake transform = md5(payload + "64x48"): verify against hashlib
    src = {r["doc_id"]: bytes(r["payload"])
           for r in payloads.select("doc_id", "payload").collect()}
    for r in rows:
        expect = hashlib.md5(src[r["doc_id"]] + b"64x48").digest()
        assert bytes(r["payload"]) == expect
    # resized payload replaces the original in place, schema keeps meta
    assert "meta" in out.columns


def test_extract_features_wide_dim(spark):
    out = MM.extract_features(
        MM.attach_payload(
            spark.createDataFrame([(1, "x")], "doc_id long, text string"),
            "text",
        ),
        dim=300,
    ).collect()
    assert len(out[0]["features"]) == 300


def test_sample_frames_rejects_nonpositive(spark):
    import pytest as _pt

    df = MM.attach_payload(
        spark.createDataFrame([(1, "x")], "doc_id long, text string"), "text"
    )
    with _pt.raises(ValueError):
        MM.sample_frames(df, n_frames=0)
