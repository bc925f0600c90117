"""TFRecord framing (sources/tfrecord.py) and the tfrecord_records
stage.  The CRC-32C implementation is pinned to the public check
value so the masked-CRC framing is verified against the spec, not
against itself."""

import struct

import pytest

from parquet_editor_spark.operators import multimodal as MM
from parquet_editor_spark.sources.tfrecord import (
    crc32c,
    make_tfrecord,
    parse_tfrecord,
)


def test_crc32c_check_value():
    # the canonical CRC-32C check value (RFC 3720 appendix / zlib docs)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # 32 bytes of zeros — second public vector from RFC 3720
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_roundtrip():
    recs = [b"hello", "unicode ✓".encode(), b"", b"\x00\xff" * 99]
    assert parse_tfrecord(make_tfrecord(recs)) == recs


def test_corrupt_raises():
    blob = bytearray(make_tfrecord([b"hello world"]))
    blob[14] ^= 0xFF  # flip a data byte -> data CRC mismatch
    with pytest.raises(ValueError, match="data CRC"):
        parse_tfrecord(bytes(blob))
    blob2 = bytearray(make_tfrecord([b"hello world"]))
    blob2[0] ^= 0x01  # flip a length byte -> length CRC mismatch
    with pytest.raises(ValueError, match="length CRC"):
        parse_tfrecord(bytes(blob2))
    with pytest.raises(ValueError, match="truncated TFRecord data"):
        parse_tfrecord(make_tfrecord([b"hello world"])[:-6])
    with pytest.raises(ValueError, match="truncated TFRecord header"):
        parse_tfrecord(b"\x01\x02\x03")


def test_framing_layout_is_spec_exact():
    blob = make_tfrecord([b"abc"])
    (length,) = struct.unpack("<Q", blob[:8])
    assert length == 3
    assert blob[12:15] == b"abc"
    assert len(blob) == 8 + 4 + 3 + 4


def test_tfrecord_records_stage(spark):
    rows = [
        (1, make_tfrecord(["alpha", "beta"])),
        (2, make_tfrecord([b"gamma"])),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = MM.tfrecord_records(df).orderBy("id", "rec_idx").collect()
    assert [
        (r["id"], r["rec_idx"], r["size_bytes"], r["content"]) for r in got
    ] == [
        (1, 0, 5, "alpha"),
        (1, 1, 4, "beta"),
        (2, 0, 5, "gamma"),
        (3, None, None, None),
    ]


def test_shard_tfrecord_orders_and_roundtrips(spark):
    rows = [(0, 2, "second"), (0, 1, "first"), (1, 3, "third ✓")]
    df = spark.createDataFrame(rows, "shard long, k long, v string")
    shards = MM.shard_tfrecord(df, "shard", "k", "v").orderBy("shard")
    got = shards.collect()
    assert [(r["shard"], r["n_records"]) for r in got] == [(0, 2), (1, 1)]
    assert all(r["shard_bytes"] == len(r["payload"]) for r in got)
    assert parse_tfrecord(bytes(got[0]["payload"])) == [b"first", b"second"]
    back = (
        MM.tfrecord_records(shards.select("shard", "payload"))
        .orderBy("shard", "rec_idx")
        .collect()
    )
    assert [(r["shard"], r["rec_idx"], r["content"]) for r in back] == [
        (0, 0, "first"), (0, 1, "second"), (1, 0, "third ✓"),
    ]


# ---------------------------------------------------------------------------
# property test: arbitrary record streams round-trip bit-exactly
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=40, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(recs=st.lists(st.binary(max_size=3000), max_size=10))
def test_property_tfrecord_roundtrip(recs):
    assert parse_tfrecord(make_tfrecord(recs)) == recs
