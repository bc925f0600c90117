"""ZIP archive tier tests — deterministic round trips (deflate and
stored), corrupt archives, and the ``zip_members`` Spark stage."""

import zlib

import pytest

from parquet_editor_spark.operators import multimodal as MM
from parquet_editor_spark.sources.ziparc import make_zip, parse_zip

MEMBERS = [
    ("a/first.txt", "hello zip"),
    ("a/second.txt", "multibyte éè body"),
    ("bin.dat", b"\x00\x01\x02raw"),
]


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip(compress):
    data = make_zip(MEMBERS, compress=compress)
    got = parse_zip(data)
    assert [m["name"] for m in got] == [n for n, _ in MEMBERS]
    assert got[0]["data"] == b"hello zip"
    assert got[1]["data"] == "multibyte éè body".encode()
    assert got[2]["data"] == b"\x00\x01\x02raw"
    for m in got:
        assert m["crc32"] == zlib.crc32(m["data"])
        assert m["size"] == len(m["data"])


def test_deterministic_bytes():
    assert make_zip(MEMBERS) == make_zip(MEMBERS)


def test_garbage_raises():
    with pytest.raises(ValueError, match="not a valid ZIP"):
        parse_zip(b"PK\x03\x04 but not really a zip")
    with pytest.raises(ValueError, match="not a valid ZIP"):
        parse_zip(b"plain text")


def test_zip_members_stage(spark):
    rows = [
        (1, make_zip(MEMBERS)),
        (2, make_zip(MEMBERS, compress=False)),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = MM.zip_members(df).orderBy("id", "member_idx").collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["id"], []).append(r)
    for i in (1, 2):
        rs = by_id[i]
        assert [r["name"] for r in rs] == [n for n, _ in MEMBERS]
        assert rs[1]["content"] == "multibyte éè body"
        assert rs[1]["size_bytes"] == len("multibyte éè body".encode())
        assert rs[0]["crc32"] == zlib.crc32(b"hello zip")
    # deflate actually compressed; stored did not
    assert by_id[3][0]["member_idx"] is None


# ---------------------------------------------------------------------------
# property test: arbitrary member names/bytes round-trip, both methods
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=30, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    members=st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(
                    codec="utf-8",
                    exclude_characters="/\\\x00",
                    min_codepoint=33,
                ),
                min_size=1,
                max_size=24,
            ),
            st.binary(max_size=1500),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    compress=st.booleans(),
)
def test_property_zip_roundtrip(members, compress):
    import zlib

    from parquet_editor_spark.sources.ziparc import make_zip, parse_zip

    got = parse_zip(make_zip(members, compress=compress))
    assert [(m["name"], m["data"]) for m in got] == list(members)
    assert all(
        m["crc32"] == zlib.crc32(m["data"]) & 0xFFFFFFFF for m in got
    )
