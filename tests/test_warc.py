"""WARC record-walk tests — plain and per-record-gzip streams,
truncation errors, and the ``warc_records`` Spark stage."""

import pytest

from parquet_editor_spark.operators import multimodal as MM
from parquet_editor_spark.sources.warc import make_warc, parse_warc

RECS = [
    {
        "warc_type": "warcinfo",
        "content_type": "application/warc-fields",
        "payload": "software: spark-pipeline\r\n",
    },
    {
        "warc_type": "response",
        "target_uri": "https://example.org/a",
        "date": "2024-01-02T03:04:05Z",
        "content_type": "text/plain",
        "payload": "hello crawl éè",  # multibyte body
    },
    {
        "warc_type": "response",
        "target_uri": "https://example.org/b",
        "content_type": "text/plain",
        "payload": b"raw-bytes body",
    },
]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_plain_and_gzip(gz):
    data = make_warc(RECS, gzip_members=gz)
    got = parse_warc(data)
    assert [r["warc_type"] for r in got] == [
        "warcinfo", "response", "response",
    ]
    assert got[1]["target_uri"] == "https://example.org/a"
    assert got[1]["date"] == "2024-01-02T03:04:05Z"
    assert got[1]["payload"] == "hello crawl éè".encode()
    assert got[2]["payload"] == b"raw-bytes body"
    # Content-Length counted the multibyte body in BYTES
    assert len(got[1]["payload"]) == 12 + 4


def test_payload_with_crlf_does_not_split_records():
    tricky = {
        "warc_type": "resource",
        "payload": b"line1\r\n\r\nWARC/1.0\r\nnot a real record",
    }
    got = parse_warc(make_warc([tricky, RECS[0]]))
    assert len(got) == 2
    assert got[0]["payload"] == tricky["payload"]


def test_truncation_and_garbage_raise():
    data = make_warc(RECS)
    with pytest.raises(ValueError, match="overruns|truncated"):
        parse_warc(data[:-20])
    with pytest.raises(ValueError, match="WARC/"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="truncated gzip"):
        parse_warc(make_warc(RECS, gzip_members=True)[:-5])


def test_warc_records_stage(spark):
    rows = [
        (1, make_warc(RECS)),
        (2, make_warc(RECS, gzip_members=True)),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = MM.warc_records(df).orderBy("id", "rec_idx").collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["id"], []).append(r)
    for i in (1, 2):  # plain and gzip parse identically
        rs = by_id[i]
        assert [r["rec_idx"] for r in rs] == [0, 1, 2]
        assert rs[1]["body"] == "hello crawl éè"
        assert rs[1]["content_length"] == 16  # bytes, not chars
        assert rs[2]["target_uri"] == "https://example.org/b"
    assert by_id[3][0]["rec_idx"] is None  # null payload passes through


# ---------------------------------------------------------------------------
# property test: arbitrary bodies (binary, CRLF-laden) round-trip
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=30, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    recs=st.lists(
        st.tuples(
            st.sampled_from(["response", "resource", "metadata"]),
            # bodies containing \r\n\r\n and WARC/ are the trap: the
            # walk must trust Content-Length, never scan for markers
            st.binary(max_size=400) | st.just(b"\r\n\r\nWARC/1.0\r\n"),
        ),
        min_size=1,
        max_size=6,
    ),
    gz=st.booleans(),
)
def test_property_warc_roundtrip(recs, gz):
    from parquet_editor_spark.sources.warc import make_warc, parse_warc

    blob = make_warc(
        [
            {
                "warc_type": t,
                "target_uri": f"https://x/{i}",
                "content_type": "application/octet-stream",
                "payload": body,
            }
            for i, (t, body) in enumerate(recs)
        ],
        gzip_members=gz,
    )
    got = parse_warc(blob)
    assert [(r["warc_type"], r["payload"]) for r in got] == [
        (t, body) for t, body in recs
    ]
