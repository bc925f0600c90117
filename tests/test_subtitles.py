"""SRT / WebVTT parser tests and the ``subtitle_cues`` stage."""

import pytest

from parquet_editor_spark.operators import multimodal as MM
from parquet_editor_spark.sources.subtitles import (
    make_srt,
    make_vtt,
    parse_srt,
    parse_vtt,
)

CUES = [
    {"start_ms": 0, "end_ms": 1500, "text": "first cue"},
    {"start_ms": 61_234, "end_ms": 65_000, "text": "two\nlines"},
    {"start_ms": 3_600_000 + 123, "end_ms": 3_700_000, "text": "hour mark"},
]


def test_srt_roundtrip():
    got = parse_srt(make_srt(CUES))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in got] == [
        (c["start_ms"], c["end_ms"], c["text"]) for c in CUES
    ]
    assert [c["cue_idx"] for c in got] == [1, 2, 3]


def test_vtt_roundtrip():
    got = parse_vtt(make_vtt(CUES))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in got] == [
        (c["start_ms"], c["end_ms"], c["text"]) for c in CUES
    ]


def test_vtt_identifiers_notes_and_settings():
    vtt = (
        "WEBVTT\n\n"
        "NOTE this block is a comment\nand continues\n\n"
        "intro-cue\n00:05.000 --> 00:07.500 align:start line:0%\nshort clock\n\n"
        "02:00.000 --> 02:01.000\nplain\n"
    )
    got = parse_vtt(vtt)
    assert [(c["start_ms"], c["end_ms"]) for c in got] == [
        (5_000, 7_500),
        (120_000, 121_000),
    ]
    assert got[0]["text"] == "short clock"


def test_malformed_raises():
    with pytest.raises(ValueError, match="WEBVTT header"):
        parse_vtt("1\n00:00:01,000 --> 00:00:02,000\nx\n")
    with pytest.raises(ValueError, match="timing line"):
        parse_srt("1\nnot a timing\nx\n")
    with pytest.raises(ValueError, match="out of range"):
        parse_srt("1\n00:99:00,000 --> 00:99:01,000\nx\n")
    with pytest.raises(ValueError, match="bad timestamp"):
        parse_srt("1\n00:00:xx,000 --> 00:00:01,000\nx\n")
    with pytest.raises(ValueError, match="ends before"):
        parse_srt("1\n00:00:05,000 --> 00:00:01,000\nx\n")


def test_subtitle_cues_stage(spark):
    rows = [
        (1, make_srt(CUES).encode(), "srt"),
        (2, make_vtt(CUES).encode(), "vtt"),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "id long, raw binary, fmt string")
    df = df.withColumn("payload", F.col("raw")).withColumn(
        "meta",
        F.struct(
            F.lit("text").alias("media_type"),
            F.col("fmt").alias("codec"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("checksum"),
        ),
    )
    got = MM.subtitle_cues(df).orderBy("id", "cue_idx").collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["id"], []).append(r)
    for i in (1, 2):
        rs = by_id[i]
        assert [r["start_ms"] for r in rs] == [0, 61_234, 3_600_123]
        assert rs[1]["cue_text"] == "two\nlines"


def test_subtitle_cues_stage_rejects_unknown(spark):
    df = MM.attach_payload(
        spark.createDataFrame([(1, b"x")], "id long, raw binary"),
        "raw",
        media_type="text",
        codec="ass",
    )
    with pytest.raises(Exception, match="srt/vtt"):
        MM.subtitle_cues(df).collect()


# ---------------------------------------------------------------------------
# property test: arbitrary timings/text round-trip through both formats
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_cue_text = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="\r\n",
        exclude_categories=("Cs", "Cc"),
    ),
    max_size=40,
).map(str.strip).filter(
    # a line of pure digits would parse as the next SRT counter, and
    # WEBVTT/arrow markers would parse as structure: exclude the
    # inputs the grammar reserves (the generators never emit them)
    lambda t: not t.isdigit() and "-->" not in t and t != "WEBVTT"
)


@settings(
    max_examples=40, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    cues=st.lists(
        st.tuples(
            st.integers(0, 359_999_999),  # < 100 h in ms
            st.integers(1, 60_000),
            _cue_text,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_property_srt_vtt_roundtrip(cues):
    from parquet_editor_spark.sources.subtitles import (
        make_srt,
        make_vtt,
        parse_srt,
        parse_vtt,
    )

    payload = [
        {"start_ms": s, "end_ms": s + d, "text": t} for s, d, t in cues
    ]
    for make, parse in ((make_srt, parse_srt), (make_vtt, parse_vtt)):
        got = parse(make(payload))
        assert [
            (c["start_ms"], c["end_ms"], c["text"]) for c in got
        ] == [(s, s + d, t) for s, d, t in cues]
