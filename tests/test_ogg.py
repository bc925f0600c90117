"""Ogg/Opus/Vorbis header walk — sources/ogg.py + the audio_meta path."""

from __future__ import annotations

import pytest

from parquet_editor_spark.sources.ogg import (
    make_ogg_opus,
    make_ogg_vorbis,
    ogg_crc,
    ogg_pages,
    ogg_stream_info,
)


def test_opus_stream_info_subtracts_preskip():
    data = make_ogg_opus(channels=2, pre_skip=312, n_frames=96000,
                         input_rate=44100)
    codec, rate, ch, n = ogg_stream_info(data)
    assert (codec, rate, ch, n) == ("opus", 48000, 2, 96000)


def test_vorbis_stream_info_uses_id_rate():
    data = make_ogg_vorbis(channels=1, sample_rate=22050, n_frames=44100)
    codec, rate, ch, n = ogg_stream_info(data)
    assert (codec, rate, ch, n) == ("vorbis", 22050, 1, 44100)


def test_multipage_granule_is_last_not_max_of_headers():
    # 5 audio pages; the walk must take the final granule
    data = make_ogg_opus(channels=1, pre_skip=0, n_frames=4800,
                         n_audio_pages=5)
    assert ogg_stream_info(data)[3] == 4800


def test_page_crc_detects_corruption():
    data = bytearray(make_ogg_vorbis(1, 8000, 1000))
    data[-1] ^= 0x01  # flip a byte inside the last page body
    with pytest.raises(ValueError, match="CRC"):
        ogg_stream_info(bytes(data))


def test_rejects_non_ogg_and_truncated():
    with pytest.raises(ValueError, match="OggS"):
        ogg_stream_info(b"fLaC" + bytes(40))
    good = make_ogg_opus(1, 0, 480)
    with pytest.raises(ValueError, match="truncated|sync"):
        list(ogg_pages(good[:-5]))


def test_rejects_unknown_first_packet():
    from parquet_editor_spark.sources.ogg import _page

    data = _page(7, 0, 0, [b"Speex   headerish"], header_type=0x02)
    with pytest.raises(ValueError, match="neither OpusHead nor Vorbis"):
        ogg_stream_info(data)


def test_large_packet_lacing_roundtrip():
    """A >255-byte packet spans multiple lacing values; the segment
    table walk must reassemble the body length correctly."""
    from parquet_editor_spark.sources.ogg import _page

    pkt = bytes(range(256)) * 3  # 768 bytes → lacing 255,255,255,3
    page = _page(9, 0, 0, [pkt], header_type=0x02)
    (htype, granule, serial, seq, body), = list(ogg_pages(page))
    assert body == pkt and serial == 9 and htype == 0x02


def test_crc_known_zero_property():
    # CRC of empty input is 0 for this (init 0, xor 0) variant
    assert ogg_crc(b"") == 0
    assert ogg_crc(b"\x00") == 0  # zero bytes through a zero register


def test_audio_meta_ogg_paths(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from parquet_editor_spark.operators.multimodal import audio_meta

    opus = make_ogg_opus(channels=2, pre_skip=312, n_frames=48000)
    vorb = make_ogg_vorbis(channels=1, sample_rate=16000, n_frames=8000)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"clip_id": [0, 1], "payload": [opus, vorb],
             "codec": ["opus", "vorbis"]}
        )
    ).withColumn(
        "meta",
        F.struct(
            F.lit("audio").alias("media_type"),
            F.col("codec").alias("codec"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("checksum"),
        ),
    ).drop("codec")
    rows = {r["clip_id"]: r for r in audio_meta(df).collect()}
    assert rows[0]["sample_rate"] == 48000
    assert rows[0]["channels"] == 2
    assert rows[0]["n_frames"] == 48000
    assert rows[0]["duration_ms"] == 1000
    assert rows[1]["sample_rate"] == 16000
    assert rows[1]["n_frames"] == 8000
    assert rows[1]["duration_ms"] == 500
