"""sources/mp3.py — MPEG Layer III frame-header walk (r9 verdict
item 6).  Same honest scope as the JPEG/FLAC walkers: header-only,
payloads skipped by declared size, no audio decode."""

import pytest

from parquet_editor_spark.sources.mp3 import make_mp3, mp3_stream_info


def test_mp3_cbr_roundtrip_all_versions():
    # (rate, expected samples-per-frame): MPEG-1 1152, MPEG-2/2.5 576
    for rate, spf, kbps in [
        (44100, 1152, 128), (48000, 1152, 320), (32000, 1152, 32),
        (22050, 576, 64), (24000, 576, 8), (16000, 576, 160),
        (11025, 576, 40), (12000, 576, 16), (8000, 576, 24),
    ]:
        for ch in (1, 2):
            data = make_mp3(rate, ch, n_frames=5, bitrate_kbps=kbps)
            assert mp3_stream_info(data) == (rate, ch, 5 * spf, 5, kbps)


def test_mp3_padding_bit_changes_frame_stride():
    plain = make_mp3(44100, 2, n_frames=4, bitrate_kbps=128)
    padded = make_mp3(
        44100, 2, n_frames=4, bitrate_kbps=128, pad_alternate=True
    )
    assert len(padded) == len(plain) + 2  # frames 1 and 3 carry +1 slot
    assert mp3_stream_info(padded) == mp3_stream_info(plain)


def test_mp3_id3v2_and_id3v1_tags_skipped():
    data = make_mp3(
        22050, 1, n_frames=3, bitrate_kbps=48,
        id3v2_bytes=777, id3v1=True,
    )
    assert data[:3] == b"ID3" and data[-128:-125] == b"TAG"
    assert mp3_stream_info(data) == (22050, 1, 3 * 576, 3, 48)


def test_mp3_vbr_average_bitrate():
    a = make_mp3(44100, 2, 3, 128)
    b = make_mp3(44100, 2, 1, 320)
    rate, ch, samples, frames, kbps = mp3_stream_info(a + b)
    assert (rate, ch, samples, frames) == (44100, 2, 4 * 1152, 4)
    assert kbps == (128 * 3 + 320) // 4


def test_mp3_rejects_non_mp3():
    with pytest.raises(ValueError, match="not an MP3"):
        mp3_stream_info(b"RIFFxxxxWAVE" + bytes(8))
    with pytest.raises(ValueError, match="no MP3 frames"):
        mp3_stream_info(b"")


def test_mp3_rejects_truncated_final_frame():
    data = make_mp3(44100, 2, n_frames=2, bitrate_kbps=128)
    with pytest.raises(ValueError, match="truncated final frame"):
        mp3_stream_info(data[:-10])


def test_mp3_rejects_midstream_garbage():
    data = bytearray(make_mp3(44100, 2, n_frames=2, bitrate_kbps=128))
    frame_len = 144 * 128000 // 44100
    data[frame_len] = 0x00  # clobber second frame's sync byte
    with pytest.raises(ValueError, match="lost sync after frame 1"):
        mp3_stream_info(bytes(data))


def test_mp3_rejects_rate_change_between_frames():
    a = make_mp3(44100, 2, 1, 128)
    b = make_mp3(48000, 2, 1, 128)
    with pytest.raises(ValueError, match="rate/channel change"):
        mp3_stream_info(a + b)


def test_mp3_rejects_layer_ii_and_free_format():
    data = bytearray(make_mp3(44100, 2, 1, 128))
    data[1] = (data[1] & ~0x06) | (2 << 1)  # layer II bits
    with pytest.raises(ValueError, match="Layer II"):
        mp3_stream_info(bytes(data))
    data = bytearray(make_mp3(44100, 2, 1, 128))
    data[2] &= 0x0F  # bitrate index 0 = free format
    with pytest.raises(ValueError, match="free-format"):
        mp3_stream_info(bytes(data))


def test_mp3_audio_meta_stage(spark):
    """Production audio_meta routing for codec='mp3' (Arrow
    mapInPandas, executor-side frame walk)."""
    from pyspark.sql import functions as F

    from parquet_editor_spark.operators import multimodal as MM

    rows = [
        (1, make_mp3(44100, 2, 10, 128)),
        (2, make_mp3(16000, 1, 4, 64, id3v2_bytes=100)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").withColumn(
        "meta",
        F.struct(
            F.lit("audio").alias("media_type"),
            F.lit("mp3").alias("codec"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("checksum"),
        ),
    )
    out = {r["doc_id"]: r for r in MM.audio_meta(df).collect()}
    assert out[1]["sample_rate"] == 44100 and out[1]["channels"] == 2
    assert out[1]["n_frames"] == 11520
    assert out[1]["duration_ms"] == 11520 * 1000 // 44100
    assert out[2]["sample_rate"] == 16000 and out[2]["n_frames"] == 4 * 576
