"""AVI/MJPEG container + pixel-level video stage tests.

Covers the pure codec (``sources/avi.py``: RIFF walk, avih/strh
timing, movi chunk extraction, padding) and the Spark stages that
ride on it (``video_meta``, ``video_frame_index``,
``sample_frames_video``, ``video_frame_stats``,
``video_scene_cuts``)."""

import hashlib

import numpy as np
import pytest

from parquet_editor_spark.operators import multimodal as MM
from parquet_editor_spark.sources.avi import (
    avi_meta,
    avi_video_chunks,
    avi_video_frames,
    avi_video_timing,
    encode_avi_mjpeg,
)
from parquet_editor_spark.sources.jpeg_codec import (
    decode_jpeg,
    encode_jpeg_baseline,
)

QT8 = (np.full(64, 8, np.int64), np.full(64, 8, np.int64))


def _gray_jpeg(w, h, v):
    return encode_jpeg_baseline(w, h, 1, bytes([v]) * (w * h), quant_tables=QT8)


def _clip(w=24, h=16, fps=(30, 1), values=(10, 10, 200)):
    return encode_avi_mjpeg(w, h, fps, [_gray_jpeg(w, h, v) for v in values])


def test_avi_meta_and_timing():
    avi = _clip(fps=(30001, 1000), values=(1, 2, 3, 4))
    dur, n_streams, w, h, n = avi_meta(avi)
    assert (n_streams, w, h, n) == (1, 24, 16, 4)
    assert dur == 4 * 1000 * 1000 // 30001  # n*scale*1000//rate
    assert avi_video_timing(avi) == (1000, 30001)


def test_avi_frames_roundtrip_including_odd_sizes():
    frames = [_gray_jpeg(24, 16, v) for v in (0, 255)]
    frames.append(b"\xff\xd8" + b"x" * 3 + b"\xff\xd9")  # odd length
    avi = encode_avi_mjpeg(24, 16, (25, 1), frames)
    assert avi_video_frames(avi) == frames
    # chunk offsets index into the file verbatim
    for (off, size), f in zip(avi_video_chunks(avi), frames):
        assert avi[off : off + size] == f


def test_avi_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="not an AVI"):
        avi_meta(b"RIFFxxxxWAVE")
    avi = _clip()
    with pytest.raises(ValueError):
        avi_meta(avi[:40])  # truncated inside hdrl
    # a chunk that declares a size past its parent fails loudly
    bad = bytearray(avi)
    bad[16:20] = (2**31).to_bytes(4, "little")
    with pytest.raises(ValueError, match="overruns"):
        avi_meta(bytes(bad))


def test_decoded_constant_frames_are_exact():
    # DC quant step 8 makes flat fields lossless through the JPEG
    # codec — the closed-form hook every AVI fixture leans on
    for v in (0, 7, 128, 201, 255):
        w, h, ch, pix = decode_jpeg(_gray_jpeg(24, 16, v))
        assert (w, h, ch) == (24, 16, 1)
        assert set(pix) == {v}


def _payload_df(spark, avi_bytes):
    df = spark.createDataFrame([(1, avi_bytes)], "id long, raw binary")
    return MM.attach_payload(df, "raw", media_type="video", codec="avi")


def test_video_meta_stage_avi(spark):
    out = MM.video_meta(_payload_df(spark, _clip())).select(
        "duration_ms", "n_tracks", "width", "height"
    ).first()
    assert tuple(out) == (100, 1, 24, 16)  # 3 frames @30fps → 100 ms


def test_video_frame_index_stage_avi(spark):
    avi = _clip(fps=(30, 1), values=(9, 9, 9, 9))
    rows = (
        MM.video_frame_index(_payload_df(spark, avi))
        .orderBy("frame_idx")
        .collect()
    )
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    assert [r["dts_ms"] for r in rows] == [0, 33, 66, 100]
    assert all(r["is_sync"] for r in rows)  # MJPEG is all keyframes
    chunks = avi_video_chunks(avi)
    assert [(r["frame_offset"], r["frame_bytes"]) for r in rows] == chunks


def test_sample_frames_video_avi_checksums_coded_bytes(spark):
    frames = [_gray_jpeg(24, 16, v) for v in (10, 20, 30, 40, 50)]
    avi = encode_avi_mjpeg(24, 16, (25, 1), frames)
    rows = (
        MM.sample_frames_video(_payload_df(spark, avi), k=2)
        .orderBy("frame_idx")
        .collect()
    )
    # nearest convention: floor((i+0.5)*5/2) → frames 1 and 3
    assert [r["frame_idx"] for r in rows] == [1, 3]
    assert rows[0]["frame_checksum"] == hashlib.md5(frames[1]).hexdigest()
    assert rows[1]["frame_checksum"] == hashlib.md5(frames[3]).hexdigest()
    assert rows[0]["n_frames"] == 5
    assert (rows[0]["frame_w"], rows[0]["frame_h"]) == (24, 16)


def test_video_frame_stats_avi_exact(spark):
    avi = _clip(values=(10, 200, 201))
    rows = (
        MM.video_frame_stats(_payload_df(spark, avi), k=3)
        .orderBy("frame_idx")
        .collect()
    )
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    for r, v in zip(rows, (10, 200, 201)):
        assert (r["px_min"], r["px_max"]) == (v, v)
        assert r["px_sum"] == v * 24 * 16
        assert r["n_px"] == 24 * 16


def test_video_scene_cuts_avi_and_y4m(spark):
    # AVI: scenes [10,10,200,200] → cut only at frame 2
    avi = _clip(values=(10, 10, 200, 200))
    rows = (
        MM.video_scene_cuts(_payload_df(spark, avi), threshold=16)
        .orderBy("frame_idx")
        .collect()
    )
    assert [(r["frame_idx"], r["diff_sum"], r["is_cut"]) for r in rows] == [
        (1, 0, False),
        (2, 190 * 24 * 16, True),
        (3, 0, False),
    ]
    # Y4M: raw planar frames, 4:2:0 — diff over the whole YUV buffer
    from parquet_editor_spark.sources.y4m import encode_y4m

    fb = 8 * 6 * 3 // 2
    y4m = encode_y4m(
        8, 6, (25, 1), [bytes([a]) * fb for a in (5, 5, 250)]
    )
    df = MM.attach_payload(
        spark.createDataFrame([(1, y4m)], "id long, raw binary"),
        "raw",
        media_type="video",
        codec="y4m",
    )
    rows = (
        MM.video_scene_cuts(df, threshold=100).orderBy("frame_idx").collect()
    )
    assert [(r["frame_idx"], r["diff_sum"], r["is_cut"]) for r in rows] == [
        (1, 0, False),
        (2, 245 * fb, True),
    ]
    assert all(r["n_px"] == fb for r in rows)


def test_video_pixel_stages_reject_inter_coded(spark):
    with pytest.raises(Exception, match="ffmpeg"):
        MM.video_frame_stats(
            MM.attach_payload(
                spark.createDataFrame([(1, b"x")], "id long, raw binary"),
                "raw",
                media_type="video",
                codec="mp4",
            )
        ).collect()
