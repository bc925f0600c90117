"""Dependency-free Y4M video codec (sources/y4m.py) and the real
frame-sampling operator — the video sibling of the PNG/WAV paths."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_editor_spark.sources import y4m as Y


def _frames(w, h, n, cs="420"):
    fb = Y._frame_bytes(w, h, cs)
    return [bytes((i * 31 + j) % 256 for j in range(fb)) for i in range(n)]


@pytest.mark.parametrize("cs", ["420", "422", "444"])
def test_roundtrip_colourspaces(cs):
    fr = _frames(4, 2, 3, cs)
    out = Y.decode_y4m(Y.encode_y4m(4, 2, (30, 1), fr, cs))
    assert out == (4, 2, 30, 1, cs, fr)


def test_header_format_and_empty_clip():
    data = Y.encode_y4m(6, 4, (24, 1), [])
    assert data.startswith(b"YUV4MPEG2 W6 H4 F24:1 ")
    assert Y.decode_y4m(data)[5] == []


def test_bad_inputs_raise():
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        Y.decode_y4m(b"RIFF....")
    with pytest.raises(ValueError, match="expected"):
        Y.encode_y4m(4, 2, (30, 1), [b"short"])
    data = Y.encode_y4m(2, 2, (30, 1), _frames(2, 2, 2))
    with pytest.raises(ValueError, match="truncated"):
        Y.decode_y4m(data[:-1])
    with pytest.raises(NotImplementedError, match="C410"):
        Y.decode_y4m(b"YUV4MPEG2 W2 H2 F30:1 C410\n")


def test_sample_frame_indices_even_spacing():
    assert Y.sample_frame_indices(10, 4) == [1, 3, 6, 8]
    assert Y.sample_frame_indices(2, 4) == [0, 1]  # deduped
    assert Y.sample_frame_indices(1, 3) == [0]
    assert Y.sample_frame_indices(100, 1) == [50]


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 8).map(lambda x: x * 2),
    h=st.integers(1, 8).map(lambda x: x * 2),
    n=st.integers(0, 6),
    cs=st.sampled_from(["420", "422", "444"]),
)
def test_roundtrip_property(w, h, n, cs):
    fr = _frames(w, h, n, cs)
    assert Y.decode_y4m(Y.encode_y4m(w, h, (30, 1), fr, cs)) == (
        w, h, 30, 1, cs, fr
    )


# ---------------------------------------------------------------------------
# Spark wiring
# ---------------------------------------------------------------------------

def test_sample_frames_video_real_checksums(spark):
    from parquet_editor_spark.operators.multimodal import (
        attach_payload,
        sample_frames_video,
    )

    clips = {
        i: _frames(4, 2, 5 + i) for i in range(3)
    }
    rows = [
        (i, Y.encode_y4m(4, 2, (30, 1), fr)) for i, fr in clips.items()
    ]
    df = spark.createDataFrame(rows, "clip_id long, raw binary")
    df = attach_payload(df, "raw", media_type="video", codec="y4m").drop("raw")
    out = sample_frames_video(df, k=3).collect()
    by_clip = {}
    for r in out:
        by_clip.setdefault(r["clip_id"], []).append(r)
    for i, fr in clips.items():
        got = sorted(by_clip[i], key=lambda r: r["frame_idx"])
        idxs = Y.sample_frame_indices(len(fr), 3)
        assert [r["frame_idx"] for r in got] == idxs
        assert all(r["n_frames"] == len(fr) for r in got)
        assert all((r["frame_w"], r["frame_h"]) == (4, 2) for r in got)
        for r, idx in zip(got, idxs):
            assert r["frame_checksum"] == hashlib.md5(fr[idx]).hexdigest()


def test_sample_frames_video_rejects_compressed(spark):
    from parquet_editor_spark.operators.multimodal import (
        attach_payload,
        sample_frames_video,
    )

    df = spark.createDataFrame([(1, "x")], "id long, s string")
    df = attach_payload(df, "s", media_type="video", codec="h264")
    with pytest.raises(Exception) as ei:
        sample_frames_video(df, k=2).collect()
    assert "ffmpeg" in str(ei.value) or "NotImplementedError" in str(ei.value)
