"""sources/flac.py + sources/mp4.py — header-only audio/video
container metadata (r8).  Same honest scope as the JPEG walker:
authoritative structural fields without decoding a single sample."""

import pytest

from parquet_editor_spark.sources.flac import (
    flac_stream_info,
    make_flac_header,
)
from parquet_editor_spark.sources.mp4 import make_mp4_header, mp4_meta


# ---------------------------------------------------------------------------
# FLAC STREAMINFO
# ---------------------------------------------------------------------------

def test_flac_roundtrip():
    for rate, ch, bits, total in [
        (44100, 2, 16, 123456),
        (8000, 1, 8, 0),
        (192000, 8, 32, (1 << 36) - 1),
        (48000, 6, 24, 1),
    ]:
        assert flac_stream_info(make_flac_header(rate, ch, bits, total)) == (
            rate, ch, bits, total,
        )


def test_flac_rejects_non_flac():
    with pytest.raises(ValueError, match="not a FLAC"):
        flac_stream_info(b"RIFF....WAVE")
    with pytest.raises(ValueError, match="not a FLAC"):
        flac_stream_info(b"")


def test_flac_rejects_wrong_first_block():
    data = bytearray(make_flac_header(44100, 2))
    data[4] = 0x84  # first block claims type 4 (VORBIS_COMMENT)
    with pytest.raises(ValueError, match="STREAMINFO"):
        flac_stream_info(bytes(data))


def test_flac_rejects_truncation():
    data = make_flac_header(44100, 2)
    with pytest.raises(ValueError, match="truncated"):
        flac_stream_info(data[:20])


# ---------------------------------------------------------------------------
# MP4 box walk
# ---------------------------------------------------------------------------

def test_mp4_roundtrip_video():
    dur, scale, n_tracks, w, h = mp4_meta(
        make_mp4_header(65000, 1000, 1920, 1080, n_tracks=2)
    )
    assert (dur, scale, n_tracks, w, h) == (65000, 1000, 2, 1920, 1080)


def test_mp4_audio_only_has_null_dims():
    dur, scale, n_tracks, w, h = mp4_meta(make_mp4_header(1500, 90000))
    assert (dur, n_tracks, w, h) == (1500, 1, None, None)
    assert scale == 90000


def test_mp4_skips_large_mdat_without_parsing():
    """moov AFTER a big mdat: the walk must hop over the media bytes
    by declared size, never scanning them."""
    base = make_mp4_header(2000, 1000, 64, 48)
    ftyp_end = 24  # ftyp box is 8 + 16 bytes
    moov = base[ftyp_end:-8]  # moov box (mdat is the trailing 8 bytes)
    mdat = (10_008).to_bytes(4, "big") + b"mdat" + b"\x00" * 10_000
    reordered = base[:ftyp_end] + mdat + moov
    assert mp4_meta(reordered) == (2000, 1000, 1, 64, 48)


def test_mp4_rejects_non_mp4():
    with pytest.raises(ValueError, match="not an ISO-BMFF"):
        mp4_meta(b"\xff\xd8\xff\xe0" + bytes(20))


def test_mp4_rejects_missing_moov():
    base = make_mp4_header(1000, 1000)
    ftyp_only = base[:24] + (8).to_bytes(4, "big") + b"mdat"
    with pytest.raises(ValueError, match="no moov"):
        mp4_meta(ftyp_only)


def test_mp4_rejects_overrunning_box():
    base = bytearray(make_mp4_header(1000, 1000))
    base[0:4] = (1 << 24).to_bytes(4, "big")  # ftyp claims 16MB
    with pytest.raises(ValueError, match="overruns"):
        mp4_meta(bytes(base))


# ---------------------------------------------------------------------------
# operator routing
# ---------------------------------------------------------------------------

def _media_df(spark, rows, codec, media_type):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        rows, "doc_id long, payload binary"
    ).withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(codec).alias("codec"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("checksum"),
        ),
    )


def test_audio_meta_flac_codec(spark):
    from parquet_editor_spark.operators import multimodal as MM

    df = _media_df(
        spark,
        [(i, make_flac_header(8000 * (i + 1), 1 + i, 16, 4000 * (i + 1)))
         for i in range(3)],
        "flac",
        "audio",
    )
    got = {
        r["doc_id"]: (r["sample_rate"], r["channels"], r["n_frames"],
                      r["duration_ms"])
        for r in MM.audio_meta(df).collect()
    }
    assert got == {
        0: (8000, 1, 4000, 500),
        1: (16000, 2, 8000, 500),
        2: (24000, 3, 12000, 500),
    }


def test_video_meta_mp4_and_y4m(spark):
    from parquet_editor_spark.operators import multimodal as MM
    from parquet_editor_spark.sources.y4m import encode_y4m

    y4m = encode_y4m(
        4, 2, (5, 1), [bytes(4 * 2 * 3) for _ in range(10)], cs="444"
    )
    mp4_rows = _media_df(
        spark, [(0, make_mp4_header(1234, 1000, 320, 240))], "mp4", "video"
    )
    y4m_rows = _media_df(spark, [(1, y4m)], "y4m", "video")
    got = {
        r["doc_id"]: (r["duration_ms"], r["n_tracks"], r["width"],
                      r["height"])
        for r in MM.video_meta(mp4_rows.unionByName(y4m_rows)).collect()
    }
    assert got[0] == (1234, 1, 320, 240)
    assert got[1] == (2000, 1, 4, 2)  # 10 frames @ 5fps = 2000 ms


def test_video_meta_unknown_codec_raises(spark):
    from parquet_editor_spark.operators import multimodal as MM

    # r9: avi became a real container walk — garbage bytes are a
    # ValueError (not an AVI); genuinely-unknown codecs still raise
    # NotImplementedError
    df = _media_df(spark, [(0, b"AVI fakebytes")], "avi", "video")
    with pytest.raises(Exception, match="not an AVI"):
        MM.video_meta(df).collect()
    df2 = _media_df(spark, [(0, b"mkv bytes")], "mkv", "video")
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        MM.video_meta(df2).collect()


def test_mp4_first_video_trak_wins():
    """r8 ADVICE: the old LIFO walk visited traks in reverse, so the
    LAST trak's dims won; FIFO order makes the first video trak
    authoritative as documented."""
    from parquet_editor_spark.sources import mp4 as M

    base_a = M.make_mp4_header(1000, 1000, 64, 48)
    base_b = M.make_mp4_header(1000, 1000, 1920, 1080)
    moov_a, moov_b = base_a[24:-8], base_b[24:-8]
    mvhd_size = int.from_bytes(moov_a[8:12], "big")
    mvhd = moov_a[8 : 8 + mvhd_size]
    trak_a = moov_a[8 + mvhd_size :]
    trak_b = moov_b[8 + mvhd_size :]
    data = base_a[:24] + M._box(b"moov", mvhd + trak_a + trak_b) + base_a[-8:]
    dur, scale, n_tracks, w, h = M.mp4_meta(data)
    assert (n_tracks, w, h) == (2, 64, 48)


def test_mp4_truncated_mvhd_raises_valueerror():
    """r8 ADVICE: a short mvhd payload must be a documented ValueError,
    not an IndexError / silently-wrong duration."""
    from parquet_editor_spark.sources import mp4 as M

    ftyp = M._box(b"ftyp", b"isom" + bytes(4) + b"isomiso2")
    short = ftyp + M._box(b"moov", M._box(b"mvhd", bytes(10)))
    with pytest.raises(ValueError, match="mvhd"):
        M.mp4_meta(short)
    empty = ftyp + M._box(b"moov", M._box(b"mvhd", b""))
    with pytest.raises(ValueError, match="mvhd"):
        M.mp4_meta(empty)


def test_mp4_truncated_tkhd_raises_valueerror():
    from parquet_editor_spark.sources import mp4 as M

    base = M.make_mp4_header(1000, 1000)
    moov = base[24:-8]
    mvhd_size = int.from_bytes(moov[8:12], "big")
    mvhd = moov[8 : 8 + mvhd_size]
    bad = (
        base[:24]
        + M._box(b"moov", mvhd + M._box(b"trak", M._box(b"tkhd", b"")))
        + base[-8:]
    )
    with pytest.raises(ValueError, match="tkhd"):
        M.mp4_meta(bad)


# ------------------------------------------------------------------
# mp4 sample tables + video_frame_index (r9)
# ------------------------------------------------------------------


def test_mp4_sample_index_full_tables():
    """stts/ctts/stsz/stsc/stco/stss across multi-chunk layout, with
    every decoded byte range checked against the actual mdat fill."""
    import numpy as np

    from parquet_editor_spark.sources.mp4 import (
        make_mp4_with_samples,
        mp4_sample_index,
    )

    deltas = [30, 31, 32, 30, 30, 33, 30, 31]
    sizes = [100, 50, 75, 200, 10, 60, 90, 120]
    data = make_mp4_with_samples(
        600, deltas, sizes, sync=[1, 4, 7],
        ctts_offsets=[0, 10, 20, 0, 10, 20, 0, 10],
        samples_per_chunk=3,
    )
    ix = mp4_sample_index(data)
    assert ix["timescale"] == 600 and ix["n_samples"] == 8
    exp_dts = np.concatenate(([0], np.cumsum(deltas)[:-1]))
    assert np.array_equal(ix["dts"], exp_dts)
    assert np.array_equal(
        ix["pts"], exp_dts + [0, 10, 20, 0, 10, 20, 0, 10]
    )
    assert np.array_equal(ix["size"], sizes)
    assert ix["is_sync"].tolist() == [
        True, False, False, True, False, False, True, False,
    ]
    for i in range(8):
        off, s = int(ix["offset"][i]), int(ix["size"][i])
        assert data[off : off + s] == bytes(
            (7 * i + j) % 256 for j in range(s)
        )


def test_mp4_sample_index_defaults_and_single_chunk():
    import numpy as np

    from parquet_editor_spark.sources.mp4 import (
        make_mp4_with_samples,
        mp4_sample_index,
    )

    data = make_mp4_with_samples(1000, [10] * 5, [20] * 5)
    ix = mp4_sample_index(data)
    assert ix["is_sync"].all()  # no stss ⇒ every sample is sync
    assert np.array_equal(ix["pts"], ix["dts"])  # no ctts
    assert np.array_equal(
        ix["offset"], ix["offset"][0] + np.arange(5) * 20
    )


def test_mp4_sample_index_rejects_inconsistent_tables():
    import pytest

    from parquet_editor_spark.sources.mp4 import (
        make_mp4_header,
        make_mp4_with_samples,
        mp4_sample_index,
    )

    # header-only fixture has no video sample tables at all
    with pytest.raises(ValueError, match="sample tables|stbl"):
        mp4_sample_index(make_mp4_header(1000, width=64, height=48))
    # corrupt the stsz count so it disagrees with stts
    good = make_mp4_with_samples(600, [10] * 4, [30] * 4)
    at = good.index(b"stsz") + 4 + 4 + 4  # type + verflags + uniform
    bad = good[:at] + (7).to_bytes(4, "big") + good[at + 4 :]
    with pytest.raises(ValueError, match="stsz count"):
        mp4_sample_index(bad)


def test_video_frame_index_mp4_and_y4m(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from parquet_editor_spark.operators.multimodal import (
        video_frame_index,
    )
    from parquet_editor_spark.sources.mp4 import make_mp4_with_samples
    from parquet_editor_spark.sources.y4m import encode_y4m

    mp4 = make_mp4_with_samples(
        1000, [40, 40, 40, 40], [100, 101, 102, 103], sync=[1, 3],
        samples_per_chunk=2,
    )
    fb = 4 * 2 * 3 // 2  # 4x2 C420 = w*h*1.5 = 12
    y4m_frames = [bytes([i] * 12) for i in range(3)]
    y4m = encode_y4m(4, 2, (25, 1), y4m_frames)
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {"clip_id": [0, 1], "payload": [mp4, y4m],
             "codec": ["mp4", "y4m"]}
        )
    ).withColumn(
        "meta",
        F.struct(
            F.lit("video").alias("media_type"),
            F.col("codec").alias("codec"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("checksum"),
        ),
    ).drop("codec")
    rows = video_frame_index(df).orderBy("clip_id", "frame_idx").collect()
    m = [r for r in rows if r["clip_id"] == 0]
    assert [r["frame_idx"] for r in m] == [0, 1, 2, 3]
    assert [r["dts_ms"] for r in m] == [0, 40, 80, 120]
    assert [r["is_sync"] for r in m] == [True, False, True, False]
    assert [r["frame_bytes"] for r in m] == [100, 101, 102, 103]
    y = [r for r in rows if r["clip_id"] == 1]
    assert [r["frame_idx"] for r in y] == [0, 1, 2]
    assert [r["dts_ms"] for r in y] == [0, 40, 80]
    assert all(r["is_sync"] for r in y)
    # y4m offsets point at the REAL frame bytes
    for r in y:
        off, sz = r["frame_offset"], r["frame_bytes"]
        assert y4m[off : off + sz] == y4m_frames[r["frame_idx"]]
        assert sz == fb

    # keyframes_only keeps just the sync samples
    keys = video_frame_index(df, keyframes_only=True).collect()
    assert sorted(
        (r["clip_id"], r["frame_idx"]) for r in keys
    ) == [(0, 0), (0, 2), (1, 0), (1, 1), (1, 2)]


def test_video_frame_index_unknown_codec_raises(spark):
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    from parquet_editor_spark.operators.multimodal import (
        video_frame_index,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": [0], "payload": [b"xxxx"]})
    ).withColumn(
        "meta",
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("mkv").alias("codec"),
            F.lit(4).cast("long").alias("n_bytes"),
            F.md5("payload").alias("checksum"),
        ),
    )
    with pytest.raises(Exception, match="mkv|ffmpeg"):
        video_frame_index(df).collect()


def test_sample_frames_video_mp4_byte_ranges(spark):
    """mp4 rows sample via the container tables; each checksum is the
    md5 of the sample's REAL mdat byte range."""
    import hashlib

    import pandas as pd
    from pyspark.sql import functions as F

    from parquet_editor_spark.operators.multimodal import (
        sample_frames_video,
    )
    from parquet_editor_spark.sources.mp4 import (
        make_mp4_with_samples,
        mp4_sample_index,
    )

    sizes = [50 + 7 * i for i in range(10)]
    data = make_mp4_with_samples(
        1000, [40] * 10, sizes, samples_per_chunk=3,
        width=320, height=240,
    )
    ix = mp4_sample_index(data)
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": [0], "payload": [data]})
    ).withColumn(
        "meta",
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("mp4").alias("codec"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("checksum"),
        ),
    )
    rows = sample_frames_video(df, k=4).orderBy("frame_idx").collect()
    assert len(rows) == 4
    assert all(r["n_frames"] == 10 for r in rows)
    assert all((r["frame_w"], r["frame_h"]) == (320, 240) for r in rows)
    for r in rows:
        off = int(ix["offset"][r["frame_idx"]])
        sz = int(ix["size"][r["frame_idx"]])
        assert r["frame_checksum"] == hashlib.md5(
            data[off : off + sz]
        ).hexdigest()
