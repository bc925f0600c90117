"""WebP header walk — sources/webp.py + the decode_meta path."""

from __future__ import annotations

import pytest

from parquet_editor_spark.sources.webp import (
    make_webp_extended,
    make_webp_lossless,
    make_webp_lossy,
    webp_meta,
)


def test_vp8_lossy_dims():
    assert webp_meta(make_webp_lossy(640, 480)) == (640, 480, 3)
    assert webp_meta(make_webp_lossy(1, 1)) == (1, 1, 3)
    assert webp_meta(make_webp_lossy(16383, 16383)) == (16383, 16383, 3)


@pytest.mark.parametrize("alpha,ch", [(False, 3), (True, 4)])
def test_vp8l_lossless_dims_and_alpha(alpha, ch):
    assert webp_meta(make_webp_lossless(800, 600, alpha)) == (800, 600, ch)
    # width/height are stored minus one — the 16384 boundary works
    assert webp_meta(make_webp_lossless(16384, 1, alpha)) == (16384, 1, ch)


@pytest.mark.parametrize("alpha,ch", [(False, 3), (True, 4)])
def test_vp8x_extended_dims_and_alpha(alpha, ch):
    assert webp_meta(make_webp_extended(70000, 12, alpha)) == (
        70000, 12, ch,
    )


def test_rejects_non_webp_and_bad_start_code():
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        webp_meta(b"RIFF\x00\x00\x00\x00WAVE")
    bad = bytearray(make_webp_lossy(10, 10))
    at = bad.index(b"\x9d\x01\x2a")
    bad[at] = 0x00
    with pytest.raises(ValueError, match="start code"):
        webp_meta(bytes(bad))
    with pytest.raises(ValueError, match="VP8L signature"):
        lossless = bytearray(make_webp_lossless(10, 10))
        lossless[lossless.index(b"VP8L") + 8] = 0x30
        webp_meta(bytes(lossless))


def test_decode_meta_webp_path_and_pixels_still_gated(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from parquet_editor_spark.operators.multimodal import (
        decode_meta,
        image_pixel_stats,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {"img_id": [0], "payload": [make_webp_lossless(33, 44, True)]}
        )
    ).withColumn(
        "meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("webp").alias("codec"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("checksum"),
        ),
    )
    m = decode_meta(df).collect()[0]
    assert (m["width"], m["height"], m["channels"]) == (33, 44, 4)
    # pixel decode is honestly out of scope (VP8 arithmetic codec)
    with pytest.raises(Exception, match="webp|PIL"):
        image_pixel_stats(df).collect()
