"""EXIF APP1 walk tests — builder/parser round-trips in both byte
orders, absent/partial tags, and the ``image_exif`` Spark stage."""

import pytest

from parquet_editor_spark.operators import multimodal as MM
from parquet_editor_spark.sources.exif import (
    exif_from_jpeg,
    insert_app1,
    make_exif_app1,
)
from parquet_editor_spark.sources.jpeg import jpeg_header_meta, make_jpeg_header

FULL = dict(
    make="MakerX",
    model="Cam-12",
    orientation=6,
    datetime="2024:03:05 10:30:00",
    exif_w=1920,
    exif_h=1080,
    iso=400,
)


@pytest.mark.parametrize("big_endian", [False, True])
def test_roundtrip_both_byte_orders(big_endian):
    j = insert_app1(
        make_jpeg_header(64, 48, 3),
        make_exif_app1(big_endian=big_endian, **FULL),
    )
    got = exif_from_jpeg(j)
    assert got == {
        "make": "MakerX",
        "model": "Cam-12",
        "orientation": 6,
        "datetime": "2024:03:05 10:30:00",
        "exif_w": 1920,
        "exif_h": 1080,
        "iso": 400,
    }
    # splicing APP1 does not disturb the SOF walk
    assert jpeg_header_meta(j) == (64, 48, 3)


def test_no_exif_yields_all_none():
    got = exif_from_jpeg(make_jpeg_header(8, 8, 1))
    assert set(got.values()) == {None}


def test_partial_tags_no_sub_ifd():
    j = insert_app1(
        make_jpeg_header(8, 8, 1), make_exif_app1(make="OnlyMake")
    )
    got = exif_from_jpeg(j)
    assert got["make"] == "OnlyMake"
    assert got["iso"] is None and got["exif_w"] is None


def test_exif_survives_real_pixel_stream():
    import numpy as np

    from parquet_editor_spark.sources.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    qt = (np.full(64, 8, np.int64), np.full(64, 8, np.int64))
    base = encode_jpeg_baseline(16, 8, 1, bytes([77]) * 128, quant_tables=qt)
    j = insert_app1(base, make_exif_app1(model="PixCam", iso=200))
    assert exif_from_jpeg(j)["model"] == "PixCam"
    w, h, ch, pix = decode_jpeg(j)
    assert (w, h, ch) == (16, 8, 1) and set(pix) == {77}


def test_garbage_raises():
    with pytest.raises(ValueError, match="no SOI"):
        exif_from_jpeg(b"not a jpeg")
    # corrupt TIFF block inside APP1 fails loudly
    app1 = make_exif_app1(**FULL)
    bad = bytearray(app1)
    bad[10:12] = b"XX"  # clobber the II/MM byte-order mark
    with pytest.raises(ValueError):
        exif_from_jpeg(insert_app1(make_jpeg_header(8, 8, 1), bytes(bad)))


def test_image_exif_stage(spark):
    rows = [
        (1, insert_app1(make_jpeg_header(10, 10, 3), make_exif_app1(**FULL))),
        (2, make_jpeg_header(10, 10, 3)),
    ]
    df = MM.attach_payload(
        spark.createDataFrame(rows, "id long, raw binary"),
        "raw",
        media_type="image",
        codec="jpeg",
    )
    got = {
        r["id"]: r
        for r in MM.image_exif(df)
        .select("id", "make", "orientation", "taken_at", "iso")
        .collect()
    }
    assert got[1]["make"] == "MakerX" and got[1]["iso"] == 400
    assert got[1]["taken_at"] == "2024:03:05 10:30:00"
    assert got[2]["make"] is None and got[2]["iso"] is None


def test_image_exif_stage_rejects_non_jpeg(spark):
    df = MM.attach_payload(
        spark.createDataFrame([(1, b"x")], "id long, raw binary"),
        "raw",
        media_type="image",
        codec="png",
    )
    with pytest.raises(Exception, match="JPEG/TIFF concept"):
        MM.image_exif(df).collect()
