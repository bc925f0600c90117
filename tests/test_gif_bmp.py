"""sources/gif.py + sources/bmp.py — the lossless palette/raw tier of
the image-format family (r9).  GIF exercises real LZW (variable-width
codes, table resets, interlace); BMP exercises row padding, BGR order
and both row directions."""

import struct

import numpy as np
import pytest

from parquet_editor_spark.sources.bmp import bmp_meta, decode_bmp, encode_bmp
from parquet_editor_spark.sources.gif import (
    decode_gif,
    encode_gif,
    gif_meta,
)


def _gray3(pix: bytes) -> bytes:
    return b"".join(bytes([v, v, v]) for v in pix)


def test_gif_gray_roundtrip_lossless():
    rng = np.random.RandomState(6)
    for w, h in [(1, 1), (5, 3), (23, 17), (200, 90)]:
        pix = bytes(rng.randint(0, 256, w * h).astype(np.uint8))
        g = encode_gif(w, h, 1, pix)
        assert decode_gif(g) == (w, h, 3, _gray3(pix))
        assert gif_meta(g) == (w, h, 1)
    # 200x90 random = 18k pixels: the 4096-entry LZW table reset path


def test_gif_rgb_roundtrip_and_compression():
    pix = b"".join(
        bytes([(i % 7) * 30, (i % 5) * 50, (i % 3) * 80])
        for i in range(40 * 30)
    )
    g = encode_gif(40, 30, 3, pix)
    assert decode_gif(g) == (40, 30, 3, pix)
    assert len(g) < 40 * 30 * 3  # LZW actually compresses


def test_gif_interlace_roundtrip():
    rng = np.random.RandomState(1)
    for h in (1, 2, 5, 13, 16):
        pix = bytes(rng.randint(0, 256, 16 * h).astype(np.uint8))
        g = encode_gif(16, h, 1, pix, interlace=True)
        assert decode_gif(g)[3] == _gray3(pix), h


_IMG_AT = 13 + 768  # signature+LSD (13) + 256-entry gray palette


def test_gif_meta_counts_animation_frames():
    """gif_meta walks every image block without LZW work."""
    a = encode_gif(7, 5, 1, bytes(35))
    # splice the image block of a second gif before the trailer
    b = encode_gif(7, 5, 1, bytes(range(35)))
    assert a[_IMG_AT] == 0x2C and b[_IMG_AT] == 0x2C  # descriptor here
    img_b = b[_IMG_AT:-1]  # descriptor..sub-blocks (no trailer)
    anim = a[:-1] + img_b + b"\x3b"
    assert gif_meta(anim) == (7, 5, 2)
    # decode returns the FIRST frame
    assert decode_gif(anim)[3] == _gray3(bytes(35))


def test_gif_skips_extensions():
    g = encode_gif(3, 2, 1, bytes(6))
    # graphic control extension before the image descriptor
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
    spliced = g[:_IMG_AT] + gce + g[_IMG_AT:]
    assert gif_meta(spliced) == (3, 2, 1)
    assert decode_gif(spliced)[3] == _gray3(bytes(6))


def test_gif_error_paths():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"BM" + bytes(60))
    g = encode_gif(4, 4, 1, bytes(16))
    with pytest.raises(ValueError):
        decode_gif(g[: len(g) // 2])
    with pytest.raises(ValueError, match="256 distinct"):
        encode_gif(
            300, 1, 3,
            b"".join(bytes([i % 256, i // 256, 0]) for i in range(300)),
        )


def test_bmp_gray_and_rgb_roundtrip():
    pix = bytes((i * 7) % 256 for i in range(5 * 3))
    assert decode_bmp(encode_bmp(5, 3, 1, pix)) == (5, 3, 3, _gray3(pix))
    rgb = bytes((i * 11 + 5) % 256 for i in range(7 * 4 * 3))
    bmp = encode_bmp(7, 4, 3, rgb)  # width 7: stride padding exercised
    assert decode_bmp(bmp) == (7, 4, 3, rgb)
    assert bmp_meta(bmp) == (7, 4, 3)


def test_bmp_top_down_rows():
    rgb = bytes((i * 11 + 5) % 256 for i in range(7 * 4 * 3))
    bmp = bytearray(encode_bmp(7, 4, 3, rgb))
    struct.pack_into("<i", bmp, 22, -4)
    rows = [rgb[y * 21 : (y + 1) * 21] for y in range(4)]
    assert decode_bmp(bytes(bmp))[3] == b"".join(reversed(rows))
    assert bmp_meta(bytes(bmp)) == (7, 4, 3)


def test_bmp_error_paths():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"GIF89a" + bytes(60))
    bmp = bytearray(encode_bmp(4, 4, 3, bytes(48)))
    struct.pack_into("<I", bmp, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(bytes(bmp))
    bmp = bytearray(encode_bmp(4, 4, 3, bytes(48)))
    struct.pack_into("<H", bmp, 28, 16)  # 16-bit
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_bmp(bytes(bmp))


def _frame(spark, payload: bytes, codec: str):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [(1, payload)], "doc_id long, payload binary"
    ).withColumn(
        "meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit(codec).alias("codec"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("checksum"),
        ),
    )


def test_gif_bmp_through_decode_meta_and_pixel_stats(spark):
    from parquet_editor_spark.operators.multimodal import (
        decode_meta,
        image_pixel_stats,
    )

    pix = bytes(range(6 * 4))
    for codec, payload in [
        ("gif", encode_gif(6, 4, 1, pix)),
        ("bmp", encode_bmp(6, 4, 1, pix)),
    ]:
        (row,) = decode_meta(_frame(spark, payload, codec)).collect()
        assert (row["width"], row["height"], row["channels"]) == (6, 4, 3)
        (row,) = image_pixel_stats(_frame(spark, payload, codec)).collect()
        assert (row["px_min"], row["px_max"]) == (0, 23)
        assert row["px_sum"] == 3 * sum(pix) and row["n_px"] == 6 * 4 * 3


def test_gif_bmp_resize_real(spark):
    from parquet_editor_spark.operators.multimodal import resize_images

    pix = bytes(range(16))  # 4x4 gray, value == index
    want = _gray3(bytes([pix[5], pix[7], pix[13], pix[15]]))
    for codec, payload, dec in [
        ("gif", encode_gif(4, 4, 1, pix), decode_gif),
        ("bmp", encode_bmp(4, 4, 1, pix), decode_bmp),
    ]:
        (row,) = resize_images(
            _frame(spark, payload, codec), target_w=2, target_h=2
        ).collect()
        assert dec(bytes(row["payload"]))[3] == want, codec


def test_gif_frame_rect_must_fit_logical_screen():
    """Regression (r10): a frame descriptor whose rectangle exceeds the
    logical screen must raise, not silently write pixels into wrong
    rows (and past the buffer, where bytearray slice-assign APPENDS,
    breaking downstream reshape(h, w, ch))."""
    g = bytearray(encode_gif(4, 4, 1, bytes(16)))
    at = g.index(b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 4))
    assert struct.unpack_from("<HHHH", g, at + 1) == (0, 0, 4, 4)
    for left, top, fw, fh in [(0, 0, 5, 4), (0, 0, 4, 5), (2, 0, 4, 4), (0, 3, 4, 2)]:
        bad = bytearray(g)
        struct.pack_into("<HHHH", bad, at + 1, left, top, fw, fh)
        with pytest.raises(ValueError, match="exceeds"):
            decode_gif(bytes(bad))
    # untampered control still decodes
    assert decode_gif(bytes(g))[:3] == (4, 4, 3)
