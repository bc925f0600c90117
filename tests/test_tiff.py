"""TIFF codec tests — sources/tiff.py.

Round-trips over noise (both byte orders, all three compressions,
multi-strip) plus decoder-only vectors: the Apple TN1023 PackBits
example and hand-packed TIFF-LZW code sequences with independently
known expansions (including the kwkwk self-reference case).
"""

from __future__ import annotations

import numpy as np
import pytest

from parquet_editor_spark.sources.tiff import (
    _lzw_decode_msb,
    _unpackbits,
    decode_tiff,
    encode_tiff,
    tiff_meta,
)


@pytest.mark.parametrize("ch", [1, 3, 4])
@pytest.mark.parametrize("comp", [1, 32773, 5])
@pytest.mark.parametrize("big_endian", [False, True])
def test_roundtrip_noise(ch, comp, big_endian):
    rng = np.random.RandomState(ch * 31 + comp)
    w, h = 29, 13
    pix = rng.randint(0, 256, w * h * ch).astype(np.uint8).tobytes()
    t = encode_tiff(w, h, ch, pix, compression=comp,
                    rows_per_strip=4, big_endian=big_endian)
    assert decode_tiff(t) == (w, h, ch, pix)
    assert tiff_meta(t) == (w, h, ch)


def test_lzw_crosses_width_changes_and_table_reset():
    """12k random bytes push the code width through 10/11/12 bits and
    past the 4094 table-reset point."""
    rng = np.random.RandomState(7)
    pix = rng.randint(0, 256, 12000).astype(np.uint8).tobytes()
    t = encode_tiff(100, 120, 1, pix, compression=5)
    assert decode_tiff(t)[3] == pix


def test_packbits_apple_tn1023_vector():
    src = bytes.fromhex("FEAA 028000 2AFD AA03 8000 2A22 F7AA".replace(" ", ""))
    want = (
        b"\xaa\xaa\xaa" + b"\x80\x00\x2a" + b"\xaa\xaa\xaa\xaa"
        + b"\x80\x00\x2a\x22" + b"\xaa" * 10
    )
    assert _unpackbits(src, len(want), "t") == want


def _pack_msb(codes, width=9):
    acc = bits = 0
    out = bytearray()
    for c in codes:
        acc = (acc << width) | c
        bits += width
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def test_lzw_hand_packed_basic():
    # CLEAR, 'a', 'b', 258('ab'), EOI → "abab"
    src = _pack_msb([256, 97, 98, 258, 257])
    assert _lzw_decode_msb(src, 4, "t") == b"abab"


def test_lzw_hand_packed_kwkwk_case():
    # CLEAR, 'a', 258 (not yet in table → prev+prev[0]) , EOI → "aaa"
    src = _pack_msb([256, 97, 258, 257])
    assert _lzw_decode_msb(src, 3, "t") == b"aaa"


def test_lzw_rejects_out_of_range_code():
    src = _pack_msb([256, 97, 300, 257])
    with pytest.raises(ValueError, match="out of range"):
        _lzw_decode_msb(src, 10, "t")


def test_photometric_zero_inverts():
    """WhiteIsZero images come back inverted to black-is-zero."""
    pix = bytes(range(16))
    t = bytearray(encode_tiff(4, 4, 1, pix))
    # flip the photometric tag value 1 → 0 (find tag 262 in the IFD)
    import struct

    n = struct.unpack_from("<H", t, 8)[0]
    for i in range(n):
        at = 10 + 12 * i
        if struct.unpack_from("<H", t, at)[0] == 262:
            struct.pack_into("<H", t, at + 8, 0)
    assert decode_tiff(bytes(t))[3] == bytes(255 - b for b in pix)


def test_rejects_non_tiff_truncated_and_unsupported():
    with pytest.raises(ValueError, match="II/MM"):
        decode_tiff(b"PK\x03\x04" + bytes(20))
    good = encode_tiff(8, 8, 1, bytes(64))
    with pytest.raises(ValueError):
        decode_tiff(good[:30])
    # 16-bit BitsPerSample → NotImplementedError
    t = bytearray(good)
    import struct

    n = struct.unpack_from("<H", t, 8)[0]
    for i in range(n):
        at = 10 + 12 * i
        if struct.unpack_from("<H", t, at)[0] == 258:
            struct.pack_into("<H", t, at + 8, 16)
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_tiff(bytes(t))


def test_decode_meta_and_pixel_stats_tiff_path(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from parquet_editor_spark.operators.multimodal import (
        decode_meta,
        image_pixel_stats,
    )

    pix = bytes([10, 250, 0, 130, 7, 99])
    t = encode_tiff(3, 2, 1, pix, compression=32773)
    df = spark.createDataFrame(
        pd.DataFrame({"img_id": [0], "payload": [t]})
    ).withColumn(
        "meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("tiff").alias("codec"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("checksum"),
        ),
    )
    m = decode_meta(df).collect()[0]
    assert (m["width"], m["height"], m["channels"]) == (3, 2, 1)
    s = image_pixel_stats(df).collect()[0]
    assert (s["px_min"], s["px_max"], s["px_sum"], s["n_px"]) == (
        0, 250, sum(pix), 6,
    )
