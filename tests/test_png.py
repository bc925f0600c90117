"""Dependency-free PNG codec (sources/png.py) and its wiring into the
multimodal decode/resize operators (r4 verdict item 3: one real format
end-to-end without PIL)."""

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_editor_spark.sources import png as P


def _pixels(w, h, ch):
    return bytes((x * 7 + 13) % 256 for x in range(w * h * ch))


# ---------------------------------------------------------------------------
# pure codec
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_roundtrip_all_color_types(ch):
    w, h = 5, 3
    pix = _pixels(w, h, ch)
    out = P.decode_png(P.encode_png(w, h, ch, pix))
    assert out == (w, h, ch, pix)


def test_known_vector_asymmetric_dims():
    """Hand-checked 2x1 grayscale PNG (w != h catches symmetric
    encode/decode swaps that a round-trip alone would cancel)."""
    data = P.encode_png(2, 1, 1, bytes([10, 200]))
    # IHDR body starts at byte 16: width then height, big-endian
    assert struct.unpack_from(">II", data, 16) == (2, 1)
    w, h, ch, pix = P.decode_png(data)
    assert (w, h, ch) == (2, 1, 1) and pix == bytes([10, 200])


def _png_with_filters(w, h, ch, pix, ftypes):
    """Build a PNG whose scanlines use the given filter types, applying
    each filter's forward transform per the spec so decode must invert."""
    stride = w * ch
    raw = bytearray()
    prev = bytes(stride)
    for y, ftype in enumerate(ftypes):
        line = pix[y * stride : (y + 1) * stride]
        enc = bytearray(line)
        if ftype == 1:  # Sub
            for i in range(stride - 1, ch - 1, -1):
                enc[i] = (enc[i] - line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride - 1, -1, -1):
                left = line[i - ch] if i >= ch else 0
                enc[i] = (enc[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride - 1, -1, -1):
                left = line[i - ch] if i >= ch else 0
                up = prev[i]
                ul = prev[i - ch] if i >= ch else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else up if pb <= pc else ul
                enc[i] = (enc[i] - pred) & 0xFF
        raw.append(ftype)
        raw += enc
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, P._COLOR_TYPE[ch], 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + P._chunk(b"IEND", b"")
    )


def test_decodes_all_five_filters():
    w, h, ch = 4, 5, 3
    pix = _pixels(w, h, ch)
    data = _png_with_filters(w, h, ch, pix, [0, 1, 2, 3, 4])
    assert P.decode_png(data) == (w, h, ch, pix)


def test_crc_corruption_raises():
    data = bytearray(P.encode_png(2, 2, 1, _pixels(2, 2, 1)))
    data[40] ^= 0xFF  # somewhere inside IDAT
    with pytest.raises(ValueError, match="CRC|truncated"):
        P.decode_png(bytes(data))


def test_bad_signature_and_unsupported_features():
    with pytest.raises(ValueError, match="signature"):
        P.decode_png(b"JPEG" * 4)
    # depth 3 is not a legal PNG depth at all
    ihdr = struct.pack(">IIBBBBB", 1, 1, 3, 0, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + P._chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="depth"):
        P.decode_png(data)
    # sub-byte depths pair only with grayscale (spec table 11.1)
    ihdr = struct.pack(">IIBBBBB", 1, 1, 4, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + P._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="grayscale"):
        P.decode_png(data)
    # unknown color type (palette now decodes — see the PLTE test)
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 5, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + P._chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="color type"):
        P.decode_png(data)


def test_encode_validates_buffer():
    with pytest.raises(ValueError, match="bytes"):
        P.encode_png(2, 2, 1, b"abc")
    with pytest.raises(ValueError, match="channels"):
        P.encode_png(1, 1, 5, b"abcde")


def test_ancillary_chunks_skipped():
    data = P.encode_png(2, 2, 1, _pixels(2, 2, 1))
    # splice a tEXt chunk between IHDR and IDAT
    ihdr_end = 8 + 12 + 13
    spliced = (
        data[:ihdr_end]
        + P._chunk(b"tEXt", b"comment\x00hi")
        + data[ihdr_end:]
    )
    assert P.decode_png(spliced)[:3] == (2, 2, 1)


def test_resize_nearest_shapes():
    # 2x2 gray -> 1x1 picks the pixel whose center maps to (0.5,0.5)*2=(1,1)
    pix = bytes([1, 2, 3, 4])
    assert P.resize_nearest(pix, 2, 2, 1, 1, 1) == bytes([4])
    # identity resize is a no-op
    assert P.resize_nearest(pix, 2, 2, 1, 2, 2) == pix
    # upsample 1x1 -> 3x2 replicates
    assert P.resize_nearest(bytes([9]), 1, 1, 1, 3, 2) == bytes([9] * 6)
    # rgb 2x1 -> 4x1 keeps pixel units intact
    rgb = bytes([1, 2, 3, 4, 5, 6])
    assert P.resize_nearest(rgb, 2, 1, 3, 4, 1) == bytes(
        [1, 2, 3, 1, 2, 3, 4, 5, 6, 4, 5, 6]
    )


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    ch=st.sampled_from([1, 2, 3, 4]),
    data=st.data(),
)
def test_roundtrip_property(w, h, ch, data):
    pix = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=w * h * ch,
                max_size=w * h * ch,
            )
        )
    )
    assert P.decode_png(P.encode_png(w, h, ch, pix)) == (w, h, ch, pix)


# ---------------------------------------------------------------------------
# Spark wiring
# ---------------------------------------------------------------------------

def _png_frame(spark):
    from parquet_editor_spark.operators.multimodal import attach_payload

    rows = [
        (i, P.encode_png(3 + i, 2 + 2 * i, 1 + i % 4,
                         _pixels(3 + i, 2 + 2 * i, 1 + i % 4)))
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "img_id long, raw binary")
    return attach_payload(df, "raw", media_type="image", codec="png").drop("raw")


def test_decode_meta_png_real_dimensions(spark):
    from parquet_editor_spark.operators.multimodal import decode_meta

    out = {
        r["img_id"]: (r["width"], r["height"], r["channels"])
        for r in decode_meta(_png_frame(spark)).collect()
    }
    assert out == {i: (3 + i, 2 + 2 * i, 1 + i % 4) for i in range(4)}


def test_resize_images_png_emits_valid_png(spark):
    from parquet_editor_spark.operators.multimodal import resize_images

    out = resize_images(_png_frame(spark), target_w=8, target_h=6).collect()
    assert len(out) == 4
    for r in out:
        w, h, ch, pix = P.decode_png(bytes(r["payload"]))
        assert (w, h) == (8, 6) == (r["width"], r["height"])
        assert len(pix) == 8 * 6 * ch


def test_resize_content_is_nearest_neighbor(spark):
    """Downsample a 4x4 with a known pattern and check exact pixels."""
    from parquet_editor_spark.operators.multimodal import (
        attach_payload,
        resize_images,
    )

    pix = bytes(range(16))  # 4x4 gray, pixel value == index
    df = spark.createDataFrame(
        [(1, P.encode_png(4, 4, 1, pix))], "img_id long, raw binary"
    )
    df = attach_payload(df, "raw", codec="png").drop("raw")
    (row,) = resize_images(df, target_w=2, target_h=2).collect()
    # centers map to source index floor((i+0.5)*4/2) = 1, 3
    assert P.decode_png(bytes(row["payload"]))[3] == bytes(
        [pix[4 * 1 + 1], pix[4 * 1 + 3], pix[4 * 3 + 1], pix[4 * 3 + 3]]
    )


def test_unknown_codec_still_raises(spark):
    """A codec with no dependency-free decoder stays an honest
    NotImplementedError (r8 made jpeg real, r9 made tiff real — the
    example here is heic, whose HEVC payload will never be in
    scope)."""
    from parquet_editor_spark.operators.multimodal import (
        attach_payload,
        decode_meta,
    )

    df = spark.createDataFrame([(1, "x")], "id long, s string")
    df = attach_payload(df, "s", codec="heic")
    with pytest.raises(Exception) as ei:
        decode_meta(df).collect()
    assert "PIL" in str(ei.value) or "NotImplementedError" in str(ei.value)


def test_tiff_invalid_bytes_raise_valueerror(spark):
    """tiff is a REAL codec since r9: a payload without the II/MM
    byte-order mark fails the IFD walk with ValueError."""
    from parquet_editor_spark.operators.multimodal import (
        attach_payload,
        decode_meta,
    )

    df = spark.createDataFrame([(1, "x")], "id long, s string")
    df = attach_payload(df, "s", codec="tiff")
    with pytest.raises(Exception) as ei:
        decode_meta(df).collect()
    assert "not a TIFF" in str(ei.value) or "ValueError" in str(ei.value)


def test_jpeg_invalid_bytes_raise_valueerror(spark):
    """jpeg is a REAL codec since r8: a payload without the SOI marker
    fails the header walk with ValueError, not NotImplementedError."""
    from parquet_editor_spark.operators.multimodal import (
        attach_payload,
        decode_meta,
    )

    df = spark.createDataFrame([(1, "x")], "id long, s string")
    df = attach_payload(df, "s", codec="jpeg")
    with pytest.raises(Exception) as ei:
        decode_meta(df).collect()
    assert "not a JPEG" in str(ei.value) or "ValueError" in str(ei.value)


def test_palette_png_decodes_to_rgb():
    """8-bit palette (type 3) PNGs expand through PLTE to RGB."""
    # hand-build: 3x2 image of palette indices, 4-entry palette
    palette = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  7, 8, 9])
    idx = bytes([0, 1, 2, 3, 0, 1])  # 3x2
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    raw = b"\x00" + idx[:3] + b"\x00" + idx[3:]
    data = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"PLTE", palette)
        + P._chunk(b"IDAT", zlib.compress(raw))
        + P._chunk(b"IEND", b"")
    )
    w, h, ch, pix = P.decode_png(data)
    assert (w, h, ch) == (3, 2, 3)
    expect = b"".join(palette[3 * i : 3 * i + 3] for i in idx)
    assert pix == expect
    # out-of-range index fails loudly
    bad_raw = b"\x00" + bytes([9, 0, 0]) + b"\x00" + idx[3:]
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"PLTE", palette)
        + P._chunk(b"IDAT", zlib.compress(bad_raw))
        + P._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index"):
        P.decode_png(bad)
    # palette with no PLTE chunk fails loudly
    noplte = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(raw))
        + P._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        P.decode_png(noplte)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_roundtrip_16bit(ch):
    """r5 verdict item 4: 16-bit samples (two big-endian bytes each)
    round-trip exactly through decode_png_raw; decode_png's 8-bit view
    is the per-sample high byte (the spec's depth rescale)."""
    import random

    rng = random.Random(16)
    w, h = 7, 5
    px = bytes(rng.randrange(256) for _ in range(w * h * ch * 2))
    png = P.encode_png(w, h, ch, px, depth=16)
    assert P.decode_png_raw(png) == (w, h, ch, 16, px)
    assert P.decode_png(png) == (w, h, ch, px[0::2])


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_roundtrip_subbyte_gray(depth):
    """1/2/4-bit grayscale: encoder packs MSB-first with scanline
    padding; decode_png_raw returns the exact stored values, decode_png
    rescales to 0..255 by 255/(2^d - 1)."""
    import random

    rng = random.Random(depth)
    maxv = (1 << depth) - 1
    for w, h in ((8, 3), (9, 4), (1, 1), (3, 2)):  # incl. non-byte-aligned
        px = bytes(rng.randrange(maxv + 1) for _ in range(w * h))
        png = P.encode_png(w, h, 1, px, depth=depth)
        assert P.decode_png_raw(png) == (w, h, 1, depth, px), (w, h)
        got = P.decode_png(png)
        assert got == (w, h, 1, bytes((v * 255) // maxv for v in px))


def test_16bit_filtered_scanlines_unfilter_with_2byte_bpp():
    """Filters at depth 16 step by bytes-per-pixel = 2*channels; a
    hand-built Sub-filtered 16-bit gray image must reconstruct."""
    w, h = 3, 2
    rows = [[1000, 2000, 3000], [60000, 50, 700]]
    want = b"".join(struct.pack(">H", v) for r in rows for v in r)
    raw = bytearray()
    for r in rows:
        raw.append(1)  # Sub
        vals = b"".join(struct.pack(">H", v) for v in r)
        for i, byte in enumerate(vals):
            left = vals[i - 2] if i >= 2 else 0
            raw.append((byte - left) & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + P._chunk(b"IEND", b"")
    )
    assert P.decode_png_raw(png) == (w, h, 1, 16, want)


def test_encode_validates_depth_combinations():
    with pytest.raises(ValueError, match="grayscale-only"):
        P.encode_png(2, 2, 3, bytes(12), depth=4)
    with pytest.raises(ValueError, match="depth"):
        P.encode_png(2, 2, 1, bytes(4), depth=12)
    with pytest.raises(ValueError, match="exceeds"):
        P.encode_png(2, 2, 1, bytes([5, 0, 0, 0]), depth=2)
    with pytest.raises(ValueError, match="expected"):
        P.encode_png(2, 2, 1, bytes(4), depth=16)  # needs 8 bytes


def test_palette_refuses_raw_but_decodes_view():
    """decode_png_raw is the lossless API — palette images can't
    round-trip through our truecolor encoder, so they are refused there
    while decode_png still returns the expanded RGB view."""
    # 2-bit palette image: 4 entries, 2x2 pixels
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 7, 7])
    raw = bytes([0, 0b01100000, 0, 0b11000000])  # rows: [1,2] [3,0]
    ihdr = struct.pack(">IIBBBBB", 2, 2, 2, 3, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"PLTE", plte)
        + P._chunk(b"IDAT", zlib.compress(raw))
        + P._chunk(b"IEND", b"")
    )
    w, h, ch, px = P.decode_png(png)
    assert (w, h, ch) == (2, 2, 3)
    assert px == bytes([0, 255, 0, 0, 0, 255, 7, 7, 7, 255, 0, 0])
    with pytest.raises(ValueError, match="round-trip"):
        P.decode_png_raw(png)


def _interlace_adam7(px, w, h, ch, depth):
    """Independent test-side Adam7 interlacer (filter 0 scanlines):
    builds the pass-ordered IDAT stream from raw samples so the
    decoder's de-interlacer is checked against straightforwardly
    different code, not against itself."""
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    unit = 2 if depth == 16 else 1
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        cols = list(range(x0, w, dx))
        rows = list(range(y0, h, dy))
        if not cols or not rows:
            continue
        for y in rows:
            raw.append(0)  # filter None
            if depth in (1, 2, 4):
                acc, nbits = 0, 0
                for x in cols:
                    acc = (acc << depth) | px[y * w + x]
                    nbits += depth
                    if nbits == 8:
                        raw.append(acc)
                        acc, nbits = 0, 0
                if nbits:
                    raw.append(acc << (8 - nbits))
            else:
                bs = ch * unit
                for x in cols:
                    raw += px[(y * w + x) * bs : (y * w + x + 1) * bs]
    return bytes(raw)


@pytest.mark.parametrize(
    "w,h,ch,depth",
    [(8, 8, 3, 8), (13, 7, 1, 8), (5, 3, 4, 8), (6, 9, 2, 16),
     (1, 1, 1, 8), (2, 2, 3, 8), (11, 5, 1, 1), (9, 6, 1, 4)],
)
def test_adam7_interlaced_decodes(w, h, ch, depth):
    """r6: Adam7 de-interlacing across sizes that exercise empty
    passes (1x1 has five empty passes), sub-byte packing per pass,
    and 16-bit sample units."""
    import random

    rng = random.Random(w * 100 + h * 10 + depth)
    unit = 2 if depth == 16 else 1
    if depth in (1, 2, 4):
        px = bytes(rng.randrange(1 << depth) for _ in range(w * h))
    else:
        px = bytes(rng.randrange(256) for _ in range(w * h * ch * unit))
    raw = _interlace_adam7(px, w, h, ch, depth)
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch] if depth not in (1, 2, 4) else 0
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 1)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(raw))
        + P._chunk(b"IEND", b"")
    )
    assert P.decode_png_raw(png) == (w, h, ch, depth, px)


def test_adam7_hand_computed_4x4_gray():
    """Spec §8.2 pass order verified by hand on a 4x4 8-bit gray
    image: pass 1 takes (0,0); 4 takes (2,0); 5 takes (0,2),(2,2);
    6 takes (1,0),(3,0),(1,2),(3,2); 7 takes rows 1 and 3 whole."""
    vals = list(range(16))  # pixel (x,y) = y*4+x
    stream = bytearray()
    stream += bytes([0, 0])                       # pass1: (0,0)=0
    stream += bytes([0, 2])                       # pass4: (2,0)=2
    stream += bytes([0, 8, 10])                   # pass5: (0,2),(2,2)
    stream += bytes([0, 1, 3, 0, 9, 11])          # pass6: rows 0,2 odd x
    stream += bytes([0, 4, 5, 6, 7, 0, 12, 13, 14, 15])  # pass7: rows 1,3
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(bytes(stream)))
        + P._chunk(b"IEND", b"")
    )
    assert P.decode_png_raw(png) == (4, 4, 1, 8, bytes(vals))


def test_adam7_truncated_stream_raises():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(bytes([0, 0])))  # pass1 only
        + P._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="truncated interlaced"):
        P.decode_png_raw(png)
