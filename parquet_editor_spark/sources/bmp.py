"""Dependency-free BMP (Windows DIB) codec — uncompressed BI_RGB
tier of the image-format family (r9).

Scope (public BITMAPFILEHEADER/BITMAPINFOHEADER layout):

- DECODE: 8-bit palettized (expanded through the BGRA color table to
  RGB, the ``sources/png.py`` palette convention), 24-bit BGR and
  32-bit BGRA (alpha preserved as RGBA); BI_RGB (compression 0)
  only; bottom-up (positive height) and top-down (negative height)
  row orders; 4-byte row padding.  RLE4/RLE8/bitfields raise
  ``NotImplementedError``.
- ENCODE: grayscale (8-bit with a gray ramp palette) and RGB
  (24-bit) fixtures.

Pure functions over ``bytes``; Spark wiring lives in
``operators/multimodal.py``.
"""

from __future__ import annotations

import struct


def bmp_meta(data: bytes, origin: str = "<bytes>") -> tuple[int, int, int]:
    """(width, height, channels) from the headers alone — O(1), no
    pixel walk; channels follows the decode convention (palette and
    24-bit → 3, 32-bit → 4)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError(f"{origin!r} is not a BMP stream")
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    if w <= 0 or h == 0:
        raise ValueError(f"{origin!r}: bad dimensions {w}x{h}")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP (8/24/32 only)")
    return w, -h if h < 0 else h, 4 if bpp == 32 else 3


def decode_bmp(data: bytes, origin: str = "<bytes>") -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) — pixels are top-down
    interleaved rows, RGB for palette/24-bit sources, RGBA for
    32-bit."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError(f"{origin!r} is not a BMP stream")
    data_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError(
            f"BITMAPCOREHEADER ({hdr_size}-byte DIB header)"
        )
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    comp = struct.unpack_from("<I", data, 30)[0]
    colors_used = struct.unpack_from("<I", data, 46)[0]
    if planes != 1:
        raise ValueError(f"{origin!r}: planes must be 1, got {planes}")
    if comp != 0:
        raise NotImplementedError(
            f"BMP compression {comp} (BI_RGB/uncompressed only)"
        )
    if w <= 0 or h == 0:
        raise ValueError(f"{origin!r}: bad dimensions {w}x{h}")
    top_down = h < 0
    height = -h if top_down else h
    if bpp == 8:
        n_colors = colors_used or 256
        pal_at = 14 + hdr_size
        pal = data[pal_at : pal_at + 4 * n_colors]
        if len(pal) < 4 * n_colors:
            raise ValueError(f"{origin!r}: truncated color table")
        row_stride = (w + 3) & ~3
        out = bytearray(w * height * 3)
        for y in range(height):
            src_y = y if top_down else height - 1 - y
            row = data[data_off + src_y * row_stride :][:w]
            if len(row) < w:
                raise ValueError(f"{origin!r}: truncated pixel data")
            for x, idx in enumerate(row):
                if idx >= n_colors:
                    raise ValueError(
                        f"{origin!r}: palette index {idx} out of range"
                    )
                b, g, r = pal[4 * idx], pal[4 * idx + 1], pal[4 * idx + 2]
                o = (y * w + x) * 3
                out[o], out[o + 1], out[o + 2] = r, g, b
        return w, height, 3, bytes(out)
    if bpp in (24, 32):
        nch = bpp // 8
        row_stride = (w * nch + 3) & ~3
        out_ch = 3 if bpp == 24 else 4
        out = bytearray(w * height * out_ch)
        for y in range(height):
            src_y = y if top_down else height - 1 - y
            row = data[data_off + src_y * row_stride :][: w * nch]
            if len(row) < w * nch:
                raise ValueError(f"{origin!r}: truncated pixel data")
            for x in range(w):
                o = (y * w + x) * out_ch
                p = x * nch
                out[o] = row[p + 2]  # R (file stores BGR[A])
                out[o + 1] = row[p + 1]
                out[o + 2] = row[p]
                if out_ch == 4:
                    out[o + 3] = row[p + 3]
        return w, height, out_ch, bytes(out)
    raise NotImplementedError(f"{bpp}-bit BMP (8/24/32 only)")


def encode_bmp(
    width: int, height: int, channels: int, pixels: bytes
) -> bytes:
    """Serialize top-down rows (gray or RGB) as a bottom-up BI_RGB
    BMP — gray becomes 8-bit with a 256-entry gray-ramp palette, RGB
    becomes 24-bit BGR."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if width < 1 or height < 1:
        raise ValueError("empty image")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer {len(pixels)} B != {width}x{height}x{channels}"
        )
    if channels == 1:
        pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
        row_stride = (width + 3) & ~3
        rows = bytearray()
        for y in range(height - 1, -1, -1):  # bottom-up
            row = pixels[y * width : (y + 1) * width]
            rows += row + bytes(row_stride - width)
        bpp, extra = 8, pal
    else:
        row_stride = (width * 3 + 3) & ~3
        rows = bytearray()
        for y in range(height - 1, -1, -1):
            row = bytearray()
            for x in range(width):
                p = (y * width + x) * 3
                row += bytes((pixels[p + 2], pixels[p + 1], pixels[p]))
            rows += row + bytes(row_stride - width * 3)
        bpp, extra = 24, b""
    data_off = 14 + 40 + len(extra)
    dib = struct.pack(
        "<IiiHHIIiiII",
        40,
        width,
        height,  # positive: bottom-up
        1,
        bpp,
        0,  # BI_RGB
        len(rows),
        2835,
        2835,
        256 if bpp == 8 else 0,
        0,
    )
    hdr = b"BM" + struct.pack(
        "<IHHI", data_off + len(rows), 0, 0, data_off
    )
    return hdr + dib + extra + bytes(rows)
