"""Dependency-free GIF codec — LZW decode/encode from the public
GIF87a/89a specification (r9).

Scope:

- DECODE: first frame to RGB through the global/local color table,
  variable-width LSB-first LZW with table resets, interlaced row
  order, extension-block skipping; ``gif_meta`` additionally walks
  EVERY frame's descriptor + data sub-blocks (without LZW work) to
  count frames — the animation signal a curation pipeline filters
  on.  Transparency indices render as their palette color (single-
  frame compositing semantics are out of scope and documented).
- ENCODE: single-frame fixtures — grayscale (gray-ramp palette) or
  RGB with ≤256 distinct colors (exact palette, no quantization),
  real LZW with the standard code-width growth and 4096-entry reset.

Pure functions over ``bytes``; Spark wiring lives in
``operators/multimodal.py``.
"""

from __future__ import annotations

import struct


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(mcs: int, data: bytes, origin: str) -> bytes:
    """GIF-variant LZW: LSB-first variable-width codes."""
    if not 2 <= mcs <= 8:
        raise ValueError(f"{origin!r}: LZW min code size {mcs}")
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    table: list[bytes] = []
    width = mcs + 1
    prev: bytes | None = None
    acc = n_bits = 0
    pos = 0

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = mcs + 1
        prev = None

    reset()
    while True:
        while n_bits < width:
            if pos >= len(data):
                raise ValueError(f"{origin!r}: LZW stream truncated")
            acc |= data[pos] << n_bits
            n_bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        if code == clear:
            reset()
            continue
        if code == end:
            return bytes(out)
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"{origin!r}: invalid LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def _lzw_encode(mcs: int, indices: bytes) -> bytes:
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int, width: int):
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = mcs + 1
    emit(clear, width)
    w = b""
    for b in indices:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        # the decoder trails one table entry behind, so its width bump
        # (at table length == 1<<width) coincides with next_code
        # reaching (1<<width) + 1 here
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = mcs + 1
        w = c
    if w:
        emit(table[w], width)
    emit(end, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _sub_blocks(data: bytes, pos: int, origin: str) -> tuple[bytes, int]:
    """Concatenate length-prefixed sub-blocks; returns (payload, pos
    after the 0 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError(f"{origin!r}: unterminated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        if pos + n > len(data):
            raise ValueError(f"{origin!r}: truncated sub-block")
        pos += n


def _skip_sub_blocks(data: bytes, pos: int, origin: str) -> int:
    while True:
        if pos >= len(data):
            raise ValueError(f"{origin!r}: unterminated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def _screen(data: bytes, origin: str):
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError(f"{origin!r} is not a GIF stream")
    w, h = struct.unpack_from("<HH", data, 6)
    flags = data[10]
    pos = 13
    gct = b""
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = data[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError(f"{origin!r}: truncated global color table")
        pos += 3 * n
    return w, h, gct, pos


def gif_meta(data: bytes, origin: str = "<bytes>") -> tuple[int, int, int]:
    """(width, height, n_frames) — every frame's descriptor walked,
    no LZW work (sub-blocks skipped by their declared lengths)."""
    w, h, _gct, pos = _screen(data, origin)
    n_frames = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos = _skip_sub_blocks(data, pos + 1, origin)
        elif block == 0x2C:
            if pos + 9 > len(data):
                raise ValueError(f"{origin!r}: truncated image descriptor")
            iflags = data[pos + 8]
            pos += 9
            if iflags & 0x80:
                pos += 3 * (2 << (iflags & 7))
            pos = _skip_sub_blocks(data, pos + 1, origin)  # +1: LZW mcs
            n_frames += 1
        else:
            raise ValueError(
                f"{origin!r}: unknown block 0x{block:02X} at {pos - 1}"
            )
    if n_frames == 0:
        raise ValueError(f"{origin!r}: no image data in GIF")
    return w, h, n_frames


def decode_gif(
    data: bytes, origin: str = "<bytes>"
) -> tuple[int, int, int, bytes]:
    """First frame as (width, height, 3, rgb_pixels); interlace
    honored; frame offsets composited onto the logical screen (pixels
    outside the frame stay palette color 0 / black)."""
    sw, sh, gct, pos = _screen(data, origin)
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos = _skip_sub_blocks(data, pos + 1, origin)
            continue
        if block != 0x2C:
            raise ValueError(
                f"{origin!r}: unknown block 0x{block:02X} at {pos - 1}"
            )
        left, top, fw, fh = struct.unpack_from("<HHHH", data, pos)
        if left + fw > sw or top + fh > sh:
            raise ValueError(
                f"{origin!r}: frame {fw}x{fh}@({left},{top}) exceeds "
                f"logical screen {sw}x{sh}"
            )
        iflags = data[pos + 8]
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = data[pos : pos + 3 * n]
            pos += 3 * n
        if not pal:
            raise ValueError(f"{origin!r}: frame has no color table")
        mcs = data[pos]
        lzw, _pos = _sub_blocks(data, pos + 1, origin)
        idx = _lzw_decode(mcs, lzw, origin)
        if len(idx) < fw * fh:
            raise ValueError(
                f"{origin!r}: LZW yielded {len(idx)} of {fw * fh} pixels"
            )
        if iflags & 0x40:  # interlaced: reorder rows
            rows = [idx[y * fw : (y + 1) * fw] for y in range(fh)]
            ordered: list[bytes | None] = [None] * fh
            k = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, fh, step):
                    ordered[y] = rows[k]
                    k += 1
            idx = b"".join(ordered)  # type: ignore[arg-type]
        n_colors = len(pal) // 3
        out = bytearray(sw * sh * 3)
        for y in range(fh):
            for x in range(fw):
                i = idx[y * fw + x]
                if i >= n_colors:
                    raise ValueError(
                        f"{origin!r}: palette index {i} out of range"
                    )
                o = ((top + y) * sw + left + x) * 3
                out[o : o + 3] = pal[3 * i : 3 * i + 3]
        return sw, sh, 3, bytes(out)
    raise ValueError(f"{origin!r}: no image data in GIF")


def encode_gif(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    interlace: bool = False,
) -> bytes:
    """Single-frame GIF fixture: gray pixels get a 256-entry gray-ramp
    palette; RGB pixels must use ≤256 distinct colors (exact palette,
    no quantization — fixtures, not a general image pipeline)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if width < 1 or height < 1:
        raise ValueError("empty image")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer {len(pixels)} B != {width}x{height}x{channels}"
        )
    if channels == 1:
        palette = b"".join(bytes([v, v, v]) for v in range(256))
        indices = pixels
        pal_bits = 8
    else:
        colors: dict[bytes, int] = {}
        idx = bytearray()
        for p in range(0, len(pixels), 3):
            c = pixels[p : p + 3]
            if c not in colors:
                if len(colors) == 256:
                    raise ValueError(
                        "RGB GIF fixtures need <= 256 distinct colors"
                    )
                colors[c] = len(colors)
            idx.append(colors[c])
        pal_bits = max(1, (len(colors) - 1).bit_length())
        palette = b"".join(colors) + bytes(3 * ((1 << pal_bits) - len(colors)))
        indices = bytes(idx)
    if interlace:
        rows = [
            indices[y * width : (y + 1) * width] for y in range(height)
        ]
        order = [
            y for start, step in _INTERLACE_PASSES
            for y in range(start, height, step)
        ]
        indices = b"".join(rows[y] for y in order)
    mcs = max(2, pal_bits)
    lzw = _lzw_encode(mcs, indices)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (pal_bits - 1), 0, 0])  # GCT flag + size
    out += palette
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
    out += bytes([0x40 if interlace else 0])
    out += bytes([mcs])
    for k in range(0, len(lzw), 255):
        chunk = lzw[k : k + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
