"""WebP header metadata — dependency-free RIFF chunk walk.

VP8 pixel decode is an arithmetic-coded video codec and belongs to
libwebp; it stays an honest ``NotImplementedError`` in the pixel
stages.  But dimensions and channel count live in plain headers for
all three container layouts — ``VP8 `` (lossy: 3-byte frame tag +
9D 01 2A start code + 14-bit dims), ``VP8L`` (lossless: 0x2F + LE
bit-packed width-1/height-1 + alpha bit), ``VP8X`` (extended: flag
byte + 24-bit LE canvas dims) — so ``decode_meta`` gets a real WebP
path with zero entropy decoding, the same O(header) tier as r8's
JPEG SOF walk.

``make_webp_*`` synthesize minimal structurally-valid fixtures
(headers + filler payload) for the walk.
"""

from __future__ import annotations

import struct


def webp_meta(data: bytes, origin: str = "<bytes>") -> tuple[int, int, int]:
    """(width, height, channels) from the first VP8/VP8L/VP8X chunk.
    channels is 4 when an alpha flag/bit is present, else 3."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError(f"{origin!r} is not a WebP (no RIFF/WEBP)")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)
    pos = 12
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"{origin!r}: truncated {tag!r} chunk")
        if tag == b"VP8 ":
            if size < 10:
                raise ValueError(f"{origin!r}: VP8 chunk too short")
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError(f"{origin!r}: bad VP8 start code")
            (w_raw,) = struct.unpack_from("<H", body, 6)
            (h_raw,) = struct.unpack_from("<H", body, 8)
            return w_raw & 0x3FFF, h_raw & 0x3FFF, 3
        if tag == b"VP8L":
            if size < 5:
                raise ValueError(f"{origin!r}: VP8L chunk too short")
            if body[0] != 0x2F:
                raise ValueError(f"{origin!r}: bad VP8L signature")
            (bits,) = struct.unpack_from("<I", body, 1)
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            alpha = (bits >> 28) & 1
            return w, h, 4 if alpha else 3
        if tag == b"VP8X":
            if size < 10:
                raise ValueError(f"{origin!r}: VP8X chunk too short")
            alpha = bool(body[0] & 0x10)
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return w, h, 4 if alpha else 3
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError(f"{origin!r}: no VP8/VP8L/VP8X chunk found")


def _riff(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def make_webp_lossy(width: int, height: int) -> bytes:
    """Minimal VP8 (lossy) WebP: frame tag + start code + dims,
    filler payload."""
    if not (0 < width < 1 << 14 and 0 < height < 1 << 14):
        raise ValueError(f"dims out of 14-bit range: {width}x{height}")
    body = (
        b"\x00\x00\x00"  # frame tag (key frame, version 0)
        + b"\x9d\x01\x2a"
        + struct.pack("<HH", width, height)
        + b"\xaa" * 16
    )
    payload = _riff(b"VP8 ", body)
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload


def make_webp_lossless(width: int, height: int, alpha: bool = False) -> bytes:
    if not (0 < width <= 1 << 14 and 0 < height <= 1 << 14):
        raise ValueError(f"dims out of range: {width}x{height}")
    bits = (width - 1) | ((height - 1) << 14) | (int(alpha) << 28)
    body = b"\x2f" + struct.pack("<I", bits) + b"\xbb" * 8
    payload = _riff(b"VP8L", body)
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload


def make_webp_extended(
    width: int, height: int, alpha: bool = False
) -> bytes:
    if not (0 < width <= 1 << 24 and 0 < height <= 1 << 24):
        raise ValueError(f"dims out of range: {width}x{height}")
    body = (
        bytes([0x10 if alpha else 0x00])
        + b"\x00\x00\x00"
        + (width - 1).to_bytes(3, "little")
        + (height - 1).to_bytes(3, "little")
    )
    payload = _riff(b"VP8X", body)
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload
