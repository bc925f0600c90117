"""Header-only JPEG metadata — dependency-free SOF marker walk.

Full JPEG pixel decode needs libjpeg/PIL (absent in this environment)
and stays an honest ``NotImplementedError`` in
``operators/multimodal``.  But (width, height, channels) live in the
frame header (SOF segment), and real crawl corpora hit JPEG before any
other image format — so ``decode_meta`` gets a real JPEG path from a
pure marker walk: iterate SOI → segments (2-byte big-endian lengths)
until a start-of-frame marker, read the 8-byte frame header, never
touch entropy-coded data.

Scope: any single-frame JFIF/EXIF stream whose frame is one of the
SOF0-SOF15 variants (baseline, extended sequential, progressive,
lossless, arithmetic — the dimensions field layout is identical);
``make_jpeg_header`` synthesizes a minimal structurally-valid fixture
stream (SOI + APP0 + SOF0 + SOS stub + EOI) with no entropy data.
"""

from __future__ import annotations

# SOF0-SOF15 occupy 0xC0-0xCF except 0xC4 (DHT), 0xC8 (reserved JPG)
# and 0xCC (DAC), which are not frame headers.
_SOF_MARKERS = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}
# standalone markers that carry no length field
_BARE_MARKERS = {0x01, 0xD8} | set(range(0xD0, 0xD8))  # TEM, SOI, RSTn


def jpeg_header_meta(
    data: bytes, origin: str = "<bytes>"
) -> tuple[int, int, int]:
    """(width, height, channels) from the SOF segment of a JPEG
    stream.  Raises ValueError on non-JPEG bytes, a truncated header,
    or a stream whose entropy data starts before any SOF marker."""
    n = len(data)
    if n < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError(f"{origin!r} is not a JPEG stream (no SOI)")
    pos = 2
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError(
                f"{origin!r}: expected a marker at byte {pos}"
            )
        # 0xFF fill bytes may pad between segments
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker in _BARE_MARKERS:
            continue
        if marker == 0xD9:  # EOI before any SOF
            break
        if pos + 2 > n:
            break
        seg_len = int.from_bytes(data[pos : pos + 2], "big")
        if seg_len < 2:
            raise ValueError(
                f"{origin!r}: invalid segment length {seg_len} at {pos}"
            )
        if marker in _SOF_MARKERS:
            # precision(1) height(2) width(2) ncomponents(1)
            if pos + 8 > n:
                raise ValueError(f"{origin!r}: truncated SOF segment")
            height = int.from_bytes(data[pos + 3 : pos + 5], "big")
            width = int.from_bytes(data[pos + 5 : pos + 7], "big")
            channels = data[pos + 7]
            if not (width and height and channels):
                raise ValueError(
                    f"{origin!r}: degenerate SOF dims "
                    f"{width}x{height}x{channels}"
                )
            return width, height, channels
        if marker == 0xDA:  # SOS: entropy-coded data follows
            break
        pos += seg_len
    raise ValueError(f"{origin!r}: no SOF marker before SOS/EOF")


def make_jpeg_header(width: int, height: int, channels: int = 3) -> bytes:
    """Minimal structurally-valid JPEG prefix for fixtures: SOI +
    JFIF APP0 + SOF0 + SOS stub + EOI, zero entropy bytes — enough
    for any header-walking metadata reader, loudly NOT decodable to
    pixels."""
    if not (0 < width < 65536 and 0 < height < 65536 and 0 < channels < 256):
        raise ValueError(f"bad jpeg dims {width}x{height}x{channels}")
    out = bytearray(b"\xff\xd8")  # SOI
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + (len(app0) + 2).to_bytes(2, "big") + app0
    comps = b"".join(
        bytes((i + 1, 0x11, 0)) for i in range(channels)
    )  # id, 1x1 sampling, quant table 0
    sof = (
        b"\x08"
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes((channels,))
        + comps
    )
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    sos = (
        bytes((channels,))
        + b"".join(bytes((i + 1, 0)) for i in range(channels))
        + b"\x00\x3f\x00"
    )
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    out += b"\xff\xd9"  # EOI
    return bytes(out)
