"""Ogg container walk + Opus/Vorbis identification headers.

Dependency-free page-level parse of the public Ogg bitstream format
(RFC 3533) with the Opus (RFC 7845) and Vorbis I identification
headers — the metadata tier for the two dominant open crawl-audio
codecs.  Audio DSP decode (MDCT/CELT/SILK) genuinely belongs to
libopus/libvorbis and stays an honest ``NotImplementedError`` in
``operators/multimodal``; but rate, channels and duration live in
the id packet plus the LAST page's granule position, so the walk is
O(pages) with packet payloads skipped by the segment table — the
same header-walk discipline as the MP3/FLAC/MP4 sources.

Page CRCs use Ogg's non-reflected CRC-32 (poly 0x04C11DB7, init 0,
xor 0, computed with the CRC field zeroed) and are verified on every
page — corrupt streams fail loudly.

``make_ogg_opus`` / ``make_ogg_vorbis`` synthesize structurally-valid
fixtures (id/comment header pages + filler audio pages with chosen
granule positions); payload bytes are arbitrary filler since only
the container is parsed.
"""

from __future__ import annotations

_MAGIC = b"OggS"


def _make_crc_table() -> list[int]:
    tbl = []
    for b in range(256):
        r = b << 24
        for _ in range(8):
            r = (
                ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF
                if r & 0x80000000
                else (r << 1) & 0xFFFFFFFF
            )
        tbl.append(r)
    return tbl


_CRC_TBL = _make_crc_table()


def ogg_crc(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC_TBL[((r >> 24) & 0xFF) ^ b]
    return r


def ogg_pages(data: bytes, origin: str = "<bytes>", verify: bool = True):
    """Yield (header_type, granule, serial, seq, packets_payload)
    per page.  ``packets_payload`` is the concatenated segment bytes
    (packet reassembly across pages is the caller's concern; the
    first packet of a stream never spans pages for the headers we
    read).  Raises ValueError on bad capture patterns, truncation,
    or CRC mismatch."""
    pos, n = 0, len(data)
    if n < 27 or data[:4] != _MAGIC:
        raise ValueError(f"{origin!r} is not an Ogg stream (no OggS)")
    while pos < n:
        if pos + 27 > n:
            raise ValueError(f"{origin!r}: truncated page header at {pos}")
        if data[pos : pos + 4] != _MAGIC:
            raise ValueError(f"{origin!r}: lost page sync at byte {pos}")
        if data[pos + 4] != 0:
            raise ValueError(
                f"{origin!r}: unsupported Ogg version {data[pos + 4]}"
            )
        header_type = data[pos + 5]
        granule = int.from_bytes(
            data[pos + 6 : pos + 14], "little", signed=True
        )
        serial = int.from_bytes(data[pos + 14 : pos + 18], "little")
        seq = int.from_bytes(data[pos + 18 : pos + 22], "little")
        n_segs = data[pos + 26]
        seg_table = data[pos + 27 : pos + 27 + n_segs]
        if len(seg_table) < n_segs:
            raise ValueError(f"{origin!r}: truncated segment table")
        body_at = pos + 27 + n_segs
        body_len = sum(seg_table)
        if body_at + body_len > n:
            raise ValueError(f"{origin!r}: truncated page body at {pos}")
        if verify:
            page = bytearray(data[pos : body_at + body_len])
            page[22:26] = b"\x00" * 4
            want = int.from_bytes(data[pos + 22 : pos + 26], "little")
            if ogg_crc(bytes(page)) != want:
                raise ValueError(
                    f"{origin!r}: page CRC mismatch at byte {pos}"
                )
        yield header_type, granule, serial, seq, data[
            body_at : body_at + body_len
        ]
        pos = body_at + body_len


def ogg_stream_info(
    data: bytes, origin: str = "<bytes>"
) -> tuple[str, int, int, int]:
    """(codec, sample_rate, channels, n_frames) for the FIRST logical
    stream.  Opus reports the canonical 48 kHz decode rate with
    ``n_frames = last granule − pre-skip`` (RFC 7845 §4); Vorbis
    reports the id-header rate with ``n_frames = last granule``.
    Raises ValueError for non-Opus/Vorbis first packets."""
    first_serial = None
    codec = rate = channels = pre_skip = None
    last_granule = 0
    for htype, granule, serial, _seq, body in ogg_pages(data, origin):
        if first_serial is None:
            if not htype & 0x02:
                raise ValueError(
                    f"{origin!r}: first page is not beginning-of-stream"
                )
            first_serial = serial
            if body.startswith(b"OpusHead"):
                if len(body) < 19:
                    raise ValueError(f"{origin!r}: truncated OpusHead")
                if body[8] >> 4 != 0:
                    raise ValueError(
                        f"{origin!r}: unsupported OpusHead version "
                        f"{body[8]}"
                    )
                codec = "opus"
                channels = body[9]
                pre_skip = int.from_bytes(body[10:12], "little")
                rate = 48000  # Opus always decodes at 48 kHz
            elif body.startswith(b"\x01vorbis"):
                if len(body) < 30:
                    raise ValueError(
                        f"{origin!r}: truncated Vorbis id header"
                    )
                codec = "vorbis"
                channels = body[11]
                rate = int.from_bytes(body[12:16], "little")
                pre_skip = 0
            else:
                raise ValueError(
                    f"{origin!r}: first packet is neither OpusHead nor "
                    "Vorbis id"
                )
            if channels == 0 or rate == 0:
                raise ValueError(
                    f"{origin!r}: zero channels/rate in id header"
                )
        if serial == first_serial and granule >= 0:
            last_granule = max(last_granule, granule)
    n_frames = max(0, last_granule - pre_skip)
    return codec, rate, channels, n_frames


# ------------------------------------------------------------ fixtures


def _page(
    serial: int,
    seq: int,
    granule: int,
    packets: list[bytes],
    header_type: int = 0,
) -> bytes:
    segs = bytearray()
    body = bytearray()
    for pkt in packets:
        q, r = divmod(len(pkt), 255)
        segs += b"\xff" * q + bytes([r])
        body += pkt
    hdr = bytearray(_MAGIC)
    hdr += bytes([0, header_type])
    hdr += granule.to_bytes(8, "little", signed=True)
    hdr += serial.to_bytes(4, "little")
    hdr += seq.to_bytes(4, "little")
    hdr += b"\x00" * 4  # CRC placeholder
    hdr += bytes([len(segs)]) + segs
    page = bytes(hdr) + bytes(body)
    crc = ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


def make_ogg_opus(
    channels: int,
    pre_skip: int,
    n_frames: int,
    input_rate: int = 48000,
    serial: int = 0x1234,
    n_audio_pages: int = 2,
) -> bytes:
    """Ogg-Opus stream: OpusHead + OpusTags header pages, then
    ``n_audio_pages`` filler audio pages whose last granule is
    ``pre_skip + n_frames``."""
    head = (
        b"OpusHead"
        + bytes([1, channels])
        + pre_skip.to_bytes(2, "little")
        + input_rate.to_bytes(4, "little")
        + (0).to_bytes(2, "little")  # output gain
        + b"\x00"  # channel mapping family 0
    )
    tags = b"OpusTags" + (4).to_bytes(4, "little") + b"pqes" + bytes(4)
    out = _page(serial, 0, 0, [head], header_type=0x02)
    out += _page(serial, 1, 0, [tags])
    total = pre_skip + n_frames
    for i in range(n_audio_pages):
        g = total * (i + 1) // n_audio_pages
        ht = 0x04 if i == n_audio_pages - 1 else 0
        out += _page(serial, 2 + i, g, [b"\xaa" * (40 + 17 * i)], ht)
    return out


def make_ogg_vorbis(
    channels: int,
    sample_rate: int,
    n_frames: int,
    serial: int = 0x5678,
    n_audio_pages: int = 2,
) -> bytes:
    """Ogg-Vorbis stream: id + comment header pages, then filler
    audio pages whose last granule is ``n_frames``."""
    ident = (
        b"\x01vorbis"
        + (0).to_bytes(4, "little")  # version
        + bytes([channels])
        + sample_rate.to_bytes(4, "little")
        + (0).to_bytes(12, "little")  # bitrate hints
        + bytes([0xB8, 0x01])  # blocksizes + framing bit
    )
    comment = b"\x03vorbis" + (4).to_bytes(4, "little") + b"pqes" + bytes(5)
    out = _page(serial, 0, 0, [ident], header_type=0x02)
    out += _page(serial, 1, 0, [comment])
    for i in range(n_audio_pages):
        g = n_frames * (i + 1) // n_audio_pages
        ht = 0x04 if i == n_audio_pages - 1 else 0
        out += _page(serial, 2 + i, g, [b"\xbb" * (60 + 11 * i)], ht)
    return out
