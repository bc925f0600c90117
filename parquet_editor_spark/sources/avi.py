"""Dependency-free AVI (RIFF) container walk + Motion-JPEG frames.

AVI is the RIFF-framed sibling of WAV (``sources/wav.py`` shares the
chunk grammar): a ``RIFF....AVI `` file holding a ``LIST hdrl`` with
the main header (``avih``) and one ``LIST strl`` per stream
(``strh`` + ``strf``), then a ``LIST movi`` whose ``##dc``/``##db``
chunks are the coded video frames.  With an ``MJPG`` video stream
every frame is a complete baseline JPEG — which the repo can decode
for REAL via ``sources/jpeg_codec.py`` — so AVI/MJPEG closes the
end-to-end *video pixel* seam the same way Y4M closed the raw-video
one: container walk here, per-frame entropy decode in the existing
JPEG codec, Spark plumbing in ``operators/multimodal.py``.

Reference parity: the reference engine's media module reads AVI
headers and extracts MJPEG frames for its frame-sampling operator
(multimodal table functions); this module re-expresses that surface
over pure ``bytes`` with no codec library.

Scope: single-RIFF files (no ``AVIX`` extension segments), any
stream count for metadata, MJPEG video payloads for frame access.
All reads are bounds-checked ``ValueError``s — a truncated header
never becomes a silent wrong answer.
"""

from __future__ import annotations

import struct

#: fourcc of the main AVI header chunk inside LIST hdrl
_AVIH_SIZE = 56
_STRH_SIZE = 56


def _u32(data: bytes, at: int, origin: str, what: str) -> int:
    if at + 4 > len(data):
        raise ValueError(f"{origin!r}: truncated {what} at byte {at}")
    return struct.unpack_from("<I", data, at)[0]


def _walk_chunks(data: bytes, lo: int, hi: int, origin: str):
    """Yield ``(fourcc, body_lo, body_hi)`` for each RIFF chunk in
    ``data[lo:hi]``; LIST chunks yield as ``(b"LIST:" + listtype,
    children_lo, children_hi)``.  Chunk bodies pad to even offsets."""
    pos = lo
    while pos + 8 <= hi:
        fcc = data[pos : pos + 4]
        size = _u32(data, pos + 4, origin, "chunk size")
        body_lo = pos + 8
        body_hi = body_lo + size
        if body_hi > hi:
            raise ValueError(
                f"{origin!r}: chunk {fcc!r} at byte {pos} overruns "
                f"its parent ({body_hi} > {hi})"
            )
        if fcc == b"LIST":
            if size < 4:
                raise ValueError(
                    f"{origin!r}: LIST at byte {pos} too small"
                )
            yield (b"LIST:" + data[body_lo : body_lo + 4],
                   body_lo + 4, body_hi)
        else:
            yield (fcc, body_lo, body_hi)
        pos = body_hi + (size & 1)  # odd sizes pad one byte


def _riff_body(data: bytes, origin: str) -> tuple[int, int]:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError(f"{origin!r} is not an AVI (no RIFF/AVI )")
    size = _u32(data, 4, origin, "RIFF size")
    hi = min(len(data), 8 + size)
    return 12, hi


def _parse_headers(data: bytes, origin: str):
    """(avih 14-uint tuple, first video strh ``(scale, rate, length)``
    or None) — the O(header) walk both metadata tiers share; the
    ``movi`` payload is skipped by its declared size, mirroring
    ``sources/mp4.py``."""
    lo, hi = _riff_body(data, origin)
    avih = None
    vids_rate = None
    for fcc, b_lo, b_hi in _walk_chunks(data, lo, hi, origin):
        if fcc == b"LIST:hdrl":
            for f2, c_lo, c_hi in _walk_chunks(data, b_lo, b_hi, origin):
                if f2 == b"avih":
                    if c_hi - c_lo < _AVIH_SIZE:
                        raise ValueError(
                            f"{origin!r}: avih is {c_hi - c_lo} bytes, "
                            f"need {_AVIH_SIZE}"
                        )
                    avih = struct.unpack_from("<14I", data, c_lo)
                elif f2 == b"LIST:strl" and vids_rate is None:
                    for f3, s_lo, s_hi in _walk_chunks(
                        data, c_lo, c_hi, origin
                    ):
                        if f3 == b"strh":
                            if s_hi - s_lo < _STRH_SIZE:
                                raise ValueError(
                                    f"{origin!r}: strh too small"
                                )
                            if data[s_lo : s_lo + 4] == b"vids":
                                scale = _u32(
                                    data, s_lo + 20, origin, "strh"
                                )
                                rate = _u32(
                                    data, s_lo + 24, origin, "strh"
                                )
                                length = _u32(
                                    data, s_lo + 32, origin, "strh"
                                )
                                vids_rate = (scale, rate, length)
                            break
    if avih is None:
        raise ValueError(f"{origin!r}: no avih main header")
    return avih, vids_rate


def avi_meta(
    data: bytes, origin: str = "<bytes>"
) -> tuple[int, int, int, int, int]:
    """(duration_ms, n_streams, width, height, n_frames) from the
    ``avih`` main header.  Duration uses the video ``strh``
    scale/rate when present (exact rational arithmetic), falling
    back to avih.dwMicroSecPerFrame."""
    avih, vids_rate = _parse_headers(data, origin)
    usec_pf, _, _, _, total_frames, _, n_streams, _, width, height = avih[:10]
    if vids_rate and vids_rate[1]:
        scale, rate, length = vids_rate
        n_frames = length or total_frames
        duration_ms = n_frames * scale * 1000 // rate
    else:
        n_frames = total_frames
        duration_ms = n_frames * usec_pf // 1000
    return duration_ms, n_streams, width, height, n_frames


def avi_video_timing(
    data: bytes, origin: str = "<bytes>"
) -> tuple[int, int]:
    """(scale, rate) of the first video stream — frame i starts at
    ``i * scale * 1000 // rate`` ms, the exact rational the frame
    index needs.  Falls back to avih.dwMicroSecPerFrame as
    (usec_per_frame, 1_000_000) when no video strh declares a rate."""
    avih, vids_rate = _parse_headers(data, origin)
    if vids_rate and vids_rate[1]:
        return vids_rate[0], vids_rate[1]
    usec_pf = avih[0]
    if usec_pf < 1:
        raise ValueError(f"{origin!r}: no usable frame timing")
    return usec_pf, 1_000_000


def avi_video_chunks(
    data: bytes, origin: str = "<bytes>"
) -> list[tuple[int, int]]:
    """Byte ranges ``(offset, size)`` of the video frame chunks
    (``##dc``/``##db``) inside ``LIST movi``, in stream order — the
    frame index a sampling pipeline ships to a decode stage without
    copying payload bytes."""
    lo, hi = _riff_body(data, origin)
    out: list[tuple[int, int]] = []
    for fcc, b_lo, b_hi in _walk_chunks(data, lo, hi, origin):
        if fcc == b"LIST:movi":
            for f2, c_lo, c_hi in _walk_chunks(data, b_lo, b_hi, origin):
                if (
                    len(f2) == 4
                    and f2[:2].isdigit()
                    and f2[2:4] in (b"dc", b"db")
                ):
                    out.append((c_lo, c_hi - c_lo))
    return out


def avi_video_frames(data: bytes, origin: str = "<bytes>") -> list[bytes]:
    """The coded video frame payloads (complete JPEG streams for an
    MJPEG file), extracted by the ``movi`` chunk walk."""
    return [
        data[off : off + size]
        for off, size in avi_video_chunks(data, origin)
    ]


def encode_avi_mjpeg(
    width: int,
    height: int,
    fps: tuple[int, int],
    jpeg_frames: list[bytes],
) -> bytes:
    """Serialize complete JPEG streams into a playable single-video
    AVI/MJPEG file (RIFF → hdrl(avih, strl(strh 'vids'/'MJPG' +
    strf BITMAPINFOHEADER)) → movi('00dc' chunks) → idx1).  ``fps``
    is a ``(rate, scale)`` rational: frame duration = scale/rate s."""
    rate, scale = fps
    if width < 1 or height < 1:
        raise ValueError(f"invalid dimensions {width}x{height}")
    if rate < 1 or scale < 1:
        raise ValueError(f"invalid frame rate {fps}")
    n = len(jpeg_frames)
    usec_pf = 1_000_000 * scale // rate
    max_bytes = max((len(f) for f in jpeg_frames), default=0)

    avih = struct.pack(
        "<14I",
        usec_pf, max_bytes * rate // max(scale, 1), 0,
        0x10,  # AVIF_HASINDEX
        n, 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<10I", 0, 0, 0, scale, rate, 0, n, max_bytes, 0xFFFFFFFF, 0
        )
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )

    def chunk(fcc: bytes, body: bytes) -> bytes:
        return fcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(listtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", listtype + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)

    movi_body = bytearray()
    idx = bytearray()
    for f in jpeg_frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += b"00dc" + struct.pack(
            "<III", 0x10, 4 + len(movi_body), len(f)
        )  # AVIIF_KEYFRAME
        movi_body += chunk(b"00dc", f)
    movi = lst(b"movi", bytes(movi_body))
    idx1 = chunk(b"idx1", bytes(idx))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
