"""Header-only MP4 (ISO BMFF) metadata — dependency-free box walk.

H.264/H.265 frame decode belongs to ffmpeg and stays an honest
``NotImplementedError`` in ``operators/multimodal``; but the
container's structural metadata — duration, timescale, track count,
and the video track's presentation dimensions — lives in plain
big-endian box headers (``moov``/``mvhd``/``trak``/``tkhd``) that a
~60-line walk reads without touching a single media sample.

Scope: any ISO base-media file whose ``moov`` precedes or follows the
media data (the walk skips ``mdat`` by its declared size, so
arbitrarily large media never needs parsing); mvhd/tkhd versions 0
and 1.  ``make_mp4_header`` synthesizes a minimal structurally-valid
fixture (ftyp + moov[mvhd + trak[tkhd]] + empty mdat).
"""

from __future__ import annotations

_CONTAINERS = {b"moov", b"trak"}  # boxes whose payload is more boxes


def _boxes(data: bytes, start: int, end: int):
    """Yield (box_type, payload_start, payload_end) across a range."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        btype = data[pos + 4 : pos + 8]
        payload = pos + 8
        if size == 1:  # 64-bit largesize follows the type
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            payload = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(
                f"box {btype!r} at {pos} overruns its scope "
                f"(size {size}, scope end {end})"
            )
        yield btype, payload, pos + size
        pos += size


def mp4_meta(
    data: bytes, origin: str = "<bytes>"
) -> tuple[int, int, int, int | None, int | None]:
    """(duration_ms, timescale, n_tracks, width, height) from the
    moov box.  width/height come from the first tkhd with non-zero
    dims (16.16 fixed point, truncated to int) and are None for
    audio-only files.  Raises ValueError if no ftyp/moov/mvhd."""
    n = len(data)
    if n < 12 or data[4:8] != b"ftyp":
        raise ValueError(f"{origin!r} is not an ISO-BMFF/MP4 file")
    mvhd = None
    n_tracks = 0
    width = height = None
    # FIFO traversal (r8 ADVICE: a LIFO stack visited traks in reverse
    # file order, so the LAST video trak's dims won instead of the
    # documented first-trak-with-non-zero-dims).
    from collections import deque

    queue = deque([(b"", 0, n)])
    while queue:
        _, lo, hi = queue.popleft()
        for btype, p_lo, p_hi in _boxes(data, lo, hi):
            if btype in _CONTAINERS:
                queue.append((btype, p_lo, p_hi))
                if btype == b"trak":
                    n_tracks += 1
            elif btype == b"mvhd":
                if p_hi - p_lo < 4:
                    raise ValueError(f"{origin!r}: truncated mvhd box")
                ver = data[p_lo]
                need = 32 if ver == 1 else 20
                if p_hi - p_lo < need:
                    raise ValueError(
                        f"{origin!r}: mvhd v{ver} payload "
                        f"{p_hi - p_lo} B < {need} B"
                    )
                if ver == 1:
                    timescale = int.from_bytes(
                        data[p_lo + 20 : p_lo + 24], "big"
                    )
                    duration = int.from_bytes(
                        data[p_lo + 24 : p_lo + 32], "big"
                    )
                else:
                    timescale = int.from_bytes(
                        data[p_lo + 12 : p_lo + 16], "big"
                    )
                    duration = int.from_bytes(
                        data[p_lo + 16 : p_lo + 20], "big"
                    )
                mvhd = (duration, timescale)
            elif btype == b"tkhd" and width is None:
                if p_hi - p_lo < 4:
                    raise ValueError(f"{origin!r}: truncated tkhd box")
                ver = data[p_lo]
                dims_at = p_lo + (88 if ver == 1 else 76)
                if dims_at + 8 <= p_hi:
                    w = int.from_bytes(data[dims_at : dims_at + 4], "big")
                    h = int.from_bytes(
                        data[dims_at + 4 : dims_at + 8], "big"
                    )
                    if w and h:
                        width, height = w >> 16, h >> 16
    if mvhd is None:
        raise ValueError(f"{origin!r}: no moov/mvhd box found")
    duration, timescale = mvhd
    if timescale == 0:
        raise ValueError(f"{origin!r}: mvhd timescale is 0")
    return (
        duration * 1000 // timescale,
        timescale,
        n_tracks,
        width,
        height,
    )


def _box(btype: bytes, payload: bytes) -> bytes:
    return (len(payload) + 8).to_bytes(4, "big") + btype + payload


def make_mp4_header(
    duration_ms: int,
    timescale: int = 1000,
    width: int | None = None,
    height: int | None = None,
    n_tracks: int = 1,
) -> bytes:
    """Minimal structurally-valid MP4: ftyp + moov[mvhd + n·trak[tkhd]]
    + empty mdat.  No media samples — fixtures for header-walking
    readers only."""
    if timescale <= 0 or duration_ms < 0:
        raise ValueError("bad duration/timescale")
    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomiso2")
    duration = duration_ms * timescale // 1000
    mvhd = _box(
        b"mvhd",
        bytes(4)  # version 0 + flags
        + bytes(8)  # creation/modification time
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + (0x00010000).to_bytes(4, "big")  # rate 1.0
        + (0x0100).to_bytes(2, "big")  # volume 1.0
        + bytes(10)  # reserved
        + b"".join(
            x.to_bytes(4, "big")
            for x in (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        )  # identity matrix
        + bytes(24)  # pre-defined
        + (n_tracks + 1).to_bytes(4, "big"),  # next track id
    )
    traks = []
    for i in range(n_tracks):
        w = (width or 0) << 16 if i == 0 else 0
        h = (height or 0) << 16 if i == 0 else 0
        tkhd = _box(
            b"tkhd",
            bytes(3) + b"\x07"  # version 0, flags: enabled|in-movie
            + bytes(8)  # creation/modification
            + (i + 1).to_bytes(4, "big")  # track id
            + bytes(4)  # reserved
            + duration.to_bytes(4, "big")
            + bytes(8)  # reserved
            + bytes(2)  # layer
            + bytes(2)  # alternate group
            + bytes(2)  # volume
            + bytes(2)  # reserved
            + b"".join(
                x.to_bytes(4, "big")
                for x in (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            )
            + w.to_bytes(4, "big")
            + h.to_bytes(4, "big"),
        )
        traks.append(_box(b"trak", tkhd))
    moov = _box(b"moov", mvhd + b"".join(traks))
    mdat = _box(b"mdat", b"")
    return ftyp + moov + mdat
