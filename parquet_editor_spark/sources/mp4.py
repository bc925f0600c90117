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


# ------------------------------------------------------------------
# sample tables (stts/ctts/stsz/stsc/stco/co64/stss) — the r9 tier
# ------------------------------------------------------------------


def _child(data: bytes, lo: int, hi: int, want: bytes):
    """First direct child box of a given type, or None."""
    for btype, p_lo, p_hi in _boxes(data, lo, hi):
        if btype == want:
            return p_lo, p_hi
    return None


def _full_box(data: bytes, lo: int, hi: int, origin: str, name: str
              ) -> tuple[int, int, int]:
    """(version, flags, payload_start) of a full box; bounds-checked."""
    if hi - lo < 4:
        raise ValueError(f"{origin!r}: truncated {name} box")
    return data[lo], int.from_bytes(data[lo + 1 : lo + 4], "big"), lo + 4


def _u32s(data: bytes, lo: int, n: int, origin: str, name: str):
    import numpy as np

    if lo + 4 * n > len(data):
        raise ValueError(f"{origin!r}: truncated {name} table")
    return np.frombuffer(data, dtype=">u4", count=n, offset=lo).astype(
        np.int64
    )


def mp4_sample_index(data: bytes, origin: str = "<bytes>"):
    """Decode the FIRST video track's sample tables → a dict of numpy
    arrays: ``dts`` (ticks), ``pts`` (ticks, = dts without ctts),
    ``size`` (bytes), ``offset`` (absolute file offset), ``is_sync``
    (bool; all-true without stss), plus scalar ``timescale`` and
    ``n_samples``.

    This is the container's real frame index — everything a
    frame-sampling stage needs (which byte ranges are keyframes, at
    which timestamps) WITHOUT touching codec bitstreams: the honest
    scale path for 100 TB of crawl video, where per-frame pixel work
    belongs to ffmpeg on the sampled frames only.  All expansion is
    vectorized (``np.repeat``/``cumsum`` over the run-length tables).

    Raises ValueError when no video track carries sample tables or a
    table is truncated/inconsistent."""
    import numpy as np

    n = len(data)
    if n < 12 or data[4:8] != b"ftyp":
        raise ValueError(f"{origin!r} is not an ISO-BMFF/MP4 file")
    moov = _child(data, 0, n, b"moov")
    if moov is None:
        raise ValueError(f"{origin!r}: no moov box found")
    for btype, t_lo, t_hi in _boxes(data, *moov):
        if btype != b"trak":
            continue
        mdia = _child(data, t_lo, t_hi, b"mdia")
        if mdia is None:
            continue
        hdlr = _child(data, *mdia, b"hdlr")
        if hdlr is None or hdlr[0] + 12 > hdlr[1]:
            continue
        if data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _child(data, *mdia, b"mdhd")
        if mdhd is None:
            raise ValueError(f"{origin!r}: video trak without mdhd")
        ver, _fl, p = _full_box(data, *mdhd, origin, "mdhd")
        ts_at = p + (16 if ver == 1 else 8)
        if ts_at + 4 > mdhd[1]:
            raise ValueError(f"{origin!r}: truncated mdhd box")
        timescale = int.from_bytes(data[ts_at : ts_at + 4], "big")
        if timescale == 0:
            raise ValueError(f"{origin!r}: mdhd timescale is 0")
        minf = _child(data, *mdia, b"minf")
        stbl = _child(data, *minf, b"stbl") if minf else None
        if stbl is None:
            raise ValueError(f"{origin!r}: video trak without stbl")
        return _decode_stbl(data, stbl, timescale, origin)
    raise ValueError(f"{origin!r}: no video track with sample tables")


def _decode_stbl(data: bytes, stbl, timescale: int, origin: str):
    import numpy as np

    def table(name: bytes):
        return _child(data, *stbl, name)

    # --- stts → per-sample dts (run-length of deltas)
    stts = table(b"stts")
    if stts is None:
        raise ValueError(f"{origin!r}: stbl without stts")
    _v, _f, p = _full_box(data, *stts, origin, "stts")
    n_ent = int.from_bytes(data[p : p + 4], "big")
    ent = _u32s(data, p + 4, 2 * n_ent, origin, "stts").reshape(n_ent, 2)
    counts, deltas = ent[:, 0], ent[:, 1]
    n_samples = int(counts.sum())
    per_sample_delta = np.repeat(deltas, counts)
    dts = np.concatenate(([0], np.cumsum(per_sample_delta)[:-1]))

    # --- ctts → pts offsets (v1 entries are signed)
    pts = dts
    ctts = table(b"ctts")
    if ctts is not None:
        v, _f, p = _full_box(data, *ctts, origin, "ctts")
        n_ent = int.from_bytes(data[p : p + 4], "big")
        ent = _u32s(data, p + 4, 2 * n_ent, origin, "ctts").reshape(
            n_ent, 2
        )
        offs = ent[:, 1]
        if v == 1:
            offs = np.where(offs >= 1 << 31, offs - (1 << 32), offs)
        per_sample_off = np.repeat(offs, ent[:, 0])
        if len(per_sample_off) != n_samples:
            raise ValueError(
                f"{origin!r}: ctts covers {len(per_sample_off)} samples, "
                f"stts says {n_samples}"
            )
        pts = dts + per_sample_off

    # --- stsz → sizes
    stsz = table(b"stsz")
    if stsz is None:
        raise ValueError(f"{origin!r}: stbl without stsz")
    _v, _f, p = _full_box(data, *stsz, origin, "stsz")
    uniform = int.from_bytes(data[p : p + 4], "big")
    count = int.from_bytes(data[p + 4 : p + 8], "big")
    if count != n_samples:
        raise ValueError(
            f"{origin!r}: stsz count {count} != stts samples {n_samples}"
        )
    sizes = (
        np.full(n_samples, uniform, np.int64)
        if uniform
        else _u32s(data, p + 8, n_samples, origin, "stsz")
    )

    # --- stsc × stco/co64 → absolute offsets
    stsc = table(b"stsc")
    stco, co64 = table(b"stco"), table(b"co64")
    if stsc is None or (stco is None and co64 is None):
        raise ValueError(f"{origin!r}: stbl without stsc/stco")
    _v, _f, p = _full_box(data, *stsc, origin, "stsc")
    n_ent = int.from_bytes(data[p : p + 4], "big")
    ent = _u32s(data, p + 4, 3 * n_ent, origin, "stsc").reshape(n_ent, 3)
    if stco is not None:
        _v, _f, p = _full_box(data, *stco, origin, "stco")
        n_chunks = int.from_bytes(data[p : p + 4], "big")
        chunk_off = _u32s(data, p + 4, n_chunks, origin, "stco")
    else:
        _v, _f, p = _full_box(data, *co64, origin, "co64")
        n_chunks = int.from_bytes(data[p : p + 4], "big")
        if p + 4 + 8 * n_chunks > len(data):
            raise ValueError(f"{origin!r}: truncated co64 table")
        chunk_off = np.frombuffer(
            data, dtype=">u8", count=n_chunks, offset=p + 4
        ).astype(np.int64)
    if n_ent == 0 or n_chunks == 0:
        raise ValueError(f"{origin!r}: empty stsc/stco tables")
    # expand stsc runs: entry i applies to chunks first_i..first_{i+1}-1
    firsts = ent[:, 0]
    if firsts[0] != 1 or np.any(np.diff(firsts) <= 0):
        raise ValueError(f"{origin!r}: non-monotonic stsc first_chunk")
    run_len = np.diff(np.concatenate((firsts, [n_chunks + 1])))
    spc = np.repeat(ent[:, 1], run_len)  # samples per chunk, per chunk
    if int(spc.sum()) != n_samples:
        raise ValueError(
            f"{origin!r}: stsc/stco map {int(spc.sum())} samples, "
            f"stts says {n_samples}"
        )
    sample_chunk = np.repeat(np.arange(n_chunks), spc)
    # offset within chunk = cumulative sizes, reset at chunk starts
    csum = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    chunk_start_csum = np.concatenate(([0], np.cumsum(spc)[:-1]))
    within = csum - csum[chunk_start_csum][sample_chunk]
    offsets = chunk_off[sample_chunk] + within

    # --- stss → sync flags (absent ⇒ every sample is sync)
    is_sync = np.ones(n_samples, bool)
    stss = table(b"stss")
    if stss is not None:
        _v, _f, p = _full_box(data, *stss, origin, "stss")
        n_ent = int.from_bytes(data[p : p + 4], "big")
        sync_nums = _u32s(data, p + 4, n_ent, origin, "stss")
        if len(sync_nums) and (
            sync_nums.min() < 1 or sync_nums.max() > n_samples
        ):
            raise ValueError(f"{origin!r}: stss sample number out of range")
        is_sync = np.zeros(n_samples, bool)
        is_sync[sync_nums - 1] = True

    return {
        "timescale": timescale,
        "n_samples": n_samples,
        "dts": dts,
        "pts": pts,
        "size": sizes,
        "offset": offsets,
        "is_sync": is_sync,
    }


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(
        btype, bytes([version]) + flags.to_bytes(3, "big") + payload
    )


def make_mp4_with_samples(
    timescale: int,
    deltas: list[int],
    sizes: list[int],
    sync: list[int] | None = None,
    ctts_offsets: list[int] | None = None,
    samples_per_chunk: int = 0,
    width: int = 64,
    height: int = 48,
) -> bytes:
    """Structurally-valid MP4 with one video track carrying REAL
    sample tables and an mdat whose bytes back every declared sample
    range (deterministic per-sample fill), so offset/size decode can
    be verified against actual payload bytes.  ``samples_per_chunk=0``
    puts everything in one chunk; ``sync`` lists 1-based keyframe
    numbers (None ⇒ no stss box ⇒ all sync)."""
    import numpy as np

    n = len(deltas)
    if len(sizes) != n:
        raise ValueError("deltas/sizes length mismatch")
    dur = sum(deltas)
    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomiso2")

    stts = _full(
        b"stts", 0, 0,
        n.to_bytes(4, "big")
        + b"".join(
            (1).to_bytes(4, "big") + d.to_bytes(4, "big") for d in deltas
        ),
    )
    stsz = _full(
        b"stsz", 0, 0,
        (0).to_bytes(4, "big") + n.to_bytes(4, "big")
        + b"".join(s.to_bytes(4, "big") for s in sizes),
    )
    spc = samples_per_chunk or n
    n_chunks = (n + spc - 1) // spc if n else 0
    # stsc fully determines samples-per-chunk: a short last chunk
    # needs its own run entry
    stsc_entries = [(1, spc)]
    last = n - (n_chunks - 1) * spc if n_chunks else 0
    if n_chunks > 1 and last != spc:
        stsc_entries.append((n_chunks, last))
    stsc = _full(
        b"stsc", 0, 0,
        len(stsc_entries).to_bytes(4, "big")
        + b"".join(
            first.to_bytes(4, "big") + c.to_bytes(4, "big")
            + (1).to_bytes(4, "big")
            for first, c in stsc_entries
        ),
    )
    boxes_meta = [stts, stsz, stsc]
    if sync is not None:
        boxes_meta.append(
            _full(
                b"stss", 0, 0,
                len(sync).to_bytes(4, "big")
                + b"".join(s.to_bytes(4, "big") for s in sync),
            )
        )
    if ctts_offsets is not None:
        if len(ctts_offsets) != n:
            raise ValueError("ctts length mismatch")
        boxes_meta.append(
            _full(
                b"ctts", 0, 0,
                n.to_bytes(4, "big")
                + b"".join(
                    (1).to_bytes(4, "big") + o.to_bytes(4, "big")
                    for o in ctts_offsets
                ),
            )
        )

    # stco needs absolute offsets — assemble everything after it with a
    # placeholder, measure, then patch.
    def build(chunk_offsets):
        stco = _full(
            b"stco", 0, 0,
            n_chunks.to_bytes(4, "big")
            + b"".join(o.to_bytes(4, "big") for o in chunk_offsets),
        )
        stbl = _box(b"stbl", b"".join(boxes_meta) + stco)
        minf = _box(b"minf", stbl)
        mdhd = _full(
            b"mdhd", 0, 0,
            bytes(8) + timescale.to_bytes(4, "big")
            + dur.to_bytes(4, "big") + bytes(4),
        )
        hdlr = _full(b"hdlr", 0, 0, bytes(4) + b"vide" + bytes(12) + b"\x00")
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = _full(
            b"tkhd", 0, 7,
            bytes(8) + (1).to_bytes(4, "big") + bytes(4)
            + dur.to_bytes(4, "big") + bytes(16)
            + b"".join(
                x.to_bytes(4, "big")
                for x in (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            )
            + (width << 16).to_bytes(4, "big")
            + (height << 16).to_bytes(4, "big"),
        )
        trak = _box(b"trak", tkhd + mdia)
        mvhd = _full(
            b"mvhd", 0, 0,
            bytes(8) + timescale.to_bytes(4, "big")
            + dur.to_bytes(4, "big")
            + (0x00010000).to_bytes(4, "big") + (0x0100).to_bytes(2, "big")
            + bytes(10)
            + b"".join(
                x.to_bytes(4, "big")
                for x in (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            )
            + bytes(24) + (2).to_bytes(4, "big"),
        )
        return _box(b"moov", mvhd + trak)

    moov = build([0] * n_chunks)
    mdat_payload_at = len(ftyp) + len(moov) + 8
    sizes_a = np.asarray(sizes, np.int64)
    chunk_sizes = [
        int(sizes_a[c * spc : (c + 1) * spc].sum()) for c in range(n_chunks)
    ]
    chunk_offsets, acc = [], mdat_payload_at
    for cs in chunk_sizes:
        chunk_offsets.append(acc)
        acc += cs
    moov = build(chunk_offsets)
    assert len(moov) == mdat_payload_at - len(ftyp) - 8
    media = b"".join(
        bytes([(7 * i + j) % 256 for j in range(s)])
        for i, s in enumerate(sizes)
    )
    return ftyp + moov + _box(b"mdat", media)
