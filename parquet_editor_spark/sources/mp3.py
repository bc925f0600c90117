"""Header-only MP3 (MPEG audio Layer III) metadata — dependency-free
frame-header walk, the audio sibling of ``sources/jpeg.py``.

Real crawl audio is MP3-first the way crawl images are JPEG-first
(r8 verdict item 6).  Synthesis/decoding of the audio itself belongs
to a real codec library and stays an honest ``NotImplementedError``
in ``operators/multimodal``; but everything a curation pipeline
filters on — sample rate, channel mode, total samples, duration,
average bitrate — lives in the 4-byte frame headers (public
ISO/IEC 11172-3 / 13818-3 layout), so the walk reads O(#frames)
header bytes and skips every frame's payload by its declared size.

Scope:

- MPEG-1, MPEG-2 and MPEG-2.5 Layer III streams (the "MP3" family),
  constant or variable bitrate; free-format (bitrate index 0) raises
  because the frame size is then undeclared.
- A leading ID3v2 tag is skipped via its syncsafe size; a trailing
  128-byte ID3v1 ``TAG`` block is tolerated.
- Layer I/II streams raise ``ValueError`` — different frame-size
  arithmetic, out of the MP3 scope.
- A Xing/VBRI metadata frame, when present, is counted like any
  other frame (it IS a spec-valid frame); the ≤1-frame sample
  overcount is documented rather than special-cased.

Pure functions over ``bytes``; the Spark side (Arrow batches,
``mapInPandas``) lives in ``operators/multimodal.py``.
"""

from __future__ import annotations

# bitrate tables, kbps, Layer III; index 0 = free format, 15 = invalid
_BITRATE_L3 = {
    1: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
# sample-rate tables by version key; index 3 is reserved
_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}
# version-ID bits (header bits 19-20) → (version key, bitrate table key,
# samples per Layer III frame, slot coefficient = samples/8)
_VERSIONS = {
    3: ("1", 1, 1152, 144),
    2: ("2", 2, 576, 72),
    0: ("2.5", 2, 576, 72),
}


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 when absent)."""
    if len(data) >= 10 and data[:3] == b"ID3":
        if any(b & 0x80 for b in data[6:10]):
            raise ValueError("ID3v2 size bytes are not syncsafe")
        size = (
            (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
        )
        return 10 + size + (10 if data[5] & 0x10 else 0)  # + footer
    return 0


def mp3_stream_info(
    data: bytes, origin: str = "<bytes>"
) -> tuple[int, int, int, int, int]:
    """Walk every frame header; returns ``(sample_rate, channels,
    total_samples, n_frames, avg_bitrate_kbps)``.

    ``total_samples`` is per-channel PCM samples (``n_frames`` ×
    1152 for MPEG-1, × 576 for MPEG-2/2.5); ``avg_bitrate_kbps`` is
    the integer mean of the per-frame bitrates, so CBR streams report
    their nominal rate exactly and VBR streams a floor average.
    Raises ValueError on non-MP3 bytes, mid-stream corruption, or a
    rate/channel change between frames (one logical stream only)."""
    n = len(data)
    pos = _id3v2_size(data)
    if pos >= n:
        raise ValueError(f"{origin!r}: no MP3 frames after ID3v2 tag")
    rate = channels = None
    n_frames = total_samples = bitrate_sum = 0
    samples_per_frame = 0
    while pos < n:
        remaining = n - pos
        if remaining < 4:
            raise ValueError(
                f"{origin!r}: {remaining} trailing bytes after frame "
                f"{n_frames} are not a frame header"
            )
        if remaining == 128 and data[pos : pos + 3] == b"TAG":
            break  # trailing ID3v1 tag
        b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
        if data[pos] != 0xFF or (b1 & 0xE0) != 0xE0:
            where = "not an MP3 stream" if n_frames == 0 else (
                f"lost sync after frame {n_frames}"
            )
            raise ValueError(f"{origin!r}: {where} (offset {pos})")
        ver_bits = (b1 >> 3) & 3
        if ver_bits == 1:
            raise ValueError(f"{origin!r}: reserved MPEG version ID")
        layer_bits = (b1 >> 1) & 3
        if layer_bits != 1:  # 1 encodes Layer III
            layer = {3: "I", 2: "II", 0: "reserved"}[layer_bits]
            raise ValueError(
                f"{origin!r}: Layer {layer} frame — only Layer III "
                "(MP3) is supported"
            )
        ver_key, table_key, spf, coeff = _VERSIONS[ver_bits]
        bi, ri = b2 >> 4, (b2 >> 2) & 3
        if bi == 0:
            raise ValueError(
                f"{origin!r}: free-format bitrate (index 0) has no "
                "declared frame size"
            )
        if bi == 15 or ri == 3:
            raise ValueError(
                f"{origin!r}: invalid bitrate/sample-rate index at "
                f"frame {n_frames}"
            )
        frame_rate = _RATES[ver_key][ri]
        frame_ch = 1 if (b3 >> 6) == 3 else 2
        if rate is None:
            rate, channels = frame_rate, frame_ch
        elif (frame_rate, frame_ch) != (rate, channels):
            raise ValueError(
                f"{origin!r}: rate/channel change at frame {n_frames} "
                f"({rate}Hz/{channels}ch → {frame_rate}Hz/{frame_ch}ch)"
            )
        bitrate = _BITRATE_L3[table_key][bi]
        pad = (b2 >> 1) & 1
        frame_len = coeff * bitrate * 1000 // frame_rate + pad
        if frame_len < 4:
            raise ValueError(f"{origin!r}: degenerate frame size")
        if pos + frame_len > n:
            raise ValueError(
                f"{origin!r}: truncated final frame (needs "
                f"{frame_len} bytes, {remaining} left)"
            )
        n_frames += 1
        total_samples += spf
        bitrate_sum += bitrate
        samples_per_frame = spf
        pos += frame_len
    if n_frames == 0:
        raise ValueError(f"{origin!r}: no MP3 frames found")
    del samples_per_frame
    return (rate, channels, total_samples, n_frames, bitrate_sum // n_frames)


def make_mp3(
    sample_rate: int,
    channels: int = 2,
    n_frames: int = 1,
    bitrate_kbps: int = 128,
    pad_alternate: bool = False,
    id3v2_bytes: int = 0,
    id3v1: bool = False,
) -> bytes:
    """Synthesize a spec-valid Layer III stream: real frame headers,
    zero-filled payloads (fixtures for header-walking readers only —
    no actual audio).  The MPEG version follows from ``sample_rate``
    via the public rate tables; ``pad_alternate`` sets the padding
    bit on odd frames to exercise the +1-slot frame-size path."""
    ver_bits = ri = None
    for vb, (ver_key, _tk, _spf, _c) in _VERSIONS.items():
        rates = _RATES[ver_key]
        if sample_rate in rates:
            ver_bits, ri = vb, rates.index(sample_rate)
            break
    if ver_bits is None:
        raise ValueError(f"no MPEG version has sample rate {sample_rate}")
    _ver_key, table_key, _spf, coeff = _VERSIONS[ver_bits]
    try:
        bi = _BITRATE_L3[table_key].index(bitrate_kbps)
    except ValueError:
        raise ValueError(
            f"bitrate {bitrate_kbps} kbps not in the MPEG-{_ver_key} "
            "Layer III table"
        ) from None
    if bi == 0 or n_frames < 1 or channels not in (1, 2):
        raise ValueError("bad bitrate/n_frames/channels")
    mode = 3 if channels == 1 else 0  # mono / stereo
    out = bytearray()
    if id3v2_bytes:
        size = id3v2_bytes
        out += b"ID3" + bytes([3, 0, 0]) + bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
             (size >> 7) & 0x7F, size & 0x7F]
        ) + bytes(size)
    for k in range(n_frames):
        pad = 1 if (pad_alternate and k % 2) else 0
        hdr = bytes(
            [
                0xFF,
                0xE0 | (ver_bits << 3) | (1 << 1) | 1,  # layer III, no CRC
                (bi << 4) | (ri << 2) | (pad << 1),
                mode << 6,
            ]
        )
        frame_len = coeff * bitrate_kbps * 1000 // sample_rate + pad
        out += hdr + bytes(frame_len - 4)
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)
