"""Dependency-free WAV (RIFF/PCM) codec — the audio sibling of
``sources/png.py``, closing the second multimodal decode seam.

Scope (public RIFF/WAVE spec, nothing else):

- PCM integer formats (audio format tag 1), 8/16/24/32-bit integer
  samples, any channel count / sample rate (frames are moved as opaque
  blocks — sample width only affects block math).
- Float (tag 3), ADPCM, extensible (tag 0xFFFE) and other compressed
  formats raise ``NotImplementedError`` — those belong to a real audio
  library; PCM is what ML feature pipelines exchange.
- The parser walks chunks (skipping LIST/fact/etc.), validates sizes,
  and tolerates the common off-spec trailing-pad byte.

Pure functions over ``bytes``; the Spark side (Arrow batches,
mapInPandas) lives in ``operators/multimodal.py``.
"""

from __future__ import annotations

import struct

_SUPPORTED_BITS = {8, 16, 24, 32}


def encode_wav(
    sample_rate: int, channels: int, bits: int, frames: bytes
) -> bytes:
    """Serialize raw PCM frames (interleaved, ``bits``-per-sample)
    into a canonical 44-byte-header WAV file."""
    if channels < 1:
        raise ValueError(f"channels must be >= 1, got {channels}")
    if sample_rate < 1:
        raise ValueError(f"sample_rate must be >= 1, got {sample_rate}")
    if bits not in _SUPPORTED_BITS:
        raise ValueError(f"bits must be one of {sorted(_SUPPORTED_BITS)}")
    block = channels * bits // 8
    if block == 0 or len(frames) % block:
        raise ValueError(
            f"frame buffer of {len(frames)} bytes is not a multiple of "
            f"the {block}-byte frame size"
        )
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * block,  # byte rate
        block,
        bits,
    )
    data_size = len(frames)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", data_size)
        + frames
    )


def decode_wav(data: bytes) -> tuple[int, int, int, int, bytes]:
    """Parse a WAV container; returns ``(sample_rate, channels, bits,
    n_frames, frames)`` with ``frames`` the raw interleaved PCM."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, fmt, frames = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            frames = body
        # LIST/fact/cue/... chunks are skipped; chunks are word-aligned
        pos += 8 + size + (size & 1)
    if fmt is None or frames is None:
        raise ValueError("missing fmt or data chunk")
    if len(fmt) < 16:
        raise ValueError("fmt chunk too short")
    tag, channels, rate, _brate, block, bits = struct.unpack_from(
        "<HHIIHH", fmt
    )
    if tag != 1:
        raise NotImplementedError(
            f"audio format {tag} (only PCM=1; float/ADPCM need a real "
            "audio library)"
        )
    if bits not in _SUPPORTED_BITS:
        raise NotImplementedError(f"{bits}-bit samples (only 8/16/24/32)")
    expect_block = channels * bits // 8
    if block != expect_block:
        raise ValueError(
            f"block align {block} inconsistent with "
            f"{channels}ch x {bits}bit"
        )
    if len(frames) % block:
        raise ValueError("data chunk is not a whole number of frames")
    return rate, channels, bits, len(frames) // block, frames


def resample_nearest(
    frames: bytes,
    channels: int,
    bits: int,
    n_frames: int,
    target_frames: int,
) -> bytes:
    """Nearest-neighbor resample to ``target_frames`` — deterministic
    and engine-portable (the PNG ``resize_nearest`` convention: source
    frame = floor((i + 0.5) * src / dst))."""
    if target_frames < 1:
        raise ValueError(f"target_frames must be >= 1, got {target_frames}")
    if n_frames == 0:
        raise ValueError("cannot resample an empty clip")
    block = channels * bits // 8
    out = bytearray(target_frames * block)
    for i in range(target_frames):
        src = min(n_frames - 1, int((i + 0.5) * n_frames / target_frames))
        out[i * block : (i + 1) * block] = frames[
            src * block : (src + 1) * block
        ]
    return bytes(out)
