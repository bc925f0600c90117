"""Dependency-free WAV (RIFF/PCM) codec — the audio sibling of
``sources/png.py``, closing the second multimodal decode seam.

Scope (public RIFF/WAVE spec, nothing else):

- PCM integer formats (audio format tag 1), 8/16/24/32-bit integer
  samples, any channel count / sample rate (frames are moved as opaque
  blocks — sample width only affects block math).
- IEEE-float formats (tag 3), 32/64-bit (r5 verdict item 4 — the
  format feature-extraction pipelines exchange most after 16-bit PCM).
  Per the spec non-PCM files carry a ``fact`` chunk; the encoder
  writes one and the decoder tolerates its absence.
- ADPCM, extensible (tag 0xFFFE) and other compressed formats raise
  ``NotImplementedError`` — those belong to a real audio library.
- The parser walks chunks (skipping LIST/fact/etc.), validates sizes,
  and tolerates the common off-spec trailing-pad byte.

Pure functions over ``bytes``; the Spark side (Arrow batches,
mapInPandas) lives in ``operators/multimodal.py``.
"""

from __future__ import annotations

import struct

_SUPPORTED_BITS = {8, 16, 24, 32}
_FLOAT_BITS = {32, 64}
PCM = 1
IEEE_FLOAT = 3


def encode_wav(
    sample_rate: int,
    channels: int,
    bits: int,
    frames: bytes,
    fmt_tag: int = PCM,
) -> bytes:
    """Serialize raw frames (interleaved, ``bits``-per-sample) into a
    canonical WAV file.  ``fmt_tag`` PCM (1, default) takes 8/16/24/32
    integer bits; IEEE_FLOAT (3) takes 32/64 and, per the spec's
    non-PCM rule, adds a ``fact`` chunk with the frame count."""
    if channels < 1:
        raise ValueError(f"channels must be >= 1, got {channels}")
    if sample_rate < 1:
        raise ValueError(f"sample_rate must be >= 1, got {sample_rate}")
    if fmt_tag == PCM:
        if bits not in _SUPPORTED_BITS:
            raise ValueError(f"bits must be one of {sorted(_SUPPORTED_BITS)}")
    elif fmt_tag == IEEE_FLOAT:
        if bits not in _FLOAT_BITS:
            raise ValueError(
                f"float WAV bits must be one of {sorted(_FLOAT_BITS)}"
            )
    else:
        raise ValueError(f"unsupported format tag {fmt_tag} (PCM=1, float=3)")
    block = channels * bits // 8
    if block == 0 or len(frames) % block:
        raise ValueError(
            f"frame buffer of {len(frames)} bytes is not a multiple of "
            f"the {block}-byte frame size"
        )
    fmt = struct.pack(
        "<HHIIHH",
        fmt_tag,
        channels,
        sample_rate,
        sample_rate * block,  # byte rate
        block,
        bits,
    )
    fact = (
        b"" if fmt_tag == PCM
        else b"fact" + struct.pack("<II", 4, len(frames) // block)
    )
    data_size = len(frames)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + len(fact) + 8 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + fact
        + b"data"
        + struct.pack("<I", data_size)
        + frames
    )


def decode_wav(data: bytes) -> tuple[int, int, int, int, bytes]:
    """Parse a WAV container; returns ``(sample_rate, channels, bits,
    n_frames, frames)`` with ``frames`` the raw interleaved samples.
    Accepts PCM and IEEE-float; ``decode_wav_ex`` adds the format tag
    for callers that need to tell them apart."""
    rate, channels, bits, n, frames, _tag = decode_wav_ex(data)
    return rate, channels, bits, n, frames


def decode_wav_ex(data: bytes) -> tuple[int, int, int, int, bytes, int]:
    """``decode_wav`` plus the fmt tag (PCM=1 / IEEE_FLOAT=3)."""
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
    if tag == PCM:
        if bits not in _SUPPORTED_BITS:
            raise NotImplementedError(
                f"{bits}-bit PCM samples (only 8/16/24/32)"
            )
    elif tag == IEEE_FLOAT:
        if bits not in _FLOAT_BITS:
            raise NotImplementedError(
                f"{bits}-bit float samples (only 32/64)"
            )
    else:
        raise NotImplementedError(
            f"audio format {tag} (PCM=1 and IEEE float=3; ADPCM and "
            "extensible need a real audio library)"
        )
    expect_block = channels * bits // 8
    if block != expect_block:
        raise ValueError(
            f"block align {block} inconsistent with "
            f"{channels}ch x {bits}bit"
        )
    if len(frames) % block:
        raise ValueError("data chunk is not a whole number of frames")
    return rate, channels, bits, len(frames) // block, frames, tag


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
