"""Header-only FLAC metadata — dependency-free STREAMINFO parse.

FLAC audio decode needs libFLAC (absent here) and stays an honest
``NotImplementedError`` in ``operators/multimodal``; but the stream's
canonical metadata (sample rate, channels, bit depth, total samples)
lives in the mandatory first metadata block (STREAMINFO, type 0), a
fixed 34-byte bitfield right after the ``fLaC`` magic — so
``audio_meta`` gets a real FLAC path with zero audio-frame decoding.

``make_flac_header`` synthesizes a minimal structurally-valid stream
(magic + last-flagged STREAMINFO, no audio frames) for fixtures.
"""

from __future__ import annotations

_MAGIC = b"fLaC"


def flac_stream_info(
    data: bytes, origin: str = "<bytes>"
) -> tuple[int, int, int, int]:
    """(sample_rate, channels, bits_per_sample, total_samples) from
    the STREAMINFO block.  Raises ValueError on non-FLAC bytes or a
    stream whose first metadata block is not STREAMINFO (the spec
    mandates it is)."""
    if len(data) < 8 or data[:4] != _MAGIC:
        raise ValueError(f"{origin!r} is not a FLAC stream (no fLaC)")
    block_type = data[4] & 0x7F
    if block_type != 0:
        raise ValueError(
            f"{origin!r}: first metadata block is type {block_type}, "
            "spec requires STREAMINFO (0)"
        )
    length = int.from_bytes(data[5:8], "big")
    if length < 34 or len(data) < 8 + 34:
        raise ValueError(f"{origin!r}: truncated STREAMINFO block")
    b = data[8 : 8 + 34]
    # layout: u16 min_blocksize, u16 max_blocksize, u24 min_framesize,
    # u24 max_framesize, u20 sample_rate, u3 channels-1, u5 bits-1,
    # u36 total_samples, 128-bit md5
    bits = int.from_bytes(b[10:18], "big")  # the 64 bits after byte 10
    sample_rate = bits >> 44
    channels = ((bits >> 41) & 0x7) + 1
    bps = ((bits >> 36) & 0x1F) + 1
    total_samples = bits & ((1 << 36) - 1)
    if sample_rate == 0:
        raise ValueError(f"{origin!r}: STREAMINFO sample rate is 0")
    return sample_rate, channels, bps, total_samples


def make_flac_header(
    sample_rate: int,
    channels: int,
    bits_per_sample: int = 16,
    total_samples: int = 0,
) -> bytes:
    """Minimal structurally-valid FLAC prefix: magic + last-flagged
    STREAMINFO, zero audio frames — enough for any header-walking
    metadata reader, loudly NOT decodable to samples."""
    if not (0 < sample_rate < (1 << 20)):
        raise ValueError(f"sample_rate {sample_rate} out of range")
    if not (1 <= channels <= 8):
        raise ValueError(f"channels {channels} out of range")
    if not (1 <= bits_per_sample <= 32):
        raise ValueError(f"bits_per_sample {bits_per_sample} out of range")
    if not (0 <= total_samples < (1 << 36)):
        raise ValueError(f"total_samples {total_samples} out of range")
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | total_samples
    )
    body = (
        (4096).to_bytes(2, "big")  # min blocksize
        + (4096).to_bytes(2, "big")  # max blocksize
        + (0).to_bytes(3, "big")  # min framesize (unknown)
        + (0).to_bytes(3, "big")  # max framesize (unknown)
        + packed.to_bytes(8, "big")
        + bytes(16)  # md5 of the (absent) audio data
    )
    assert len(body) == 34
    return _MAGIC + bytes([0x80]) + len(body).to_bytes(3, "big") + body
