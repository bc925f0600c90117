"""Dependency-free Y4M (YUV4MPEG2) codec — the video sibling of
``sources/png.py`` and ``sources/wav.py``, closing the third and last
multimodal decode seam with a real public format.

YUV4MPEG2 is the uncompressed interchange format video toolchains
(ffmpeg, x264, VMAF) pipe between stages: an ASCII header
(``YUV4MPEG2 W<w> H<h> F<num>:<den> ...``) followed by frames, each a
``FRAME\\n`` marker plus raw planar YUV bytes.  No entropy coding, no
DCT — exactly the slice of "video" that is honest to implement from
the public spec with zero dependencies.  Compressed codecs (H.264,
VP9, ...) stay behind the ``NotImplementedError`` seam where they
belong.

Scope: 4:2:0 (default, 1.5 bytes/px), 4:2:2 (2 B/px) and 4:4:4
(3 B/px) chroma samplings, 8-bit; interlacing/extensions are carried
through the header untouched.  Pure functions over ``bytes``; the
Spark side lives in ``operators/multimodal.py``.
"""

from __future__ import annotations

_MAGIC = b"YUV4MPEG2"

#: colourspace tag → bytes per pixel (numerator, denominator)
_BPP = {
    "420": (3, 2),
    "420jpeg": (3, 2),
    "420mpeg2": (3, 2),
    "420paldv": (3, 2),
    "422": (2, 1),
    "444": (3, 1),
}


def _frame_bytes(width: int, height: int, cs: str) -> int:
    num, den = _BPP[cs]
    return width * height * num // den


def encode_y4m(
    width: int,
    height: int,
    fps: tuple[int, int],
    frames: list[bytes],
    cs: str = "420",
) -> bytes:
    """Serialize raw planar YUV frames into a Y4M stream."""
    if cs not in _BPP:
        raise ValueError(f"colourspace must be one of {sorted(_BPP)}")
    if width < 1 or height < 1:
        raise ValueError(f"invalid dimensions {width}x{height}")
    if fps[0] < 1 or fps[1] < 1:
        raise ValueError(f"invalid frame rate {fps}")
    fb = _frame_bytes(width, height, cs)
    out = bytearray(
        b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n"
        % (width, height, fps[0], fps[1], cs.encode())
    )
    for i, f in enumerate(frames):
        if len(f) != fb:
            raise ValueError(
                f"frame {i} is {len(f)} bytes, expected {fb} for "
                f"{width}x{height} C{cs}"
            )
        out += b"FRAME\n" + f
    return bytes(out)


def decode_y4m(data: bytes):
    """Parse a Y4M stream; returns ``(width, height, fps_num, fps_den,
    cs, frames)`` with ``frames`` a list of raw planar YUV buffers."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(_MAGIC + b" "):
        raise ValueError("not a Y4M stream: bad YUV4MPEG2 header")
    width = height = None
    num, den = 25, 1
    cs = "420"
    for tok in data[len(_MAGIC) + 1 : nl].split(b" "):
        if not tok:
            continue
        key, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        if key == "W":
            width = int(val)
        elif key == "H":
            height = int(val)
        elif key == "F":
            num, den = (int(x) for x in val.split(":"))
        elif key == "C":
            if val not in _BPP:
                raise NotImplementedError(
                    f"colourspace C{val} (8-bit 420/422/444 only)"
                )
            cs = val
        # Ip/A/X params carried through, not interpreted
    if width is None or height is None or width < 1 or height < 1:
        raise ValueError("Y4M header missing W/H")
    fb = _frame_bytes(width, height, cs)
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        body = data[fnl + 1 : fnl + 1 + fb]
        if len(body) != fb:
            raise ValueError(f"truncated frame {len(frames)}")
        frames.append(body)
        pos = fnl + 1 + fb
    return width, height, num, den, cs, frames


def sample_frame_indices(n_frames: int, k: int) -> list[int]:
    """Evenly-spaced frame sampling (the PNG/WAV nearest convention:
    index = floor((i + 0.5) * n / k)), deduplicated and ordered —
    the standard keyframe-ish sampling a vision pipeline feeds its
    encoder."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_frames < 1:
        raise ValueError("cannot sample an empty clip")
    seen = []
    for i in range(k):
        idx = min(n_frames - 1, int((i + 0.5) * n_frames / k))
        if not seen or seen[-1] != idx:
            seen.append(idx)
    return seen
