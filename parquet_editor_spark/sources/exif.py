"""EXIF metadata extraction from JPEG APP1 segments — pure bytes,
no PIL.

EXIF rides inside a JPEG as an APP1 marker segment whose payload is
``Exif\\0\\0`` followed by a complete little- or big-endian TIFF
block: IFD0 carries the camera tags (Make, Model, Orientation,
DateTime) plus a pointer (tag 34665) to the Exif sub-IFD
(PixelXDimension/PixelYDimension, ISO).  The TIFF IFD grammar is
already implemented for the image codec (``sources/tiff.py``), so
this module is a thin walk: find APP1, hand the embedded block to the
shared ``read_ifd_entries`` reader, follow the sub-IFD pointer.

Reference parity: the reference engine's media-metadata module
surfaces the same camera-tag tier for its image tables; re-expressed
here over pure ``bytes`` with the existing segment/IFD walkers.

A JPEG without an EXIF APP1 yields all-None fields (missing metadata
is data, not an error); structurally corrupt EXIF raises ValueError.
"""

from __future__ import annotations

from parquet_editor_spark.sources.tiff import _byte_order, read_ifd_entries

_EXIF_PREFIX = b"Exif\x00\x00"

#: IFD0 tags
TAG_MAKE = 271
TAG_MODEL = 272
TAG_ORIENTATION = 274
TAG_DATETIME = 306
TAG_EXIF_IFD = 34665
#: Exif sub-IFD tags
TAG_ISO = 34855
TAG_PIXEL_X = 40962
TAG_PIXEL_Y = 40963

_BARE_MARKERS = {0x01, 0xD8} | set(range(0xD0, 0xD8))


def _find_app1_exif(data: bytes, origin: str) -> bytes | None:
    """The embedded TIFF block of the first EXIF APP1 segment, or
    None when the stream carries no EXIF."""
    n = len(data)
    if n < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError(f"{origin!r} is not a JPEG stream (no SOI)")
    pos = 2
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"{origin!r}: expected a marker at byte {pos}")
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker in _BARE_MARKERS:
            continue
        if marker in (0xD9, 0xDA):  # EOI / entropy data: no EXIF ahead
            return None
        if pos + 2 > n:
            return None
        seg_len = int.from_bytes(data[pos : pos + 2], "big")
        if seg_len < 2:
            raise ValueError(
                f"{origin!r}: invalid segment length {seg_len} at {pos}"
            )
        if marker == 0xE1 and data[pos + 2 : pos + 8] == _EXIF_PREFIX:
            return data[pos + 8 : pos + seg_len]
        pos += seg_len
    return None


def _ascii(values: list[int] | None) -> str | None:
    if values is None:
        return None
    raw = bytes(v & 0xFF for v in values)
    return raw.split(b"\x00", 1)[0].decode("ascii", "replace")


def exif_from_jpeg(data: bytes, origin: str = "<bytes>") -> dict:
    """EXIF camera tags of a JPEG stream: ``{make, model, orientation,
    datetime, exif_w, exif_h, iso}`` — every field None when the
    stream has no EXIF APP1 (or lacks that tag)."""
    out = {
        "make": None,
        "model": None,
        "orientation": None,
        "datetime": None,
        "exif_w": None,
        "exif_h": None,
        "iso": None,
    }
    block = _find_app1_exif(data, origin)
    if block is None:
        return out
    endian = _byte_order(block, origin)
    (ifd0_at,) = __import__("struct").unpack_from(endian + "I", block, 4)
    ifd0 = read_ifd_entries(block, endian, ifd0_at, origin)
    out["make"] = _ascii(ifd0.get(TAG_MAKE))
    out["model"] = _ascii(ifd0.get(TAG_MODEL))
    if TAG_ORIENTATION in ifd0:
        out["orientation"] = ifd0[TAG_ORIENTATION][0]
    out["datetime"] = _ascii(ifd0.get(TAG_DATETIME))
    if TAG_EXIF_IFD in ifd0:
        sub = read_ifd_entries(
            block, endian, ifd0[TAG_EXIF_IFD][0], origin
        )
        if TAG_PIXEL_X in sub:
            out["exif_w"] = sub[TAG_PIXEL_X][0]
        if TAG_PIXEL_Y in sub:
            out["exif_h"] = sub[TAG_PIXEL_Y][0]
        if TAG_ISO in sub:
            out["iso"] = sub[TAG_ISO][0]
    return out


def _ifd_bytes(
    entries: list[tuple[int, int, list[int] | bytes]],
    ifd_at: int,
    endian: str,
) -> bytes:
    """Serialize one IFD: ``entries`` are (tag, type, values) with
    type 2 taking raw ASCII bytes, 3 SHORT, 4 LONG.  Out-of-line
    values land directly after the entry table."""
    import struct

    n = len(entries)
    table = bytearray(struct.pack(endian + "H", n))
    tail = bytearray()
    tail_at = ifd_at + 2 + 12 * n + 4  # after next-IFD pointer
    for tag, typ, values in sorted(entries):
        if typ == 2:
            raw = bytes(values)
            count = len(raw)
        elif typ == 3:
            raw = b"".join(struct.pack(endian + "H", v) for v in values)
            count = len(values)
        elif typ == 4:
            raw = b"".join(struct.pack(endian + "I", v) for v in values)
            count = len(values)
        else:
            raise ValueError(f"unsupported IFD entry type {typ}")
        ent = struct.pack(endian + "HHI", tag, typ, count)
        if len(raw) <= 4:
            ent += raw.ljust(4, b"\x00")
        else:
            ent += struct.pack(endian + "I", tail_at + len(tail))
            tail += raw
        table += ent
    table += struct.pack(endian + "I", 0)  # no next IFD
    return bytes(table) + bytes(tail)


def make_exif_app1(
    make: str | None = None,
    model: str | None = None,
    orientation: int | None = None,
    datetime: str | None = None,
    exif_w: int | None = None,
    exif_h: int | None = None,
    iso: int | None = None,
    big_endian: bool = False,
) -> bytes:
    """A complete APP1 marker segment (``FF E1`` + length + Exif TIFF
    block) carrying the given tags — the fixture builder for both
    byte orders."""
    import struct

    endian = ">" if big_endian else "<"

    sub_entries: list[tuple[int, int, list[int] | bytes]] = []
    if iso is not None:
        sub_entries.append((TAG_ISO, 3, [iso]))
    if exif_w is not None:
        sub_entries.append((TAG_PIXEL_X, 4, [exif_w]))
    if exif_h is not None:
        sub_entries.append((TAG_PIXEL_Y, 4, [exif_h]))

    ifd0_entries: list[tuple[int, int, list[int] | bytes]] = []
    if make is not None:
        ifd0_entries.append((TAG_MAKE, 2, make.encode("ascii") + b"\x00"))
    if model is not None:
        ifd0_entries.append((TAG_MODEL, 2, model.encode("ascii") + b"\x00"))
    if orientation is not None:
        ifd0_entries.append((TAG_ORIENTATION, 3, [orientation]))
    if datetime is not None:
        ifd0_entries.append(
            (TAG_DATETIME, 2, datetime.encode("ascii") + b"\x00")
        )

    ifd0_at = 8
    if sub_entries:
        # IFD0 gains the pointer entry; its own size fixes the
        # sub-IFD offset, so lay IFD0 out with a placeholder first
        probe = _ifd_bytes(
            ifd0_entries + [(TAG_EXIF_IFD, 4, [0])], ifd0_at, endian
        )
        sub_at = ifd0_at + len(probe)
        ifd0 = _ifd_bytes(
            ifd0_entries + [(TAG_EXIF_IFD, 4, [sub_at])], ifd0_at, endian
        )
        assert len(ifd0) == len(probe), "IFD0 layout must be stable"
        block = ifd0 + _ifd_bytes(sub_entries, sub_at, endian)
    else:
        block = _ifd_bytes(ifd0_entries, ifd0_at, endian)

    tiff = (b"MM" if big_endian else b"II") + struct.pack(
        endian + "HI", 42, ifd0_at
    ) + block
    payload = _EXIF_PREFIX + tiff
    return b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment into a JPEG right after SOI — where the
    EXIF spec puts it."""
    if len(jpeg) < 2 or jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    return jpeg[:2] + app1 + jpeg[2:]
