"""Baseline TIFF codec — dependency-free IFD walk, strip decode,
and a matching encoder for fixtures.

Scope (the honest dependency-free tier, like the sibling PNG/GIF/BMP
codecs): 8-bit grayscale and RGB(A), chunky planar config, strips
(not tiles), compression 1 (none), 32773 (PackBits) and 5 (TIFF
LZW — MSB-first code packing with early code-width change, distinct
from GIF's LSB-first variant in ``sources/gif.py``).  Both byte
orders (II/MM).  Photometric 0 (WhiteIsZero) is inverted to the
canonical black-is-zero layout on decode.  Anything outside this
tier — tiles, planar=2, 16-bit, palettes, JPEG-in-TIFF — raises
``NotImplementedError``; malformed structures raise ``ValueError``.

``tiff_meta`` reads dimensions/channels from the IFD alone (O(IFD),
no strip decode) for the ``decode_meta`` header path.
"""

from __future__ import annotations

import struct


def _byte_order(data: bytes, origin: str) -> str:
    if len(data) < 8:
        raise ValueError(f"{origin!r}: too short for a TIFF header")
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError(f"{origin!r} is not a TIFF (no II/MM)")
    (magic,) = struct.unpack_from(endian + "H", data, 2)
    if magic != 42:
        raise ValueError(f"{origin!r}: bad TIFF magic {magic}")
    return endian


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 9: 4}


def _read_ifd(data: bytes, origin: str) -> dict[int, list[int]]:
    """First IFD → {tag: [values...]} for integer-typed entries."""
    endian = _byte_order(data, origin)
    (ifd_at,) = struct.unpack_from(endian + "I", data, 4)
    return read_ifd_entries(data, endian, ifd_at, origin)


def read_ifd_entries(
    data: bytes, endian: str, ifd_at: int, origin: str
) -> dict[int, list[int]]:
    """IFD at ``ifd_at`` → {tag: [values...]} for byte/ASCII/short/
    long-typed entries — shared by the image IFD walk here and the
    EXIF APP1 walk (``sources/exif.py``), which reads sub-IFDs at
    pointer offsets."""
    if ifd_at + 2 > len(data):
        raise ValueError(f"{origin!r}: IFD offset out of bounds")
    (n_entries,) = struct.unpack_from(endian + "H", data, ifd_at)
    out: dict[int, list[int]] = {}
    for i in range(n_entries):
        at = ifd_at + 2 + 12 * i
        if at + 12 > len(data):
            raise ValueError(f"{origin!r}: truncated IFD entry {i}")
        tag, typ, count = struct.unpack_from(endian + "HHI", data, at)
        if typ not in _TYPE_SIZE:
            continue  # RATIONAL etc — not needed for the baseline tier
        size = _TYPE_SIZE[typ] * count
        if size <= 4:
            buf, off = data, at + 8
        else:
            (off,) = struct.unpack_from(endian + "I", data, at + 8)
            if off + size > len(data):
                raise ValueError(
                    f"{origin!r}: IFD entry {tag} values out of bounds"
                )
            buf = data
        fmt = {1: "B", 2: "B", 3: "H", 4: "I", 6: "b", 7: "B", 9: "i"}[typ]
        out[tag] = list(
            struct.unpack_from(endian + fmt * count, buf, off)
        )
    return out


def tiff_meta(data: bytes, origin: str = "<bytes>") -> tuple[int, int, int]:
    """(width, height, channels) from the first IFD — no strip
    decode, the O(header) path for ``decode_meta``."""
    ifd = _read_ifd(data, origin)
    try:
        w = ifd[256][0]
        h = ifd[257][0]
    except KeyError:
        raise ValueError(f"{origin!r}: IFD missing width/height tags")
    ch = ifd.get(277, [1])[0]
    if w < 1 or h < 1 or ch < 1:
        raise ValueError(f"{origin!r}: bad dimensions {w}x{h}x{ch}")
    return w, h, ch


def _unpackbits(src: bytes, expect: int, origin: str) -> bytes:
    """Apple PackBits: n≥0 → copy n+1 literals; −127≤n≤−1 → repeat
    next byte 1−n times; −128 is a no-op."""
    out = bytearray()
    pos = 0
    while pos < len(src) and len(out) < expect:
        n = src[pos]
        pos += 1
        if n < 128:
            out += src[pos : pos + n + 1]
            if pos + n + 1 > len(src):
                raise ValueError(f"{origin!r}: PackBits literal overrun")
            pos += n + 1
        elif n == 128:
            continue
        else:
            if pos >= len(src):
                raise ValueError(f"{origin!r}: PackBits run overrun")
            out += bytes([src[pos]]) * (257 - n)
            pos += 1
    if len(out) < expect:
        raise ValueError(
            f"{origin!r}: PackBits strip decoded {len(out)} < {expect}"
        )
    return bytes(out[:expect])


def _packbits(src: bytes) -> bytes:
    """PackBits encode (runs ≥3 as repeats, else literals)."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        run = 1
        while i + run < n and run < 128 and src[i + run] == src[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, src[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 128 and src[i + run] == src[i]:
                run += 1
            if run >= 3:
                break
            i += run
            if i - lit_start >= 128:
                i = lit_start + 128
                break
        chunk = src[lit_start:i]
        out += bytes([len(chunk) - 1]) + chunk
    return bytes(out)


def _lzw_decode_msb(
    src: bytes, expect: int | None, origin: str
) -> bytes:
    """TIFF LZW (spec §13): MSB-first code packing, Clear=256,
    EOI=257, first dynamic code 258, code width grows at 511/1023/
    2047 (early change — one code BEFORE the table fills).  With
    ``expect=None`` (the PDF /LZWDecode caller — same MSB
    early-change variant, ISO 32000 §7.4.4) the full decode is
    returned at EOI/end-of-data instead of truncating to a strip
    size."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]

    reset()
    width = 9
    acc = bit_count = 0
    prev: bytes | None = None
    for byte in src:
        acc = (acc << 8) | byte
        bit_count += 8
        while bit_count >= width:
            code = (acc >> (bit_count - width)) & ((1 << width) - 1)
            bit_count -= width
            if code == CLEAR:
                reset()
                width = 9
                prev = None
                continue
            if code == EOI:
                if expect is None:
                    return bytes(out)
                if len(out) < expect:
                    raise ValueError(
                        f"{origin!r}: LZW EOI before strip complete"
                    )
                return bytes(out[:expect])
            if prev is None:
                if code >= len(table):
                    raise ValueError(f"{origin!r}: bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"{origin!r}: LZW code out of range")
            out += entry
            prev = entry
            # early change: width grows when the NEXT code would
            # overflow, i.e. at table sizes 511/1023/2047
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    if expect is None:
        return bytes(out)
    if len(out) < expect:
        raise ValueError(
            f"{origin!r}: LZW strip decoded {len(out)} < {expect}"
        )
    return bytes(out[:expect])


def _lzw_encode_msb(src: bytes) -> bytes:
    """TIFF LZW encode matching :func:`_lzw_decode_msb`."""
    CLEAR, EOI = 256, 257
    out_bits: list[tuple[int, int]] = []
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits.append((CLEAR, width))
    prev = b""
    for b in src:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        out_bits.append((table[prev], width))
        table[cur] = next_code
        next_code += 1
        # early change mirror: widen when next_code+1 would overflow
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            out_bits.append((CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([b])
    if prev:
        out_bits.append((table[prev], width))
    out_bits.append((EOI, width))
    acc = bit_count = 0
    out = bytearray()
    for code, w in out_bits:
        acc = (acc << w) | code
        bit_count += w
        while bit_count >= 8:
            out.append((acc >> (bit_count - 8)) & 0xFF)
            bit_count -= 8
    if bit_count:
        out.append((acc << (8 - bit_count)) & 0xFF)
    return bytes(out)


def decode_tiff(
    data: bytes, origin: str = "<bytes>"
) -> tuple[int, int, int, bytes]:
    """Decode a baseline-tier TIFF → (width, height, channels,
    row-major 8-bit samples), mirroring the sibling codecs'
    signature."""
    ifd = _read_ifd(data, origin)
    w, h, ch = tiff_meta(data, origin)
    comp = ifd.get(259, [1])[0]
    bits = ifd.get(258, [8] * ch)
    if any(b != 8 for b in bits):
        raise NotImplementedError(
            f"{bits}-bit TIFF (8-bit samples only)"
        )
    if ifd.get(284, [1])[0] != 1:
        raise NotImplementedError("planar TIFF (chunky only)")
    if 322 in ifd or 323 in ifd:
        raise NotImplementedError("tiled TIFF (strips only)")
    photometric = ifd.get(262, [1])[0]
    if photometric not in (0, 1, 2):
        raise NotImplementedError(
            f"photometric {photometric} TIFF (gray/RGB only)"
        )
    offsets = ifd.get(273)
    counts = ifd.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError(f"{origin!r}: missing/mismatched strip tags")
    rows_per_strip = ifd.get(278, [h])[0]
    row_bytes = w * ch
    out = bytearray()
    remaining = h
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ValueError(f"{origin!r}: strip {i} out of bounds")
        strip_rows = min(rows_per_strip, remaining)
        expect = strip_rows * row_bytes
        raw = data[off : off + cnt]
        if comp == 1:
            if len(raw) < expect:
                raise ValueError(
                    f"{origin!r}: strip {i} is {len(raw)} B < {expect}"
                )
            out += raw[:expect]
        elif comp == 32773:
            out += _unpackbits(raw, expect, origin)
        elif comp == 5:
            out += _lzw_decode_msb(raw, expect, origin)
        else:
            raise NotImplementedError(
                f"TIFF compression {comp} (none/PackBits/LZW only)"
            )
        remaining -= strip_rows
    if remaining != 0:
        raise ValueError(f"{origin!r}: strips cover {h - remaining} rows")
    pix = bytes(out)
    if photometric == 0:  # WhiteIsZero → invert to black-is-zero
        pix = bytes(255 - b for b in pix)
    return w, h, ch, pix


def encode_tiff(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    compression: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
) -> bytes:
    """Serialize 8-bit samples into a spec-valid striped TIFF
    (compression 1, 32773 or 5)."""
    if channels not in (1, 3, 4):
        raise ValueError(f"channels must be 1/3/4, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixels is {len(pixels)} B, expected "
            f"{width * height * channels}"
        )
    if compression not in (1, 32773, 5):
        raise ValueError(f"unsupported compression {compression}")
    endian = ">" if big_endian else "<"
    rps = rows_per_strip or height or 1
    row_bytes = width * channels
    strips = []
    for top in range(0, height, rps):
        raw = pixels[top * row_bytes : min(top + rps, height) * row_bytes]
        if compression == 32773:
            strips.append(_packbits(raw))
        elif compression == 5:
            strips.append(_lzw_encode_msb(raw))
        else:
            strips.append(raw)
    n_strips = max(1, len(strips))

    entries = []  # (tag, type, count, values)
    photometric = 1 if channels == 1 else 2
    entries.append((256, 4, 1, [width]))
    entries.append((257, 4, 1, [height]))
    entries.append((258, 3, channels, [8] * channels))
    entries.append((259, 3, 1, [compression]))
    entries.append((262, 3, 1, [photometric]))
    entries.append((277, 3, 1, [channels]))
    entries.append((278, 4, 1, [rps]))
    if channels == 4:
        entries.append((338, 3, 1, [2]))  # unassociated alpha
    # strip offsets/counts get placeholders, patched below
    entries.append((273, 4, n_strips, [0] * n_strips))
    entries.append((279, 4, n_strips, [len(s) for s in strips] or [0]))
    entries.sort(key=lambda e: e[0])

    header = struct.pack(
        endian + "2sHI", b"MM" if big_endian else b"II", 42, 8
    )
    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    # out-of-line value area sits right after the IFD
    extra_at = 8 + ifd_size
    extra = bytearray()
    slots = []
    for tag, typ, count, values in entries:
        size = _TYPE_SIZE[typ] * count
        if size > 4:
            slots.append((tag, typ, count, extra_at + len(extra)))
            fmt = {3: "H", 4: "I"}[typ]
            extra += struct.pack(endian + fmt * count, *values)
        else:
            slots.append((tag, typ, count, None))
    strips_at = extra_at + len(extra)
    offsets = []
    acc = strips_at
    for s in strips:
        offsets.append(acc)
        acc += len(s)

    ifd = bytearray(struct.pack(endian + "H", n))
    for (tag, typ, count, values), (_t, _ty, _c, off) in zip(
        entries, slots
    ):
        if tag == 273:
            values = offsets or [0]
        ent = struct.pack(endian + "HHI", tag, typ, count)
        size = _TYPE_SIZE[typ] * count
        if size > 4:
            if tag == 273:
                # patch the out-of-line offsets area
                fmt = {3: "H", 4: "I"}[typ]
                at = off - extra_at
                extra[at : at + size] = struct.pack(
                    endian + fmt * count, *values
                )
            ent += struct.pack(endian + "I", off)
        else:
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            packed = struct.pack(endian + fmt * count, *values)
            ent += packed + b"\x00" * (4 - len(packed))
        ifd += ent
    ifd += struct.pack(endian + "I", 0)  # no next IFD
    return bytes(header) + bytes(ifd) + bytes(extra) + b"".join(strips)
