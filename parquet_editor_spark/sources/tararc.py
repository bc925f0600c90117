"""TAR (POSIX ustar) archives — the third dataset-bundle shape next
to ZIP (``ziparc.py``) and WARC (``warc.py``).  Web-scale corpora
ship as ``.tar`` / ``.tar.gz`` shards (WebDataset-style bundles of
sample files), so the ingestion tier must walk them executor-side.

The format is a sequence of 512-byte blocks: each member is one
header block (name, octal size/mtime, checksum, typeflag, ustar
magic, name prefix) followed by ``ceil(size/512)`` data blocks; the
archive ends with two zero blocks.  The walk below is hand-rolled —
headers validate their checksum (sum of header bytes with the
checksum field read as 8 spaces), so a single flipped byte fails the
member loudly instead of yielding garbage offsets.  ``.tar.gz``
payloads (gzip magic ``1f 8b``) inflate via stdlib zlib first, with
multi-member gzip streams concatenated the way ``warc.py`` does.

Pure functions over ``bytes``; the Spark stage that explodes payload
columns into member rows is ``operators/multimodal.py::tar_members``.
"""

from __future__ import annotations

BLOCK = 512
_REGULAR = (b"0", b"\x00")  # typeflag values for plain files


def _gunzip(data: bytes) -> bytes:
    """Concatenate all gzip members of a ``.tar.gz`` stream."""
    import zlib

    out, pos = [], 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data[pos:]))
        if not d.eof:
            raise ValueError("truncated gzip member in TAR stream")
        pos = len(data) - len(d.unused_data)
    return b"".join(out)


def _unzstd(data: bytes) -> bytes:
    """Decompress a ``.tar.zst`` stream via pyarrow's zstd codec (the
    same public Arrow C++ codec Spark's parquet reader links)."""
    import pyarrow as pa

    return pa.CompressedInputStream(
        pa.BufferReader(data), "zstd"
    ).read()


def _octal(field: bytes, what: str, origin: str) -> int:
    s = field.split(b"\x00", 1)[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError:
        raise ValueError(f"{origin!r}: bad octal {what} field {s!r}")


def parse_tar(data: bytes, origin: str = "<bytes>") -> list[dict]:
    """All regular-file members of a TAR archive (plain or gzipped),
    in stream order: ``{name, size, mtime, data}``.  Directory /
    link / pax entries are skipped; a bad header checksum, non-ustar
    magic or truncated data block raises ValueError."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip(data)
    elif data[:4] == b"\x28\xb5\x2f\xfd":
        data = _unzstd(data)
    members, pos = [], 0
    while pos + BLOCK <= len(data):
        hdr = data[pos : pos + BLOCK]
        if hdr == b"\x00" * BLOCK:  # end-of-archive zero block
            break
        stored = _octal(hdr[148:156], "checksum", origin)
        actual = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != actual:
            raise ValueError(
                f"{origin!r}: TAR header checksum mismatch at "
                f"offset {pos} ({stored} != {actual})"
            )
        if hdr[257:262] != b"ustar":
            raise ValueError(
                f"{origin!r}: not a ustar header at offset {pos}"
            )
        size = _octal(hdr[124:136], "size", origin)
        data_end = pos + BLOCK + size
        if data_end > len(data):
            raise ValueError(
                f"{origin!r}: truncated TAR member at offset {pos} "
                f"(need {size} bytes)"
            )
        typeflag = hdr[156:157]
        name = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
        # pre-ustar archives mark directories only by a trailing slash
        if typeflag in _REGULAR and not name.endswith("/"):
            prefix = hdr[345:500].split(b"\x00", 1)[0].decode(
                "utf-8", "replace"
            )
            members.append(
                {
                    "name": f"{prefix}/{name}" if prefix else name,
                    "size": size,
                    "mtime": _octal(hdr[136:148], "mtime", origin),
                    "data": data[pos + BLOCK : data_end],
                }
            )
        pos += BLOCK + ((size + BLOCK - 1) // BLOCK) * BLOCK
    else:
        # the loop must end at the zero end-of-archive block; running
        # off the end means the stream was cut mid-member
        if not members:
            raise ValueError(f"{origin!r}: not a TAR archive")
        raise ValueError(
            f"{origin!r}: truncated TAR stream (no end-of-archive "
            f"block after {len(members)} members)"
        )
    return members


def _octal_field(value: int, width: int) -> bytes:
    return f"{value:0{width - 1}o}".encode() + b"\x00"


def make_tar(
    members: list[tuple[str, str | bytes]],
    mtime: int = 0,
    gzip_compress: bool = False,
    compression: str | None = None,
) -> bytes:
    """Serialize ``(name, content)`` members as a ustar TAR.
    ``compression`` ∈ {None, 'gzip', 'zstd'} (``gzip_compress=True``
    is the legacy spelling of 'gzip').  Names longer than 100 bytes
    use the ustar prefix field; longer than 255 raise."""
    import zlib

    out = []
    for name, content in members:
        if isinstance(content, str):
            content = content.encode()
        nb = name.encode()
        prefix = b""
        if len(nb) > 100:
            cut = nb.rfind(b"/", 0, 156)
            if cut <= 0:
                raise ValueError(f"TAR member name too long: {name!r}")
            prefix, nb = nb[:cut], nb[cut + 1 :]
            if len(nb) > 100 or len(prefix) > 155:
                raise ValueError(f"TAR member name too long: {name!r}")
        hdr = bytearray(BLOCK)
        hdr[0 : len(nb)] = nb
        hdr[100:108] = _octal_field(0o644, 8)  # mode
        hdr[108:116] = _octal_field(0, 8)  # uid
        hdr[116:124] = _octal_field(0, 8)  # gid
        hdr[124:136] = _octal_field(len(content), 12)
        hdr[136:148] = _octal_field(mtime, 12)
        hdr[148:156] = b" " * 8  # checksum placeholder
        hdr[156:157] = b"0"  # regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        hdr[345 : 345 + len(prefix)] = prefix
        hdr[148:156] = f"{sum(hdr):06o}".encode() + b"\x00 "
        pad = (-len(content)) % BLOCK
        out += [bytes(hdr), content, b"\x00" * pad]
    out.append(b"\x00" * (2 * BLOCK))
    raw = b"".join(out)
    if gzip_compress:
        compression = "gzip"
    if compression == "gzip":
        gz = zlib.compressobj(9, zlib.DEFLATED, 31)
        return gz.compress(raw) + gz.flush()
    if compression == "zstd":
        import pyarrow as pa

        sink = pa.BufferOutputStream()
        with pa.CompressedOutputStream(sink, "zstd") as s:
            s.write(raw)
        return sink.getvalue().to_pybytes()
    if compression is not None:
        raise ValueError(f"unsupported TAR compression {compression!r}")
    return raw
