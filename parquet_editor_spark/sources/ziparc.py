"""ZIP archive access over ``bytes`` — the bundle format datasets
ship in (per-document members, deflate-compressed), the sibling of
the WARC crawl tier (``sources/warc.py``).

Thin, honest wrappers over stdlib ``zipfile`` (bundled with CPython —
not an external dependency): pure functions over payload bytes so the
Spark stage (``operators/multimodal.py::zip_members``) can explode
archives entirely executor-side.  The central directory lives at the
end of the file, so listing is O(directory), and each member
decompresses independently — the property that makes per-member
parallelism work at scale.
"""

from __future__ import annotations

import io
import zipfile


def parse_zip(data: bytes, origin: str = "<bytes>") -> list[dict]:
    """All members of a ZIP archive, in central-directory order:
    ``{name, size, compressed_size, crc32, data}``.  Raises
    ValueError on non-ZIP bytes or a corrupt member (CRC mismatch
    surfaces as BadZipFile → ValueError — an archive reader must not
    silently truncate)."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            out = []
            for zi in zf.infolist():
                if zi.is_dir():
                    continue
                out.append(
                    {
                        "name": zi.filename,
                        "size": zi.file_size,
                        "compressed_size": zi.compress_size,
                        "crc32": zi.CRC,
                        "data": zf.read(zi),
                    }
                )
            return out
    except zipfile.BadZipFile as e:
        raise ValueError(f"{origin!r}: not a valid ZIP archive: {e}")


def make_zip(
    members: list[tuple[str, bytes | str]], compress: bool = True
) -> bytes:
    """Serialize (name, data) members into a ZIP archive —
    deflate-compressed by default, with fixed timestamps so identical
    inputs produce identical bytes (engine-portable fixtures)."""
    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as zf:
        for name, data in members:
            if isinstance(data, str):
                data = data.encode("utf-8")
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = method
            zf.writestr(zi, data)
    return buf.getvalue()
