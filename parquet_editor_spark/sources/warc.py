"""Dependency-free WARC (ISO 28500) record walk — the Common Crawl
ingestion format a web-scale training-data pipeline reads first.

A WARC file is a sequence of records: a ``WARC/1.0`` version line,
``Name: value`` headers (notably ``WARC-Type``, ``WARC-Target-URI``
and ``Content-Length``), a blank line, exactly ``Content-Length``
payload bytes, then the ``\\r\\n\\r\\n`` record separator.  Crawl
archives ship either plain or as per-record gzip members glued into
one ``.warc.gz`` — both shapes parse here (stdlib zlib handles the
members; the record walk itself needs no library).

Scope: any WARC/1.0 or /1.1 stream; headers are returned verbatim
(case-insensitive lookup for the well-known ones), payloads as raw
bytes.  Truncated records raise ValueError — a crawl reader must
never silently drop tail records.  The Spark stage that explodes
payload columns into record rows lives in
``operators/textprep.py::warc_records``.
"""

from __future__ import annotations

_GZIP_MAGIC = b"\x1f\x8b"


def _gunzip_members(data: bytes) -> bytes:
    """Concatenate all gzip members of a ``.warc.gz`` stream (Common
    Crawl writes one member per record so ranges stay seekable)."""
    import zlib

    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(data[pos:])
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        pos = len(data) - len(d.unused_data)
    return bytes(out)


def parse_warc(data: bytes, origin: str = "<bytes>") -> list[dict]:
    """All records of a WARC stream (plain or gzipped): each a dict
    ``{warc_type, target_uri, date, content_type, headers, payload}``
    with ``headers`` the verbatim header list and ``payload`` the raw
    body bytes."""
    if data[:2] == _GZIP_MAGIC:
        data = _gunzip_members(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate the inter-record separators we're about to consume
        while data[pos : pos + 2] in (b"\r\n",) and pos < n:
            pos += 2
        if pos >= n:
            break
        eol = data.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError(f"{origin!r}: truncated version line at {pos}")
        version = data[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(
                f"{origin!r}: expected a WARC/ version line at byte "
                f"{pos}, got {version[:20]!r}"
            )
        pos = eol + 2
        headers: list[tuple[str, str]] = []
        while True:
            eol = data.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError(
                    f"{origin!r}: truncated header block at {pos}"
                )
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            name, sep, value = line.partition(b":")
            if not sep:
                raise ValueError(
                    f"{origin!r}: malformed header line {line[:40]!r}"
                )
            headers.append(
                (
                    name.decode("ascii", "replace").strip(),
                    value.decode("utf-8", "replace").strip(),
                )
            )
        hmap = {k.lower(): v for k, v in headers}
        try:
            length = int(hmap["content-length"])
        except KeyError:
            raise ValueError(
                f"{origin!r}: record at {pos} has no Content-Length"
            ) from None
        if pos + length > n:
            raise ValueError(
                f"{origin!r}: payload overruns the stream "
                f"({pos}+{length} > {n})"
            )
        payload = data[pos : pos + length]
        pos += length
        records.append(
            {
                "warc_type": hmap.get("warc-type"),
                "target_uri": hmap.get("warc-target-uri"),
                "date": hmap.get("warc-date"),
                "content_type": hmap.get("content-type"),
                "headers": headers,
                "payload": payload,
            }
        )
    return records


def make_warc(
    records: list[dict], gzip_members: bool = False
) -> bytes:
    """Serialize records (dicts with ``warc_type``/``target_uri``/
    ``date``/``content_type``/``payload``) into a WARC stream —
    per-record gzip members when ``gzip_members`` (the ``.warc.gz``
    convention)."""
    import zlib

    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec.get("payload", b"")
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        headers = [("WARC-Type", rec.get("warc_type") or "resource")]
        if rec.get("target_uri"):
            headers.append(("WARC-Target-URI", rec["target_uri"]))
        if rec.get("date"):
            headers.append(("WARC-Date", rec["date"]))
        headers.append(("WARC-Record-ID", f"<urn:rec:{i}>"))
        if rec.get("content_type"):
            headers.append(("Content-Type", rec["content_type"]))
        headers.append(("Content-Length", str(len(payload))))
        block = (
            b"WARC/1.0\r\n"
            + b"".join(
                f"{k}: {v}\r\n".encode("utf-8") for k, v in headers
            )
            + b"\r\n"
            + payload
            + b"\r\n\r\n"
        )
        if gzip_members:
            gz = zlib.compressobj(9, zlib.DEFLATED, 31)
            out += gz.compress(bytes(block)) + gz.flush()
        else:
            out += block
    return bytes(out)
