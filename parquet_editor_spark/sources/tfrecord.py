"""TFRecord — the TensorFlow training-shard framing (public format:
each record is ``uint64 length | uint32 masked_crc32c(length) |
bytes data | uint32 masked_crc32c(data)``, little-endian).  Training
pipelines exchange tokenized corpora as TFRecord shards the way
multimodal ones use WebDataset TARs, so the ingestion tier walks
them executor-side next to ``tararc.py``/``warc.py``/``ziparc.py``.

The CRC is CRC-32C (Castagnoli, polynomial 0x1EDC6F41 reflected →
0x82F63B78), table-driven below, and TFRecord stores it "masked":
``((crc >> 15) | (crc << 17)) + 0xA282EAD8 (mod 2^32)``.  Both the
length CRC and the data CRC verify on read, so a flipped byte fails
the record loudly instead of yielding a garbage length walk.

Pure functions over ``bytes``; the Spark stage that explodes payload
columns into record rows is
``operators/multimodal.py::tfrecord_records``.
"""

from __future__ import annotations

import struct


def _make_table() -> list[int]:
    poly = 0x82F63B78  # reflected Castagnoli
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_TABLE = _make_table()


def crc32c(data: bytes) -> int:
    """CRC-32C.  Check value: ``crc32c(b"123456789") == 0xE3069283``."""
    c = 0xFFFFFFFF
    for b in data:
        c = _TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _masked(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def parse_tfrecord(data: bytes, origin: str = "<bytes>") -> list[bytes]:
    """All records of a TFRecord stream, in order.  Both the length
    CRC and the data CRC are verified; truncation or a CRC mismatch
    raises ValueError with the origin and offset."""
    records, pos, n = [], 0, len(data)
    while pos < n:
        if pos + 12 > n:
            raise ValueError(
                f"{origin!r}: truncated TFRecord header at offset {pos}"
            )
        length_bytes = data[pos : pos + 8]
        (length,) = struct.unpack("<Q", length_bytes)
        (len_crc,) = struct.unpack("<I", data[pos + 8 : pos + 12])
        if len_crc != _masked(crc32c(length_bytes)):
            raise ValueError(
                f"{origin!r}: TFRecord length CRC mismatch at "
                f"offset {pos}"
            )
        body_end = pos + 12 + length
        if body_end + 4 > n:
            raise ValueError(
                f"{origin!r}: truncated TFRecord data at offset {pos} "
                f"(need {length} bytes)"
            )
        body = data[pos + 12 : body_end]
        (data_crc,) = struct.unpack("<I", data[body_end : body_end + 4])
        if data_crc != _masked(crc32c(body)):
            raise ValueError(
                f"{origin!r}: TFRecord data CRC mismatch at "
                f"offset {pos}"
            )
        records.append(body)
        pos = body_end + 4
    return records


def make_tfrecord(records: list[str | bytes]) -> bytes:
    """Serialize records with the standard length+CRC framing."""
    out = []
    for rec in records:
        if isinstance(rec, str):
            rec = rec.encode()
        length_bytes = struct.pack("<Q", len(rec))
        out += [
            length_bytes,
            struct.pack("<I", _masked(crc32c(length_bytes))),
            rec,
            struct.pack("<I", _masked(crc32c(rec))),
        ]
    return b"".join(out)
