"""Dependency-free minimal Avro object-container reader/writer.

Spark's avro source lives in the external spark-avro jar, absent in
this environment; the Avro container format itself is simple enough
(magic, metadata map with embedded JSON schema, deflate/null blocks,
zigzag-varint primitives) that a small pure-python path covers the
flat-record load/save contract with no dependencies.  ``io.load/save``
still prefer the jar when it is on the classpath (distributed scan,
full type surface) and fall back here.

Scope: records of primitive fields (boolean / int / long / float /
double / string / bytes), each nullable via the ``["null", T]``
union; one writer block; ``null`` and ``deflate`` codecs (deflate is
raw zlib, window -15, per the spec).  This is a driver-side small
path by design — at scale Avro needs the jar; the caller guards row
counts (io.SMALL_RESULT_ROWS).
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib
from typing import Any

import pandas as pd

_MAGIC = b"Obj\x01"


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _w_varint(out: bytearray, n: int) -> None:
    n = _zigzag(n)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _w_bytes(out: bytearray, b: bytes) -> None:
    _w_varint(out, len(b))
    out.extend(b)


def _w_str(out: bytearray, s: str) -> None:
    _w_bytes(out, s.encode("utf-8"))


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def varint(self) -> int:
        shift = n = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return _unzigzag(n)
            shift += 7

    def raw(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def bytes_(self) -> bytes:
        return self.raw(self.varint())

    def str_(self) -> str:
        return self.bytes_().decode("utf-8")


class _FileReader(_Reader):
    """Incremental file-backed reader: pulls bytes on demand so header
    parsing never materializes the member body in driver memory (r7
    ADVICE — the schema probe previously slurped the whole file)."""

    def __init__(self, f, chunk: int = 4096):
        super().__init__(b"")
        self._f = f
        self._chunk = chunk

    def _ensure(self, n: int) -> None:
        while len(self.buf) - self.pos < n:
            more = self._f.read(self._chunk)
            if not more:
                raise ValueError("truncated avro header")
            self.buf += more

    def varint(self) -> int:
        shift = n = 0
        while True:
            self._ensure(1)
            b = self.buf[self.pos]
            self.pos += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return _unzigzag(n)
            shift += 7

    def raw(self, n: int) -> bytes:
        self._ensure(n)
        return super().raw(n)


def _read_meta(r: _Reader) -> dict[str, bytes]:
    """Container metadata map (shared by the full decode and the
    header-only probe)."""
    meta: dict[str, bytes] = {}
    while True:
        n = r.varint()
        if n == 0:
            break
        if n < 0:  # negative counts are followed by a byte size
            n = -n
            r.varint()
        for _ in range(n):
            # explicit temporaries: Python evaluates an assignment's
            # RHS before the subscript key, which would read the pair
            # in reverse stream order
            key = r.str_()
            meta[key] = r.bytes_()
    return meta


def read_avro_header(path: str) -> tuple[dict, str]:
    """Parse ONLY the container header (magic + metadata map) with
    bounded incremental reads; returns ``(schema_dict, codec)``.
    The embedded ``avro.schema`` JSON is the dataset's authoritative
    schema — no row ever needs decoding to learn it."""
    with open(path, "rb") as f:
        r = _FileReader(f)
        if r.raw(4) != _MAGIC:
            raise ValueError(f"{path!r} is not an Avro container")
        meta = _read_meta(r)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec


def spark_schema_for(path: str):
    """Spark StructType straight from the container's embedded
    avro.schema JSON (r7 ADVICE medium: data inference over a probe's
    first rows breaks on all-null columns — [CANNOT_DETERMINE_TYPE] —
    while the header schema is authoritative and free).  Widening
    mapping (int→long, float→double) matches what the python decoder
    yields anyway."""
    from pyspark.sql import types as T

    avro_schema, _ = read_avro_header(path)
    if avro_schema.get("type") != "record":
        raise ValueError("only flat record schemas are supported")
    spark_t = {
        "int": T.LongType(),
        "long": T.LongType(),
        "float": T.DoubleType(),
        "double": T.DoubleType(),
        "boolean": T.BooleanType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
    }
    fields = []
    for f in avro_schema["fields"]:
        t = f["type"]
        nullable = False
        if isinstance(t, list):  # ["null", T] union
            branches = [b for b in t if b != "null"]
            nullable = len(branches) < len(t)
            if len(branches) != 1:
                raise ValueError(f"unsupported avro union {t!r}")
            t = branches[0]
        if isinstance(t, dict):
            # {"type": "long", "logicalType": "timestamp-millis"} —
            # unwrap exactly like _decode_value does (r8 ADVICE medium:
            # the decoder accepts these, so the schema mapper must too).
            t = t.get("type", t)
        if not isinstance(t, str) or t not in spark_t:
            raise ValueError(f"unsupported avro type {t!r}")
        fields.append(T.StructField(f["name"], spark_t[t], nullable))
    return T.StructType(fields)


def _field_type(dtype) -> str:
    # case-insensitive so pandas nullable dtypes (Int64/Float64/boolean)
    # map to their numeric avro types, not string. uint64 stays a
    # STRING: values ≥ 2^63 don't fit an avro long, and a spec-invalid
    # varint would poison external readers — lossless text instead.
    k = str(dtype).lower()
    if k.startswith("int") or k in ("uint8", "uint16", "uint32"):
        return "long"
    if k.startswith("float"):
        return "double"
    if k in ("bool", "boolean"):
        return "boolean"
    return "string"


def write_avro(pdf: pd.DataFrame, path: str, codec: str = "deflate") -> None:
    """Write a pandas frame as a one-block Avro container.  Every
    field is a ``["null", T]`` union so missing values round-trip."""
    fields = [
        {"name": str(c), "type": ["null", _field_type(t)]}
        for c, t in zip(pdf.columns, pdf.dtypes)
    ]
    schema = {"type": "record", "name": "row", "fields": fields}
    schema_json = json.dumps(schema)
    types = [f["type"][1] for f in fields]

    from parquet_editor_spark.sources._infer import is_missing

    body = bytearray()
    for row in pdf.astype(object).itertuples(index=False):
        for v, t in zip(row, types):
            if is_missing(v):  # None / NaN / pd.NA (scalar-safe)
                _w_varint(body, 0)  # union branch: null
                continue
            _w_varint(body, 1)  # union branch: value
            if t == "long":
                _w_varint(body, int(v))
            elif t == "double":
                body.extend(struct.pack("<d", float(v)))
            elif t == "boolean":
                body.append(1 if v else 0)
            else:
                _w_str(body, str(v))
    payload = bytes(body)
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    elif codec != "null":
        raise ValueError(f"unsupported avro codec {codec!r}")

    sync = hashlib.md5(schema_json.encode()).digest()  # deterministic
    out = bytearray(_MAGIC)
    _w_varint(out, 2)  # metadata map: 2 entries
    _w_str(out, "avro.schema")
    _w_str(out, schema_json)
    _w_str(out, "avro.codec")
    _w_str(out, codec)
    _w_varint(out, 0)  # end of map
    out.extend(sync)
    _w_varint(out, len(pdf))
    _w_varint(out, len(payload))
    out.extend(payload)
    out.extend(sync)
    with open(path, "wb") as f:
        f.write(out)


def _decode_value(r: _Reader, t: Any) -> Any:
    if isinstance(t, list):  # union — branch index selects the type
        return _decode_value(r, t[r.varint()])
    if isinstance(t, dict):
        t = t.get("type", t)
        return _decode_value(r, t)
    if t == "null":
        return None
    if t in ("int", "long"):
        return r.varint()
    if t == "float":
        return struct.unpack("<f", r.raw(4))[0]
    if t == "double":
        return struct.unpack("<d", r.raw(8))[0]
    if t == "boolean":
        return r.raw(1) == b"\x01"
    if t == "string":
        return r.str_()
    if t == "bytes":
        return r.bytes_()
    raise ValueError(f"unsupported avro type {t!r}")


def read_avro(path: str, max_rows: int | None = None) -> pd.DataFrame:
    """Read a flat-record Avro container into pandas (all blocks,
    null/deflate codecs).  ``max_rows`` stops DECODING once that many
    records are out (block-structured early exit); the raw file bytes
    are still read whole, so callers size-guard the path — a schema
    probe that must not hold the file belongs on
    ``read_avro_header``/``spark_schema_for`` instead (r7 ADVICE)."""
    with open(path, "rb") as f:
        return decode_avro(f.read(), origin=path, max_rows=max_rows)


def decode_avro(
    data: bytes, origin: str = "<bytes>", max_rows: int | None = None
) -> pd.DataFrame:
    """Decode a flat-record Avro container from BYTES — the unit the
    distributed scan path hands each executor (r6: io._load_avro maps
    this over binaryFile rows so a multi-file dataset decodes in
    parallel, one task per file, bytes never on the driver).
    ``max_rows``: early-exit after that many records (driver-side
    schema probes; r6 ADVICE — the probe must not decode the member)."""
    r = _Reader(data)
    if r.raw(4) != _MAGIC:
        raise ValueError(f"{origin!r} is not an Avro container")
    meta = _read_meta(r)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if schema.get("type") != "record":
        raise ValueError("only flat record schemas are supported")
    fields = schema["fields"]
    sync = r.raw(16)

    rows: list[tuple] = []
    done = False
    while r.pos < len(r.buf) and not done:
        count = r.varint()
        size = r.varint()
        block = r.raw(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        br = _Reader(block)
        for _ in range(count):
            rows.append(
                tuple(_decode_value(br, f["type"]) for f in fields)
            )
            if max_rows is not None and len(rows) >= max_rows:
                done = True  # probe satisfied: skip the remaining blocks
                break
        if not done and r.raw(16) != sync:
            raise ValueError("avro block sync mismatch")

    names = [f["name"] for f in fields]
    if not names:
        return pd.DataFrame()
    from parquet_editor_spark.sources._infer import series_for

    series = [
        series_for([row[i] for row in rows]).rename(i)
        for i in range(len(names))
    ]
    out = pd.concat(series, axis=1)
    out.columns = names
    return out
