"""Multimodal column plumbing (SURVEY.md §2.7, north star): treat
image/audio/video payloads as opaque ``binary`` columns with typed
metadata, and run decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` operators.

The container has no image/audio libraries, so the DECODE step is
stubbed exactly as the project contract requires: a clearly-marked
``NotImplementedError`` path plus a deterministic fake
(``codec="fake"``) that exercises every piece of real Spark plumbing —
binary Arrow transfer, batch iteration, output schemas with array
columns, explode for frame sampling — without pretending to decode
pixels. Swapping in PIL/ffmpeg later changes ONLY the inner
``_decode_real`` function; schemas, partitioning and batch shapes are
production-shaped today.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata schema every payload row carries alongside the bytes
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("codec", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("checksum", T.StringType(), False),  # md5 hex
    ]
)


def attach_payload(
    df: DataFrame, source_col: str, media_type: str = "image", codec: str = "fake"
) -> DataFrame:
    """Wrap a source column's bytes as an opaque media payload +
    typed metadata. A string source is UTF-8 encoded; an
    already-binary source (e.g. the ``binaryFile`` scan's ``content``)
    passes through untouched. ``encode`` is a JVM expression; the
    checksum is md5 over the payload bytes (portable: Spark, DuckDB,
    hashlib all agree)."""
    already_binary = isinstance(
        df.schema[source_col].dataType, T.BinaryType
    )
    payload = (
        F.col(source_col)
        if already_binary
        else F.encode(F.col(source_col), "UTF-8")
    )
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(codec).alias("codec"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ),
    )


def _decode_real(payload: bytes, codec: str):
    """The real decoder seam. Image/audio libs are not in this
    container — anything but the deterministic fake codec fails
    loudly rather than fabricating pixels."""
    raise NotImplementedError(
        f"decode for codec {codec!r} requires PIL/ffmpeg; not available "
        "in this environment — use codec='fake' for pipeline testing"
    )


def _decode_fake(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: (width, height, channels) derived
    from the payload digest — stable across runs/engines, no pixel
    pretence."""
    d = hashlib.md5(payload).digest()
    return 16 + d[0] % 1024, 16 + d[1] % 1024, 1 + d[2] % 4


def decode_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode stage: payload → (width, height, channels) metadata.
    Arrow-batched; bytes never leave the executor."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("channels", T.IntegerType(), True),
        ]
    )

    def run(batches):
        # self-contained twin of _decode_fake: module-level refs would
        # pickle by reference and require the package on the WORKER's
        # PYTHONPATH — nested defs ship by value with the task
        import hashlib as _h

        def fake(p: bytes):
            d = _h.md5(p).digest()
            return 16 + d[0] % 1024, 16 + d[1] % 1024, 1 + d[2] % 4

        for pdf in batches:
            dims = [
                fake(bytes(p)) if p is not None else (None, None, None)
                for p in pdf[payload_col]
            ]
            pdf = pdf.copy()
            pdf["width"] = [d[0] for d in dims]
            pdf["height"] = [d[1] for d in dims]
            pdf["channels"] = [d[2] for d in dims]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def extract_features(
    df: DataFrame, payload_col: str = "payload", dim: int = 16
) -> DataFrame:
    """Feature-extraction stage: payload → float vector. Deterministic
    fake features (md5-seeded), but the batch shape, Arrow transfer
    and ``array<float>`` output schema are the production path — a
    real CNN/CLIP encoder drops into ``featurize`` unchanged."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("features", T.ArrayType(T.FloatType()), True)]
    )

    def run(batches):
        import hashlib as _h

        def featurize(payload: bytes) -> list[float]:
            # bytes([i]) only accepts 0-255; wider dims use a 2-byte
            # index suffix (identical values for i < 256 — the oracle
            # contract — and valid, distinct ones beyond)
            def sfx(i: int) -> bytes:
                return bytes([i]) if i < 256 else i.to_bytes(2, "big")

            raw = (_h.md5(payload + sfx(i)).digest()[0] for i in range(dim))
            return [round(b / 255.0, 6) for b in raw]

        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = [
                featurize(bytes(p)) if p is not None else None
                for p in pdf[payload_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    target_w: int = 224,
    target_h: int = 224,
) -> DataFrame:
    """Resize stage: payload → resized payload + target dimensions —
    the preprocessing step between ingestion and the encoder.  The
    pixel transform is a clearly-marked deterministic fake (digest of
    payload + target box; a real PIL/ffmpeg resize drops into
    ``shrink`` unchanged); the Arrow batch shape, binary-out schema
    and executor-local byte handling are the production path.

    Scale shape: pure mapInPandas projection — no shuffle, bytes never
    cross to the driver, output partitioning inherits the scan."""
    out_schema = T.StructType(
        [
            f
            for f in df.schema.fields
            if f.name not in (payload_col, "width", "height")
        ]
        + [
            T.StructField(payload_col, T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )
    names = [f.name for f in out_schema.fields]

    def run(batches):
        import hashlib as _h

        def shrink(p: bytes) -> bytes:
            # real impl: PIL Image.resize((target_w, target_h)).tobytes()
            return _h.md5(p + f"{target_w}x{target_h}".encode()).digest()

        for pdf in batches:
            pdf = pdf.copy()
            pdf[payload_col] = [
                shrink(bytes(p)) if p is not None else None
                for p in pdf[payload_col]
            ]
            pdf["width"] = target_w
            pdf["height"] = target_h
            yield pdf[names]

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame, payload_col: str = "payload", n_frames: int = 4
) -> DataFrame:
    """Frame-sampling stage (video): one payload row → n frame rows.
    Deterministic fake frame checksums; the explode shape (row
    multiplication inside the executor, no driver round-trip) is the
    real thing."""
    if n_frames < 1:
        # sequence(0, -1) DESCENDS and would fabricate frames 0 and -1
        raise ValueError(f"n_frames must be >= 1, got {n_frames}")
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.struct(
            i.cast("int").alias("frame_idx"),
            F.md5(F.concat(F.col(payload_col), i.cast("string").cast("binary"))).alias(
                "frame_checksum"
            ),
        ),
    )
    return df.withColumn("frame", F.explode(frames)).select(
        *df.columns, "frame.frame_idx", "frame.frame_checksum"
    )
