"""Kafka-shaped source/sink bridge.

The Kafka connector jars are not in this image, so this module
implements the part that is ours either way: the FRAME CONTRACT. A
Kafka source yields rows shaped ``(key binary, value binary, topic,
partition, offset, timestamp, timestampType)``; everything downstream
of that projection — JSON decode, watermarking, windowed aggregation,
dedup — is identical whether the frame came from Kafka, a file
source, or a test fixture. ``encode_kafka_frame`` produces that exact
shape from any DataFrame (batch or streaming), and
``decode_kafka_frame`` parses it back through a typed schema, so the
whole pipeline is testable today and becomes Kafka-backed by swapping
``spark.readStream.format("kafka")`` in front (same columns, same
types — the decode path does not change).

Scale: encode/decode are pure column expressions (``to_json`` /
``from_json``, JVM-side); partition/offset metadata is preserved so
downstream code can do per-partition ordering or offset bookkeeping.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the exact column set the Spark Kafka source produces.
KAFKA_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def encode_kafka_frame(
    df: DataFrame,
    key_col: str,
    topic: str,
    ts_col: Optional[str] = None,
    num_partitions: int = 8,
) -> DataFrame:
    """Serialize a DataFrame into Kafka frame shape: key → UTF-8 key
    bytes, full row → JSON value bytes, ``key hash % num_partitions``
    → partition (Kafka's default partitioner shape), per-partition
    ``offset`` via a window only at test scale (a real producer assigns
    offsets; this keeps the contract total).

    BATCH input only: the offset window is a non-time-based window, so
    a streaming DataFrame is refused eagerly with a clear error — for
    a real stream the producer (or writeStream kafka sink) assigns
    offsets and this frame-shaping step is unnecessary."""
    from pyspark.sql import Window

    if df.isStreaming:
        raise ValueError(
            "encode_kafka_frame shapes BATCH frames; streaming input "
            "gets offsets from the broker/sink, not a window"
        )

    payload_cols = [c for c in df.columns]
    ts: Column = (
        F.col(ts_col).cast("timestamp") if ts_col else F.lit(None).cast("timestamp")
    )
    framed = df.select(
        F.encode(F.col(key_col).cast("string"), "UTF-8").alias("key"),
        F.encode(F.to_json(F.struct(*payload_cols)), "UTF-8").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.crc32(F.col(key_col).cast("string").cast("binary")), F.lit(num_partitions))
        .cast("int")
        .alias("partition"),
        ts.alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    offset = F.row_number().over(
        Window.partitionBy("partition").orderBy("timestamp", "key")
    )
    return framed.withColumn("offset", (offset - 1).cast("long")).select(
        "key", "value", "topic", "partition", "offset", "timestamp", "timestampType"
    )


def decode_kafka_frame(
    frame: DataFrame,
    value_schema: T.StructType | str,
    ts_out: str = "kafka_ts",
) -> DataFrame:
    """Parse a Kafka-shaped frame back to typed columns: the standard
    first stage of every Kafka consumer pipeline
    (``from_json(cast(value as string))`` → flatten), keeping the
    frame timestamp for watermarking. Malformed payloads yield NULL
    structs (PERMISSIVE) rather than failing the stream."""
    parsed = frame.select(
        F.from_json(F.decode(F.col("value"), "UTF-8"), value_schema).alias("p"),
        F.col("timestamp").alias(ts_out),
    )
    return parsed.select("p.*", ts_out)
