"""Spark 4 Python STREAMING data source: deterministic replay of a
parquet events table in fixed-size micro-batches.

``spark.readStream.format("events_replay")`` after registration —
offsets are plain row positions over a doc-ordered snapshot, so the
stream is exactly replayable: the same source + batch size always
produces the same micro-batch boundaries, which makes it the ideal
harness for exactly-once sink tests and watermark experiments (the
file-source alternative emits whole files per batch; this one gives
row-granular batches).

Implements ``SimpleDataSourceStreamReader`` — offset bookkeeping and
recovery (``initialOffset`` / ``read`` / ``readBetweenOffsets``) are
the real streaming-source contract; the data volume is small-path by
design (the snapshot is read driver-side per batch; production-scale
replay belongs to Kafka or the file source).
"""

from __future__ import annotations

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)


def _snapshot(path: str, order_col: str):
    import pyarrow.parquet as pq

    pdf = pq.read_table(path).to_pandas()
    return pdf.sort_values(order_col, kind="mergesort").reset_index(
        drop=True
    )


def _rows(pdf, lo: int, hi: int):
    # a picklable ITERATOR: the runtime pickles the batch for
    # replay/recovery (generators don't pickle) and also insists on
    # the iterator protocol (a bare list fails) — iter(list) is both
    from parquet_editor_spark.sources._infer import is_missing

    return iter(
        [
            tuple(None if is_missing(v) else v for v in row)
            for row in pdf.iloc[lo:hi].astype(object).itertuples(index=False)
        ]
    )


class EventsReplayDataSource(DataSource):
    """``format("events_replay")``: options ``path`` (parquet file),
    ``batchSize`` (rows per micro-batch, default 1000) and
    ``orderCol`` (total-order column, default ``event_id``)."""

    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self):
        import pyarrow.parquet as pq

        from parquet_editor_spark.sources._infer import (
            spark_type_for_arrow,
        )

        pa_schema = pq.read_schema(self.options["path"])
        return T.StructType(
            [
                T.StructField(
                    name,
                    spark_type_for_arrow(pa_schema.field(name).type),
                    True,
                )
                for name in pa_schema.names
            ]
        )

    def simpleStreamReader(self, schema) -> "ReplayStreamReader":
        return ReplayStreamReader(self.options)


class ReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.path = options["path"]
        self.batch_size = int(options.get("batchSize", "1000"))
        self.order_col = options.get("orderCol", "event_id")
        self._pdf = None

    def _data(self):
        if self._pdf is None:
            self._pdf = _snapshot(self.path, self.order_col)
        return self._pdf

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pdf = self._data()
        lo = int(start["pos"])
        hi = min(lo + self.batch_size, len(pdf))
        return _rows(pdf, lo, hi), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay/recovery path: must return exactly the same rows the
        # original batch carried
        return _rows(self._data(), int(start["pos"]), int(end["pos"]))

    def commit(self, end: dict) -> None:
        pass


def register_replay_source(spark) -> None:
    """Idempotent registration of the events_replay stream format."""
    spark.dataSource.register(EventsReplayDataSource)
