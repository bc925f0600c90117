"""Structured Streaming over the events table (SURVEY.md §2.9).

The reference's only asynchrony is a GUI thread-pool file load
(main.pyc:12-22,237-240) and its README lists "Asynchronous Data
Operations" as planned (readme.md:14). Here that capability is given
its principled Spark meaning: the SAME declarative operator surface
run incrementally — readStream → transform → writeStream, with
watermarks for late data and applyInPandasWithState for custom
stateful operators.
"""

from parquet_editor_spark.streaming.stream import (
    dedup_stream,
    enrich_static,
    followed_by_join,
    read_events_stream,
    read_table_stream,
    quality_rollup,
    quality_rollup_windowed,
    ts_as_ntz,
    session_window_counts,
    run_to_completion,
    sessionize_stateful,
    sessionize_tws,
    sliding_counts,
    refresh_stream_matview,
    upsert_stream_parquet,
    windowed_counts,
    write_stream_parquet,
)

__all__ = [
    "dedup_stream",
    "enrich_static",
    "followed_by_join",
    "read_events_stream",
    "read_table_stream",
    "quality_rollup",
    "quality_rollup_windowed",
    "ts_as_ntz",
    "session_window_counts",
    "run_to_completion",
    "sessionize_stateful",
    "sessionize_tws",
    "sliding_counts",
    "refresh_stream_matview",
    "upsert_stream_parquet",
    "windowed_counts",
    "write_stream_parquet",
]
