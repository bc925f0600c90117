"""Source/sink surface — re-exported from :mod:`parquet_editor_spark.io`.

The format dispatch (CSV/Excel/JSON/Parquet/ORC, main.py:67-86 parity),
the nanos-timestamp bridge, bucketed catalog tables and small-files
compaction all live in ``io.py``; this package path exists so the
source surface has a stable import home if connectors (Kafka, JDBC,
Delta — jars not in this image) are added later.
"""

from parquet_editor_spark.io import (  # noqa: F401
    compact_files,
    detect_format,
    empty,
    load,
    load_parquet_nanos,
    save,
    save_bucketed,
)
