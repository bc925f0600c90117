"""Spark 4 Python DataSource wrapping the xlsx codec: after
``register_xlsx_source(spark)``, ``spark.read.format("xlsx")``
works like any other source — schema inference, lazy scan, the
DataFrame API end to end — with the dependency-free SpreadsheetML
reader (sources/xlsx.py) doing the cell decoding inside the
executor-side ``read()``.

This is the engine-idiomatic seam the driver-side pandas bridge in
``io._load_excel`` cannot offer: the scan participates in Catalyst
like a real source (column pruning happens post-scan; a spreadsheet
has no row-group statistics to push into).  Single-partition by
design — one .xlsx is one small file; the scale path for spreadsheet
data remains "convert to parquet once".  On a cluster the path must
be on shared storage (executors open it directly).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql import types as T


def _schema_of(path: str) -> T.StructType:
    from parquet_editor_spark.io import _guard_small_source
    from parquet_editor_spark.sources._infer import spark_type_for_pandas
    from parquet_editor_spark.sources.xlsx import read_xlsx

    _guard_small_source(path, "xlsx datasource")
    pdf = read_xlsx(path)
    return T.StructType(
        [
            T.StructField(str(name), spark_type_for_pandas(dtype), True)
            for name, dtype in zip(pdf.columns, pdf.dtypes)
        ]
    )


class XlsxDataSource(DataSource):
    """``spark.read.format("xlsx").load(path)`` via the Python
    DataSource API (Spark 4)."""

    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self):
        return _schema_of(self.options["path"])

    def reader(self, schema) -> "XlsxReader":
        return XlsxReader(self.options["path"], schema)


class XlsxReader(DataSourceReader):
    def __init__(self, path: str, schema) -> None:
        self.path = path
        self.schema = schema

    def partitions(self):
        # one small file, one partition — by contract, not accident
        return [InputPartition(0)]

    def read(self, partition):
        from parquet_editor_spark.sources._infer import is_missing
        from parquet_editor_spark.sources.xlsx import read_xlsx

        pdf = read_xlsx(self.path)
        # POSITIONAL alignment with the inferred schema: a name-based
        # reselection would double-select duplicate headers (legal in
        # spreadsheets and in Spark frames) and widen the row tuples
        pdf = pdf.iloc[:, : len(self.schema.fields)]
        for row in pdf.astype(object).itertuples(index=False):
            yield tuple(None if is_missing(v) else v for v in row)


def register_xlsx_source(spark) -> None:
    """Idempotent registration of the xlsx format for this session."""
    spark.dataSource.register(XlsxDataSource)
