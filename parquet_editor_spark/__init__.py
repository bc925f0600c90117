"""parquet_editor_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of
``sayakpanja15/parquet_editor`` (a single-process pandas/PyQt5 table
editor; see SURVEY.md): multi-format load/save, typed positional cell
and row/column edits, pivot-table aggregation, plot-feeding analytic
reads — plus the LLM-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal columns, streaming) designed for
100 TB scale.

Architecture (SURVEY.md §7): a thin session layer of *named immutable
DataFrames* (rebind-on-mutate gives undo/redo for free) over stock
Spark SQL. No custom Catalyst rules; every operator lowers to built-in
DataFrame operations so predicate pushdown, column pruning, AQE and
whole-stage codegen apply end-to-end.
"""

from parquet_editor_spark.session import EditorSession, SessionSettings, get_spark

__all__ = ["EditorSession", "SessionSettings", "get_spark"]
__version__ = "0.1.0"
