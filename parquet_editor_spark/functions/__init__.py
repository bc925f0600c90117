"""Scalar/array function surface (text analysis, vector math).

All hot-path functions are built-in ``pyspark.sql.functions``
compositions — JVM-side, whole-stage-codegen'd, no Python in the data
path (SURVEY.md §2.8: keep the core engine UDF-free so Catalyst sees
through everything).
"""
