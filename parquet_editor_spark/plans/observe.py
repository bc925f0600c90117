"""Pipeline observability via ``DataFrame.observe``: accumulator-style
metrics collected DURING a pass, with zero extra jobs — the way a
100 TB pipeline accounts rows/nulls/filters without re-scanning. The
reference's only feedback is the Qt status bar (selection summary,
main.py:107-123); this is that capability made production-shaped.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_metrics(
    df: DataFrame, *exprs: Column, name: str | None = None
) -> tuple[DataFrame, Observation]:
    """Attach aggregate metric expressions to the frame; they are
    computed alongside whatever action later consumes it (no second
    scan). Read ``observation.get`` AFTER the action completes."""
    obs = Observation(name) if name else Observation()
    return df.observe(obs, *exprs), obs


def with_row_accounting(
    df: DataFrame, cols: Sequence[str] | None = None
) -> tuple[DataFrame, Observation]:
    """Standard accounting block: total rows plus per-column null
    counts for ``cols`` (default: all top-level columns) — the numbers
    every ingestion stage should export."""
    cols = list(cols) if cols else df.columns
    exprs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}") for c in cols
    ]
    return with_metrics(df, *exprs)
