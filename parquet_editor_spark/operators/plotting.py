"""Plot-feeding computations (SURVEY.md §2.5) — the reference draws
line/scatter/histogram straight from the full DataFrame in RAM
(PlotWindow, main.pyc:362-383). At scale the ENGINE reduces data to a
plot-sized payload server-side; only the reduced frame crosses to the
client. Rendering itself is presentation: it takes the reduced pandas
frame and needs matplotlib (in the reference's requirements.txt:3 but
not in this container — gated behind an import-try, with the data
path fully real and tested).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parquet_editor_spark.operators import query as q
from parquet_editor_spark.operators.edit import RID, with_rid


def line_series(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    max_points: int = 1000,
    order: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Line-plot series (main.pyc:371-374: index vs numeric columns),
    stride-downsampled so at most ~max_points rows reach the client
    regardless of table size. x = the row ordinal (the reference plots
    against the pandas index)."""
    cols = list(cols or q.numeric_columns(df))
    if not cols:
        raise ValueError("no numeric columns to plot")  # main.pyc:405-416
    d = with_rid(df.select(*cols), order) if order is None else with_rid(df, list(order)).select(RID, *cols)
    n = d.count()
    stride = max(1, math.ceil(n / max_points))
    return (
        d.filter(F.col(RID) % stride == 0)
        .select(F.col(RID).alias("x"), *cols)
    )


def scatter_sample(
    df: DataFrame, x: str, y: str, fraction: float = 0.01, seed: int = 42
) -> DataFrame:
    """Scatter at scale, option 1: Bernoulli sample (seeded). For
    density-faithful plots at extreme scale prefer ``query.bin2d``."""
    return df.select(x, y).sample(fraction=fraction, seed=seed)


def histogram_data(df: DataFrame, column: str, bins: int = 20) -> DataFrame:
    """Histogram (main.pyc:381) with an auto-computed bin width from
    one min/max pass — the two aggregates + binning both run
    server-side; #bins rows cross to the client."""
    lo, hi = df.agg(F.min(column), F.max(column)).first()
    if lo is None or hi == lo:
        width = 1.0
    else:
        width = (hi - lo) / bins
    return q.histogram(df, column, width)


def render_line(pdf, x: str = "x"):  # pragma: no cover - needs matplotlib
    """Presentation step: reduced pandas frame → matplotlib figure.
    Gated: matplotlib is in the reference's requirements but not this
    container."""
    try:
        import matplotlib.pyplot as plt
    except ImportError as e:
        raise NotImplementedError(
            "rendering needs matplotlib; not available in this environment — "
            "use the reduced DataFrame from line_series/histogram_data directly"
        ) from e
    fig, ax = plt.subplots()
    for c in pdf.columns:
        if c != x:
            ax.plot(pdf[x], pdf[c], label=c)
    ax.legend()
    return fig
