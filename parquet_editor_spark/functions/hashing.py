"""The repo's ONE portable id-hash, shared by every sampling/split/
shard operator and mirrored digit-for-digit in their SQL oracles:

    ((id % 1_000_003) * 2654435761 + seed) % 4294967296  [% mod]

The inner ``% 1_000_003`` keeps the multiply inside int64 under ANSI
overflow checking; 2654435761 is the Knuth multiplicative constant.
A pure function of (id, seed): assignments survive reprocessing,
joins across pipeline runs, and are differential-checkable
value-for-value in any engine with 64-bit integer ops.

Centralized because the expression MUST stay bit-identical to its
DuckDB oracle mirrors — a one-character drift in any hand-copied
instance silently breaks cross-engine determinism (this module
replaced seven inline copies).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_bucket(
    col: str | Column, seed: int = 40503, mod: int | None = None
) -> Column:
    """The canonical portable hash of an integer id column; pass
    ``mod`` for a bucket in ``[0, mod)``, else the raw 32-bit value.

    CONTRACT: ids are non-negative.  On that domain Spark's pmod here
    and the oracles' plain ``%`` agree digit-for-digit; for a negative
    id they would not (pmod wraps positive, ``%`` keeps the sign), so
    feeding negative ids breaks cross-engine hash identity — guard
    upstream if your id space can go negative."""
    c = F.col(col) if isinstance(col, str) else col
    h = (
        F.pmod(c.cast("long"), F.lit(1_000_003)) * F.lit(2654435761)
        + F.lit(seed)
    ) % F.lit(4294967296)
    return h % F.lit(mod) if mod is not None else h
