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


def shuffle_hash(col: str | Column, seed: int) -> Column:
    """Seeded PERMUTATION hash for :func:`...textprep.shuffle_blocks`:
    ``(((id + seed) % 1_000_003) * 2654435761) % 4294967296``.

    NOT :func:`portable_bucket` — there the seed ADDS after the
    multiply, which only ROTATES the induced order (h(id, s) =
    base(id) + s mod 2^32, so every seed yields a cyclic shift of one
    permutation and adjacent seeds are near-identical — fine for
    bucketing, useless for a shuffle).  Folding the seed into the id
    BEFORE the Knuth multiply makes distinct seeds genuinely
    independent orders.  Same portability contract: non-negative
    ids, all-int64 arithmetic, digit-for-digit SQL mirror
    (:func:`shuffle_hash_sql` in textprep)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.pmod(c.cast("long") + F.lit(seed), F.lit(1_000_003))
        * F.lit(2654435761)
    ) % F.lit(4294967296)


# Polynomial string hash shared by winnowing and the hashed-feature
# scorer: Horner over character codes mod a prime just under 2^55 —
# every step (h*131 + codepoint) stays inside int64 in BOTH engines
# (2^55·131 + 2^21 < 2^63; a 2^61-1 modulus would need the 128-bit
# mulmod Catalyst int64 arithmetic can't express).
POLY_MOD = 36028797018963913  # 2^55 − 55, prime
POLY_BASE = 131


def poly_string_hash(col: str | Column) -> Column:
    """Portable polynomial hash of a STRING column (variable length —
    the fold runs over the split characters, unlike the winnowing
    gram hash which unrolls a fixed k).  Pure codegen: split +
    aggregate, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda h, ch: (h * POLY_BASE + F.ascii(ch)) % POLY_MOD,
    )


def poly_string_hash_sql(expr: str) -> str:
    """DuckDB mirror of :func:`poly_string_hash` — same fold, same
    constants (list_reduce has no init, so 0 is prepended)."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({expr}, ''), "
        f"ch -> ascii(ch)::BIGINT)), "
        f"(h, c) -> (h * {POLY_BASE} + c) % {POLY_MOD})"
    )
