"""Physical-plan inspection — programmatic access to the properties
that make a plan survive a 100× scale-up (SURVEY.md §4).

These helpers parse ``df.explain()`` output so tests can ASSERT scale
properties instead of hoping for them: filters pushed into the
parquet scan, projections pruned to the read schema, small joins
broadcast, no accidental single-partition exchanges, wide
whole-stage-codegen spans. tests/test_plans.py pins these for every
headline operator.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The final (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') text — scan details incl. PushedFilters."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet scan will evaluate (predicate pushdown).
    Empty list = nothing pushed — a full-scan red flag for selective
    queries."""
    text = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[", text):
        # balanced-bracket scan: In(x, [1,2,3]) nests both ']' and ','
        # inside one filter, so a regex-to-first-']' + flat comma split
        # would garble it
        i, depth, start = m.end(), 1, m.end()
        parts: list[str] = []
        while i < len(text) and depth:
            ch = text[i]
            if ch in "[(":
                depth += 1
            elif ch in "])":
                depth -= 1
                if depth == 0:
                    break
            elif ch == "," and depth == 1:
                parts.append(text[start:i])
                start = i + 1
            i += 1
        parts.append(text[start:i])
        out.extend(p.strip() for p in parts if p.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the parquet scan actually reads (column pruning). A
    2-column projection reading an 11-column schema is wrong."""
    text = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return sorted(set(cols))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def has_single_partition_exchange(df: DataFrame) -> bool:
    """True if the plan funnels ALL rows through one partition — the
    canonical scale killer (global row_number, un-keyed windows)."""
    return "Exchange SinglePartition" in executed_plan(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen regions. More operators fused into
    fewer spans = less virtual-call overhead; a span count of 0 means
    the plan fell out of codegen entirely (e.g. row-at-a-time UDFs).

    NB: under AQE the codegen markers only appear in the FINAL plan —
    run an action on the DataFrame first, or the count reads 0."""
    text = executed_plan(df)
    # executedPlan prints codegen regions as "*(N) Operator"
    spans = set(re.findall(r"\*\((\d+)\)", text))
    spans |= set(re.findall(r"WholeStageCodegen \((\d+)\)", text))
    return len(spans)


def plan_report(df: DataFrame) -> dict:
    """One-call summary used by tests and perf triage."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schema": read_schema_columns(df),
        "broadcast_join": has_broadcast_join(df),
        "single_partition_exchange": has_single_partition_exchange(df),
        "codegen_spans": wholestage_codegen_spans(df),
    }


def partition_histogram(df: DataFrame) -> list[int]:
    """Rows per partition of ``df`` as materialized, EMPTY partitions
    included (they are the skew signal: a hot key leaves its siblings
    at zero) — the direct skew diagnostic.

    ONE job, one execution: a narrow constant projection (preserves
    partitioning) runs through ``mapInArrow``, whose function executes
    once per partition INCLUDING empty ones, emitting
    (TaskContext.partitionId, Σ batch.num_rows).  Rows are counted
    from Arrow batch metadata — no per-row pickling, no ``df.rdd``
    conversion (which would materialize AQE stages in a second,
    possibly differently-planned execution)."""
    from pyspark.sql import functions as F

    def per_partition(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        n = sum(b.num_rows for b in batches)
        yield pa.RecordBatch.from_pydict(
            {"pid": [TaskContext.get().partitionId()], "n": [n]}
        )

    counts = {
        r["pid"]: r["n"]
        for r in df.select(F.lit(True).alias("__x"))
        .mapInArrow(per_partition, "pid long, n long")
        .collect()
    }
    n_parts = max(counts) + 1 if counts else 0
    return [counts.get(pid, 0) for pid in range(n_parts)]


def skew_ratio(df: DataFrame) -> float:
    """max/mean rows-per-partition over ALL partitions — 1.0 is
    perfectly balanced; the threshold AQE's skew-join mitigation keys
    off is ~5.  Use after a repartition/join to verify a salting or
    AQE fix actually took."""
    hist = partition_histogram(df)
    if not hist or not sum(hist):
        return 1.0
    return max(hist) / (sum(hist) / len(hist))
