"""Stage-boundary materialization for deep-composed DAGs.

Every multi-pass operator and composed pipeline in this package
materializes its stage boundaries eagerly (the curation-DAG
checkpoint convention): the boundary executes once, and every
downstream reference plans over a table leaf instead of re-walking
(and re-executing) the whole upstream subplan.

The LOCAL default is ``DataFrame.localCheckpoint`` — executor-local
block storage, no reliable filesystem needed, and the right call in
local mode where losing an executor means losing the process anyway.
Its trade-off at cluster scale: a localCheckpoint has NO lineage
fallback, so on a real 100 TB cluster an executor loss kills the
query instead of recomputing the lost partitions.

Production switch: set ``SPARK_GRAFT_CHECKPOINT_DIR`` to a reliable
(HDFS / object-store) path and every stage boundary in the package
becomes a reliable ``DataFrame.checkpoint`` into that directory —
lineage-free AND fault-tolerant, at the cost of one distributed
write + read per boundary.  This is exactly the materialized table a
production pipeline writes between stages; the env knob keeps the
local bench protocol unchanged (unset ⇒ behavior identical to the
pre-r17 seams).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

CHECKPOINT_DIR_ENV = "SPARK_GRAFT_CHECKPOINT_DIR"


def stage_boundary(df: DataFrame) -> DataFrame:
    """Materialize ``df`` eagerly and truncate its lineage (values
    and row order source are untouched).  Local default:
    ``localCheckpoint``; with :data:`CHECKPOINT_DIR_ENV` set, a
    reliable ``checkpoint`` into that directory (see module doc)."""
    ckdir = os.environ.get(CHECKPOINT_DIR_ENV)
    if ckdir:
        sc = df.sparkSession.sparkContext
        current = sc._jsc.sc().getCheckpointDir()
        if not current.isDefined():
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
