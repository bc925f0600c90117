"""r17: the stage-boundary production switch
(``parquet_editor_spark.boundary``) — local default is an
executor-local checkpoint, SPARK_GRAFT_CHECKPOINT_DIR upgrades every
seam to a reliable ``DataFrame.checkpoint`` into that directory."""

import os

from pyspark.sql import functions as F

from parquet_editor_spark.boundary import (
    CHECKPOINT_DIR_ENV,
    stage_boundary,
)


def test_stage_boundary_local_default(spark, monkeypatch):
    monkeypatch.delenv(CHECKPOINT_DIR_ENV, raising=False)
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("y"))
    out = stage_boundary(df)
    # lineage truncated: the plan roots at a materialized RDD leaf
    from parquet_editor_spark.plans.explain import formatted_plan

    assert "Scan ExistingRDD" in formatted_plan(out)
    assert sorted(r["y"] for r in out.collect()) == [
        i * 2 for i in range(10)
    ]


def test_stage_boundary_reliable_checkpoint(spark, monkeypatch, tmp_path):
    ckdir = str(tmp_path / "ck")
    monkeypatch.setenv(CHECKPOINT_DIR_ENV, ckdir)
    df = spark.range(10).select(F.col("id"), (F.col("id") * 3).alias("y"))
    out = stage_boundary(df)
    # the reliable checkpoint actually landed in the requested dir
    found = [
        os.path.join(root, f)
        for root, _dirs, files in os.walk(ckdir)
        for f in files
    ]
    assert found, f"no checkpoint files under {ckdir}"
    assert sorted(r["y"] for r in out.collect()) == [
        i * 3 for i in range(10)
    ]
