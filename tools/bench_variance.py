"""Variance re-measure for BENCH r2's two unexplained regressions
(text_quality +20%, sink_parquet +15%; VERDICT r2 'Next round' #4):
n reps of just those queries, reporting min/median/max so future
rounds know the run-to-run envelope instead of chasing noise.

Usage: python tools/bench_variance.py [n_reps]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuse the exact bench query closures)


def main(reps: int = 7) -> None:
    from parquet_editor_spark.session import get_spark

    spark = get_spark(app_name="bench-var", cpus=bench.CPUS, shuffle_partitions=bench.CPUS)
    tmp = tempfile.mkdtemp(prefix="pes_benchvar_")
    queries = bench.build_queries(spark, tmp)
    out = {}
    for name in ("text_quality", "sink_parquet"):
        fn = queries[name]
        fn()  # warm-up
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            samples.append(round(time.perf_counter() - t0, 4))
        out[name] = {
            "n": reps,
            "min": min(samples),
            "median": round(statistics.median(samples), 4),
            "max": max(samples),
            "stdev": round(statistics.stdev(samples), 4),
            "samples": samples,
        }
        bench.clear_caches(spark)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 7)
