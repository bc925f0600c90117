"""Time the Spark side of every declared entry query.

For each ``queries()`` entry: build the DataFrame and execute it to
the noop sink (guide §1.4 — forces every column, no driver collect),
after one untimed warm-up. Prints a JSON dict name → seconds, sorted
descending, so optimization rounds can rank where entry wall time
actually goes.  Streaming entries execute through their own
micro-batch harness inside fn(); they are timed the same way around
the call.

Usage: python tools/entry_times.py [sf_dir] [out.json] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

# resolve imports relative to THIS file so a copy run from a git
# worktree times the worktree's code, not /root/repo's (the r16
# third pass lost a set of "before" sweeps to a hardcoded path here)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/entry_times.json"
    only = set(sys.argv[3:])

    import __spark_entry__ as entry_mod
    from parquet_editor_spark.session import get_spark

    spark = get_spark(app_name="entry-times")
    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(name)
        try:
            def run():
                df = fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()

            run()  # warm-up: codegen, file-footer caches, sub-writes
            t0 = time.perf_counter()
            run()
            times[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # noqa: BLE001 — record and continue
            errs[name] = f"{type(e).__name__}: {e}"[:200]
        spark.catalog.clearCache()
    ranked = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    payload = {"sf_dir": sf_dir, "times": ranked, "errors": errs,
               "total": round(sum(times.values()), 2)}
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    for n, t in list(ranked.items())[:40]:
        print(f"{t:8.3f}  {n}")
    print("total", payload["total"], "errors", len(errs))
    spark.stop()


if __name__ == "__main__":
    main()
