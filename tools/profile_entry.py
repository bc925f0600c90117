"""Job-level profile of one declared entry: wall, Spark-job busy
union, inter-job driver gaps, and the per-job table — the r16/r17
attribution tool for "where does an entry's wall actually go".

Runs the entry once untimed (warm-up), then once timed with the
event log enabled, and parses SparkListenerJobStart/JobEnd events
for the timed window.

Usage: python tools/profile_entry.py <entry> [sf_dir] [--plan]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    want_plan = "--plan" in sys.argv

    import glob
    import shutil

    evdir = f"/tmp/pes_eventlog_{os.getpid()}"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir)

    import __spark_entry__ as entry_mod
    from parquet_editor_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    fn = entry_mod.queries()[name]

    def run():
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return df

    spark.sparkContext.setJobDescription(f"{name} warmup")
    run()
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(name)
    t0 = time.time()
    df = run()
    wall = time.time() - t0
    if want_plan:
        df.explain("formatted")
    spark.stop()
    time.sleep(1.0)

    jobs: dict[int, dict] = {}
    paths = []
    for p in glob.glob(f"{evdir}/*"):
        # Spark 4 event-log v2 writes a DIRECTORY of event files
        paths.extend(
            glob.glob(f"{p}/events_*") if os.path.isdir(p) else [p]
        )
    for path in paths:
        with open(path, errors="replace") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    if ev.get("Submission Time", 0) / 1000.0 < t0:
                        continue
                    props = ev.get("Properties") or {}
                    jobs[ev["Job ID"]] = {
                        "id": ev["Job ID"],
                        "t0": ev["Submission Time"] / 1000.0,
                        "desc": props.get(
                            "spark.job.description", ""
                        )[:60],
                        "n_stages": len(ev.get("Stage IDs", [])),
                    }
                elif e == "SparkListenerJobEnd":
                    j = jobs.get(ev["Job ID"])
                    if j is not None:
                        j["t1"] = ev["Completion Time"] / 1000.0

    rows = sorted(
        (j for j in jobs.values() if "t1" in j), key=lambda j: j["t0"]
    )
    # busy union of [t0, t1] intervals
    busy, cursor = 0.0, None
    for j in rows:
        s, e = j["t0"], j["t1"]
        if cursor is None or s > cursor:
            busy += e - s
            cursor = e
        elif e > cursor:
            busy += e - cursor
            cursor = e
    print(f"\n== {name}  wall {wall:.2f}s  jobs {len(rows)}  "
          f"busy-union {busy:.2f}s  gaps {wall - busy:.2f}s ==")
    prev_end = t0
    for j in rows:
        gap = j["t0"] - prev_end
        dur = j["t1"] - j["t0"]
        mark = " <GAP" if gap > 0.15 else ""
        print(f"  job {j['id']:>4} +{j['t0']-t0:7.2f}s  dur {dur:6.2f}s  "
              f"gap {gap:6.2f}s{mark}  stages={j['n_stages']}  {j['desc']}")
        prev_end = max(prev_end, j["t1"])
    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main()
