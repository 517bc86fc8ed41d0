"""Profile one registered query with the Spark event log and summarize
where wall-clock goes: per-job duration/description, per-stage task time,
shuffle bytes, and gaps between jobs (driver-side time).

Usage: SPARK_GRAFT_CPUS=32 python scripts/joblog_profile.py SF_DIR name [name...]

Measurement tool only (guide §1/§7) — not part of the driver contract.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    evdir = tempfile.mkdtemp(prefix="ses-evlog-")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("joblog-profile")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{evdir}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spark_ensemble_spark.queries import ALL_SPARK_QUERIES

    warm = os.environ.get("JOBLOG_WARM_SF")
    marks = {}
    for name in names:
        fn = ALL_SPARK_QUERIES[name]
        if warm:
            try:
                fn(spark, warm).count()
            except Exception:
                pass
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"Q:{name}")
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        marks[name] = (t0, time.time())
        spark.sparkContext.setJobDescription(None)
        print(f"[joblog] {name}: {marks[name][1] - t0:.2f}s", file=sys.stderr)

    # force the event log to flush
    app_id = spark.sparkContext.applicationId
    spark.stop()
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        cands = [p for p in os.listdir(evdir) if p.startswith(app_id)]
        path = os.path.join(evdir, cands[0])
    jobs = {}
    stages = {}
    with open(path) as fh:
        for ln in fh:
            ev = json.loads(ln)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"] / 1000.0,
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"] / 1000.0
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                stages[sid] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "dur": (comp - sub) / 1000.0 if sub and comp else None,
                }
    # summarize per query window
    for name, (t0, t1) in marks.items():
        print(f"\n=== {name} ({t1 - t0:.2f}s wall) ===")
        qjobs = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if t0 - 0.5 <= j["start"] <= t1 + 0.5 and "end" in j
        ]
        prev_end = t0
        for jid, j in qjobs:
            gap = j["start"] - prev_end
            dur = j["end"] - j["start"]
            top = sorted(
                (
                    (stages[s]["dur"] or 0, s)
                    for s in j["stages"]
                    if s in stages
                ),
                reverse=True,
            )[:2]
            tops = "; ".join(
                f"s{s}:{d:.2f}s×{stages[s]['tasks']}t {stages[s]['name'][:40]}"
                for d, s in top
            )
            flag = " <GAP" if gap > 0.3 else ""
            print(
                f"  job{jid:5d} +{j['start'] - t0:6.2f}s gap={gap:5.2f}s{flag} "
                f"dur={dur:6.2f}s  {tops}"
            )
            prev_end = j["end"]
        tail = t1 - prev_end
        if tail > 0.3:
            print(f"  tail (driver after last job): {tail:.2f}s")


if __name__ == "__main__":
    main()
