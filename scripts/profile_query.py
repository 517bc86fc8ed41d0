"""Profile one or more registered queries in a fresh process.

Usage: python scripts/profile_query.py SF_DIR name [name ...]

For each name: builds the query, times the noop-sink action (guide §1.4)
RUN_N times, and prints per-run wall seconds plus the Spark job timeline
(job id, description, duration) for the LAST run so per-job cost inside an
iterative operator is visible. Plans can be dumped with --plan.

Not part of the driver contract — a measurement tool (guide §1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN_N = int(os.environ.get("PROFILE_RUNS", "2"))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dump_plan = "--plan" in sys.argv
    sf_dir, names = args[0], args[1:]
    from spark_ensemble_spark.session import get_spark
    from spark_ensemble_spark.queries import ALL_SPARK_QUERIES

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    sc = spark.sparkContext
    for name in names:
        fn = ALL_SPARK_QUERIES[name]
        for i in range(RUN_N):
            t0 = time.time()
            jobs_before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"profile:{name}:run{i}")
            df = fn(spark, sf_dir)
            t_build = time.time() - t0
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.time() - t1
            print(
                f"[profile] {name} run{i}: build={t_build:.2f}s exec={t_exec:.2f}s "
                f"total={t_build + t_exec:.2f}s",
                flush=True,
            )
        if dump_plan:
            df.explain(mode="formatted")
        sc.setJobDescription(None)


if __name__ == "__main__":
    main()
