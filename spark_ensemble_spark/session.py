"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; the same config block is what
we would ship to a 1000-executor cluster — AQE on (runtime re-planning, skew
join splitting, partition coalescing), Arrow for the few pandas-UDF paths,
UTC session timezone for oracle comparability.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "spark-ensemble-spark", cpus: str | int | None = None) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Long-lived sessions (the 198-query bench, any multi-tenant driver)
    # compile thousands of distinct generated classes; the JVM default
    # 240 MB ReservedCodeCacheSize silently FLUSHES hot compiled methods
    # mid-session (r12, measured: CodeHeap usage dropped 83->56 MB across
    # the ML fits while compute-bound rows degraded 1.3-5x — the r11
    # "late-bench contention" cluster, docs_bm25_topk 2.6->9.7s).  512 MB
    # keeps every generated class JIT-resident; the same option belongs in
    # spark.executor.extraJavaOptions on a real cluster (no-op under
    # local[*] where driver and executors share one JVM).
    java_opts = os.environ.get(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS", "-XX:ReservedCodeCacheSize=512m"
    )
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.extraJavaOptions", java_opts)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
