"""Incremental rollup maintenance invariants.

The contract: merging per-delivery rollups equals the from-scratch rollup
over the union — for ANY delivery split — because count/sum/min/max are
algebraic. Cross-engine value parity is covered by the
``events_rollup_incremental`` oracle at 3 SFs.
"""

from datetime import datetime

from pyspark.sql import functions as F

from spark_ensemble_spark.operators.materialized import (
    build_rollup,
    merge_rollup,
    rollup_report,
)

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2026, 1, 1, h), t, v) for i, (h, t, v) in enumerate(rows)],
        SCHEMA,
    )


def test_merge_equals_full_recompute(spark):
    """Three-way split merge == from-scratch, including a cell that exists
    in only one delivery and a cell spread over all three."""
    rows = [(0, "a", 1.0), (0, "a", 2.0), (0, "a", 4.0), (1, "b", -3.0), (2, "a", 0.5)]
    ev = _ev(spark, rows)
    full = {
        tuple(r)
        for r in rollup_report(build_rollup(ev)).collect()
    }
    merged = None
    for i in range(3):
        agg = build_rollup(ev.filter(F.col("event_id") % 3 == i))
        merged = agg if merged is None else merge_rollup(merged, agg)
    inc = {tuple(r) for r in rollup_report(merged).collect()}
    assert inc == full


def test_merge_empty_delivery_is_identity(spark):
    ev = _ev(spark, [(0, "a", 1.0), (1, "b", 2.0)])
    base = build_rollup(ev)
    merged = merge_rollup(base, build_rollup(ev.filter(F.lit(False))))
    assert sorted(map(tuple, rollup_report(merged).collect())) == sorted(
        map(tuple, rollup_report(base).collect())
    )


def test_merge_cell_level_combine(spark):
    """Overlapping cell: counts add, sums add exactly, min/max take the
    extremes across deliveries; disjoint cells pass through untouched."""
    a = build_rollup(_ev(spark, [(0, "a", 5.0), (0, "a", 1.0)]))
    b = build_rollup(_ev(spark, [(0, "a", -2.0), (3, "c", 9.0)]))
    got = {
        (r.bucket, r.event_type): (r.n, r.sum_value, r.min_value, r.max_value)
        for r in rollup_report(merge_rollup(a, b)).collect()
    }
    assert got[("2026-01-01 00:00:00", "a")] == (3, 4.0, -2.0, 5.0)
    assert got[("2026-01-01 03:00:00", "c")] == (1, 9.0, 9.0, 9.0)
