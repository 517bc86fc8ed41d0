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


def test_persisted_partials_merge_on_read(spark, tmp_path):
    """LSM-shaped store: per-delivery partials written as scoped partitions,
    read_rollup's merge-on-read equals the from-scratch rollup; replaying a
    delivery (rewriting its own batch_id partition) changes nothing —
    exactly-once by idempotent overwrite."""
    from spark_ensemble_spark.operators.materialized import (
        read_rollup,
        write_rollup_delivery,
    )

    rows = [(0, "a", 1.5), (0, "b", 2.0), (1, "a", -1.0), (0, "a", 3.5)]
    ev = _ev(spark, rows)
    path = str(tmp_path / "rollup")
    for i in range(2):
        write_rollup_delivery(
            build_rollup(ev.filter(F.col("event_id") % 2 == i)), path, i
        )
    served = sorted(map(tuple, rollup_report(read_rollup(spark, path)).collect()))
    full = sorted(map(tuple, rollup_report(build_rollup(ev)).collect()))
    assert served == full
    # crash-replay of delivery 1: same content rewrites its own partition
    write_rollup_delivery(
        build_rollup(ev.filter(F.col("event_id") % 2 == 1)), path, 1
    )
    assert sorted(map(tuple, rollup_report(read_rollup(spark, path)).collect())) == full


def test_compact_rollup_preserves_view(spark, tmp_path):
    from spark_ensemble_spark.operators.materialized import (
        compact_rollup,
        read_rollup,
        write_rollup_delivery,
    )

    ev = _ev(spark, [(0, "a", 1.0), (2, "b", 4.0), (0, "a", 2.0)])
    path, cpath = str(tmp_path / "r"), str(tmp_path / "r_compact")
    for i in range(3):
        write_rollup_delivery(
            build_rollup(ev.filter(F.col("event_id") % 3 == i)), path, i
        )
    before = sorted(map(tuple, rollup_report(read_rollup(spark, path)).collect()))
    compact_rollup(spark, path, cpath)
    after = sorted(map(tuple, rollup_report(read_rollup(spark, cpath)).collect()))
    assert after == before


def test_rollup_stream_no_state_store(spark, tmp_path):
    """Streaming continuous aggregate: micro-batches land as immutable
    partials (no watermark, no state store) and the served view equals the
    batch rollup over everything delivered."""
    from spark_ensemble_spark.operators.materialized import read_rollup, rollup_stream

    src = tmp_path / "ev_src"
    src.mkdir()

    def deliver(name, rows):
        _ev(spark, rows).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    deliver("d1", [(0, "a", 1.0), (1, "b", 2.0)])
    stream = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
    q = rollup_stream(
        stream, str(tmp_path / "rollup"), str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        deliver("d2", [(0, "a", 5.0), (3, "c", -1.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    served = sorted(
        map(tuple, rollup_report(read_rollup(spark, str(tmp_path / "rollup"))).collect())
    )
    all_rows = [(0, "a", 1.0), (1, "b", 2.0), (0, "a", 5.0), (3, "c", -1.0)]
    # rebuild with distinct event ids per row (ids never enter the rollup)
    full = sorted(map(tuple, rollup_report(build_rollup(_ev(spark, all_rows))).collect()))
    assert served == full


def test_hll_merge_equals_single_pass(spark):
    """The sketch property: register-wise max over per-delivery partials ==
    the partial over the union, hence identical estimates."""
    from spark_ensemble_spark.operators.materialized import (
        hll_estimate,
        hll_merge,
        hll_partial,
    )

    ev = spark.range(5000).select(
        F.col("id").alias("event_id"),
        F.lit(datetime(2026, 1, 1, 0)).alias("ts"),
        F.lit("a").alias("event_type"),
        (F.col("id") % 700).alias("user_id"),
    )
    single = hll_estimate(hll_partial(ev)).collect()[0].approx_distinct
    parts = None
    for i in range(3):
        p = hll_partial(ev.filter(F.col("event_id") % 3 == i))
        parts = p if parts is None else parts.unionByName(p)
    merged = hll_estimate(hll_merge(parts)).collect()[0].approx_distinct
    assert merged == single


def test_hll_accuracy_both_branches(spark):
    """Estimates land within ~3 standard errors (m=256 → ~6.5%): the
    linear-counting branch on a small cell and the raw harmonic branch on
    a 20k-distinct cell."""
    from spark_ensemble_spark.operators.materialized import hll_estimate, hll_partial

    def est(n_distinct):
        ev = spark.range(n_distinct).select(
            F.col("id").alias("event_id"),
            F.lit(datetime(2026, 1, 1, 0)).alias("ts"),
            F.lit("a").alias("event_type"),
            F.col("id").alias("user_id"),
        )
        return hll_estimate(hll_partial(ev)).collect()[0].approx_distinct

    small, big = est(40), est(20000)
    assert abs(small - 40) <= 12      # linear counting: tight at tiny V/m
    assert abs(big - 20000) <= 0.2 * 20000


def test_hist_merge_equals_single_pass_and_quantiles_by_hand(spark):
    """Histogram partials over any delivery split merge (exact addition) to
    the single-pass histogram, and the quantile pick matches a hand
    computation: 10 values in one cell, bounds (1,2,5,10,20,50,100,200,500)
    — p50 rank ceil(0.5*10)=5 lands in the bin bounded above by 5.0; an
    overflow value (>500) reports NULL at p99 when the rank reaches it."""
    from spark_ensemble_spark.operators.materialized import (
        hist_merge,
        hist_partial,
        hist_quantiles,
    )

    vals = [0.5, 1.5, 2.5, 3.0, 4.9, 7.0, 15.0, 60.0, 150.0, 700.0]
    ev = _ev(spark, [(0, "a", v) for v in vals])
    single = hist_partial(ev)
    merged = None
    for i in range(3):
        p = hist_partial(ev.filter(F.col("event_id") % 3 == i))
        merged = p if merged is None else merged.unionByName(p)
    merged = hist_merge(merged)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, single.collect())
    )
    q = hist_quantiles(merged, qs=(0.5, 0.99)).collect()[0]
    assert q.n == 10
    # rank 5 of sorted vals = 4.9 -> bin 3 (bounds <= 4.9: 1,2) wait: bins
    # count boundaries <= value: 4.9 -> bin 2; cumulative through bin 2
    # (values < 5.0) = {0.5,1.5,2.5,3.0,4.9} = 5 >= 5 -> upper bound 5.0
    assert q.p50 == 5.0
    # rank ceil(0.99*10)=10 -> the overflow value 700 (bin 9) -> NULL
    assert q.p99 is None


def test_hist_null_values_dropped(spark):
    from spark_ensemble_spark.operators.materialized import (
        hist_partial,
        hist_quantiles,
    )

    ev = spark.createDataFrame(
        [(0, datetime(2026, 1, 1, 0), "a", 3.0), (1, datetime(2026, 1, 1, 0), "a", None)],
        SCHEMA,
    )
    q = hist_quantiles(hist_partial(ev), qs=(0.5,)).collect()[0]
    assert q.n == 1 and q.p50 == 5.0


def test_hist_rollup_stream_served_equals_batch(spark, tmp_path):
    """The generalized streaming continuous aggregate: micro-batches land
    HISTOGRAM partials (build_fn=hist_partial), and the served
    hist_merge -> hist_quantiles view equals the batch computation over
    everything delivered — maintained percentiles with no state store."""
    from spark_ensemble_spark.operators.materialized import (
        hist_merge,
        hist_partial,
        hist_quantiles,
        rollup_stream,
    )

    src = tmp_path / "ev_src_h"
    src.mkdir()

    def deliver(name, rows):
        _ev(spark, rows).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    deliver("d1", [(0, "a", 1.5), (0, "a", 30.0), (1, "b", 0.2)])
    stream = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
    q = rollup_stream(
        stream,
        str(tmp_path / "hist"),
        str(tmp_path / "hckpt"),
        build_fn=hist_partial,
    )
    try:
        q.processAllAvailable()
        deliver("d2", [(0, "a", 7.0), (0, "a", 600.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    served = hist_quantiles(
        hist_merge(spark.read.parquet(str(tmp_path / "hist")))
    )
    all_rows = [(0, "a", 1.5), (0, "a", 30.0), (1, "b", 0.2), (0, "a", 7.0), (0, "a", 600.0)]
    batch = hist_quantiles(hist_merge(hist_partial(_ev(spark, all_rows))))
    key = lambda r: tuple(str(v) for v in r)
    assert sorted(map(key, served.collect())) == sorted(map(key, batch.collect()))


def test_hist_auto_bounds_train_export_serve(spark):
    """Trained equal-mass bounds feed the same literal-compare path: bins
    are roughly balanced on the training data (no bin holds more than ~3x
    its fair share), and the merged-partials invariant holds under the
    trained bounds exactly as under the fixed grid."""
    import random

    from spark_ensemble_spark.operators.materialized import (
        hist_auto_bounds,
        hist_merge,
        hist_partial,
        hist_quantiles,
    )

    rng = random.Random(3)
    rows = [(i % 24, "a", rng.lognormvariate(0, 2)) for i in range(2000)]
    ev = _ev(spark, [(0, t, v) for _, t, v in rows])
    bounds = hist_auto_bounds(ev, "value", n_bins=8, tol=0.0)
    assert 3 <= len(bounds) <= 7 and bounds == sorted(bounds)
    single = hist_partial(ev, bounds=bounds)
    counts = [r.cnt for r in single.collect()]
    assert max(counts) <= 3 * (2000 / 8)
    merged = None
    for i in range(4):
        p = hist_partial(ev.filter(F.col("event_id") % 4 == i), bounds=bounds)
        merged = p if merged is None else merged.unionByName(p)
    merged = hist_merge(merged)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, single.collect())
    )
    q = hist_quantiles(merged, qs=(0.5,), bounds=bounds).collect()[0]
    assert q.n == 2000 and (q.p50 is None or q.p50 in bounds)


def test_cms_merge_equals_single_pass_and_never_undercounts(spark):
    """CMS invariants: the 3-way delivery merge equals the single-pass
    sketch (exact counter addition); probe estimates are >= exact counts
    for every probed key (never undercount), and == exact when the cell's
    key domain is small enough that collisions can't land in all 4 rows."""
    from spark_ensemble_spark.operators.materialized import (
        cms_estimate,
        cms_merge,
        cms_partial,
    )

    # events with controlled user ids: user u appears u+1 times
    data = []
    eid = 0
    for u in range(6):
        for _ in range(u + 1):
            data.append((eid, datetime(2026, 1, 1, 0), "a", float(u), u))
            eid += 1
    ev = spark.createDataFrame(
        data, "event_id long, ts timestamp, event_type string, value double, user_id long"
    )
    single = cms_partial(ev)
    merged = None
    for i in range(3):
        p = cms_partial(ev.filter(F.col("event_id") % 3 == i))
        merged = p if merged is None else merged.unionByName(p)
    merged = cms_merge(merged)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, single.collect())
    )
    probes = [str(u) for u in range(6)] + ["999"]
    est = {
        r.probe: r.approx_count
        for r in cms_estimate(merged, probes).collect()
    }
    for u in range(6):
        assert est[str(u)] >= u + 1  # never undercounts
    # 6 keys into 256 slots x 4 independent rows: a same-slot collision in
    # EVERY row is (6/256)^4-unlikely; exactness expected here
    assert all(est[str(u)] == u + 1 for u in range(6))
    assert est["999"] == 0
