"""Incremental rollup maintenance: merge deliveries into a materialized
aggregate without re-reading history.

The production pattern for 100 TB rollups (continuous aggregates /
incremental materialized-view refresh): a persisted aggregate at some grain
is kept current by aggregating ONLY each new delivery to the same grain and
merging — a grain-sized outer join — instead of recomputing over the
ever-growing fact history. Correct for exactly the ALGEBRAIC aggregates
(count/sum/min/max, and anything derivable from them like avg), whose
partial states merge associatively; the same property Spark itself exploits
for map-side partial aggregation, applied across TIME instead of across
partitions.

The invariant the tests and the ``events_rollup_incremental`` oracle pin:
``merge_rollup(build_rollup(A), build_rollup(B)) == build_rollup(A ∪ B)``
for disjoint deliveries — bit-for-bit, because counts/sums of the fixture's
exact-decimal values are order-insensitive and min/max are idempotent.

Companion to ``streaming/corpus.incremental_dedup_stream`` (the persisted
signature index) and ``operators/retrieval.merge_bm25_index`` (append-only
posting maintenance): the third leg of never-re-read-the-corpus
maintenance, for metric rollups.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLLUP_STATS = ("n", "sum_value", "min_value", "max_value")


def build_rollup(
    events: DataFrame,
    keys: Sequence[str] = ("bucket", "event_type"),
    ts_col: str = "ts",
    value_col: str = "value",
    grain: str = "hour",
) -> DataFrame:
    """Aggregate a delivery (or the full history) to the rollup grain:
    ``keys + (n, sum_value, min_value, max_value)`` with ``bucket =
    date_trunc(grain, ts)``. One shuffle on the grain keys, map-side
    partials first. ``sum_value`` accumulates as DECIMAL(38,6) so merge
    order can never move the total (the repo-wide exact-sum idiom)."""
    df = events.withColumn("bucket", F.date_trunc(grain, F.col(ts_col)))
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(38,6)")).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def merge_rollup(existing: DataFrame, delivery_rollup: DataFrame) -> DataFrame:
    """Merge a delivery's rollup into the existing one: full outer join on
    the grain keys, algebraic-state combine per cell. Cost is proportional
    to the ROLLUP sizes (grain cardinality), not the fact history — the
    whole point of incremental maintenance. New grain cells appear, old
    untouched cells pass through, overlapping cells combine exactly."""
    keys = [c for c in existing.columns if c not in ROLLUP_STATS]
    a = existing.select(
        *keys, *[F.col(c).alias(f"__a_{c}") for c in ROLLUP_STATS]
    )
    b = delivery_rollup.select(
        *keys, *[F.col(c).alias(f"__b_{c}") for c in ROLLUP_STATS]
    )
    j = a.join(b, keys, "full_outer")
    zero = F.lit(0).cast("long")
    return j.select(
        *keys,
        (F.coalesce("__a_n", zero) + F.coalesce("__b_n", zero)).alias("n"),
        (
            F.coalesce(F.col("__a_sum_value"), F.lit(0).cast("decimal(38,6)"))
            + F.coalesce(F.col("__b_sum_value"), F.lit(0).cast("decimal(38,6)"))
        ).alias("sum_value"),
        F.least(
            F.coalesce("__a_min_value", F.col("__b_min_value")),
            F.coalesce("__b_min_value", F.col("__a_min_value")),
        ).alias("min_value"),
        F.greatest(
            F.coalesce("__a_max_value", F.col("__b_max_value")),
            F.coalesce("__b_max_value", F.col("__a_max_value")),
        ).alias("max_value"),
    )


def rollup_report(rollup: DataFrame, round_to: int = 6) -> DataFrame:
    """Presentation projection over a maintained rollup: derived avg (one
    double division of the exact DECIMAL sum), stats cast for stable
    cross-engine comparison, buckets formatted as strings (the no-raw-
    timestamps oracle convention)."""
    keys = [c for c in rollup.columns if c not in ROLLUP_STATS]
    cols = [
        F.date_format(F.col(c), "yyyy-MM-dd HH:mm:ss").alias(c) if c == "bucket" else F.col(c)
        for c in keys
    ]
    return rollup.select(
        *cols,
        F.col("n").cast("long").alias("n"),
        F.round(F.col("sum_value"), round_to).cast("double").alias("sum_value"),
        F.round(F.col("min_value"), round_to).alias("min_value"),
        F.round(F.col("max_value"), round_to).alias("max_value"),
        F.round(
            F.col("sum_value").cast("double") / F.col("n"), round_to
        ).alias("avg_value"),
    )


def combine_partials(partials: DataFrame) -> DataFrame:
    """Merge-on-read over any number of per-delivery partial rollups: one
    grain-keyed groupBy re-combining the algebraic states. Equivalent to
    folding :func:`merge_rollup` over the deliveries, but as a single
    shuffle over (deliveries × live cells) rows."""
    keys = [
        c for c in partials.columns if c not in ROLLUP_STATS and c != "batch_id"
    ]
    return partials.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_value").cast("decimal(38,6)").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def write_rollup_delivery(delivery_rollup: DataFrame, path: str, batch_id: int) -> None:
    """Persist one delivery's partial rollup as ``path/batch_id=N`` — an
    idempotent scoped overwrite (the exactly-once sink convention: a
    crash-replayed delivery rewrites its own partition instead of
    double-counting). The store is LSM-shaped: immutable per-delivery
    partials, combined at read time."""
    delivery_rollup.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")


def read_rollup(spark, path: str) -> DataFrame:
    """Serve the maintained rollup: partition-discover every delivery
    partial and :func:`combine_partials`. Read cost is (deliveries × live
    cells), independent of fact history; when that grows, compact."""
    return combine_partials(spark.read.parquet(path))


def compact_rollup(spark, path: str, compact_path: str) -> DataFrame:
    """Rewrite all accumulated partials as ONE combined partial at
    ``compact_path`` (a fresh directory — swap or retire the old one after
    the write commits; in-place overwrite of a directory being read is not
    atomic on object stores). Returns the combined frame."""
    combined = read_rollup(spark, path)
    combined.write.mode("overwrite").parquet(f"{compact_path}/batch_id=0")
    return combined


def rollup_stream(
    events_stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    keys=("bucket", "event_type"),
    ts_col: str = "ts",
    value_col: str = "value",
    grain: str = "hour",
):
    """Streaming continuous aggregate with NO state store: each micro-batch
    aggregates alone and lands as an immutable partial partition
    (exactly-once scoped overwrite); :func:`read_rollup` serves the
    combined view. Unlike a watermarked streaming aggregation, there is no
    state to size or time out and late data simply lands in a later
    partial — the trade is merge-on-read, bounded by compaction."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_rollup_delivery(
            build_rollup(batch_df, keys, ts_col, value_col, grain), path, batch_id
        )

    return (
        events_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
