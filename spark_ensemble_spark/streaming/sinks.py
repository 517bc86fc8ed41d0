"""Exactly-once streaming sinks via idempotent ``foreachBatch`` writers.

Spark's own file sink is exactly-once through its _spark_metadata commit log,
but most real sinks (object stores consumed by other engines, JDBC, vector
stores) have no such log. The production pattern is: checkpointed offsets
give at-least-once BATCH REPLAY, and the writer makes each replay IDEMPOTENT
— here by routing every micro-batch to a ``batch_id=N`` directory written
with overwrite mode. A batch re-run after a crash overwrites its own
directory instead of appending duplicates; readers see each input row exactly
once. The same skeleton carries a MERGE/upsert for keyed sinks
(``sessionized_stream``'s provisional emissions are designed for exactly
that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_stream_exactly_once(
    df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start an append stream whose output directory holds each input row
    exactly once, even across crash/restart replays of a micro-batch.

    Layout: ``out_path/batch_id=N/*.parquet``. Readers load ``out_path`` with
    partition discovery and may drop the ``batch_id`` column. Scale notes: the
    writer performs no shuffle (partition layout = upstream partitioning);
    one directory per micro-batch keeps the listing O(batches), which at high
    trigger rates is compacted downstream (a periodic batch job coalescing
    old ``batch_id`` dirs — the standard small-file compaction pass)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # mode("overwrite") scoped to THIS batch's directory is the whole
        # idempotence story: replays rewrite, never append.
        batch_df.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")

    return (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def compact_batches(
    spark,
    in_path: str,
    out_path: str,
    max_records_per_file: int = 1_000_000,
    target_partitions: int | None = None,
) -> None:
    """Small-file compaction for a ``batch_id=N`` streaming output (or any
    over-fragmented parquet directory): one read, one write, bounded file
    sizes.

    High trigger rates leave thousands of KB-sized files; every downstream
    scan then pays per-file open/footer costs that dwarf the data. Compaction
    rewrites to ``target_partitions`` files capped at ``max_records_per_file``
    rows (maxRecordsPerFile splits oversized partitions WITHOUT a shuffle —
    prefer raising it over repartitioning when row sizes are uniform). The
    ``batch_id`` partition column is dropped: it was idempotence bookkeeping,
    not data. Output goes to a NEW directory — swap-on-success (rename or
    view/manifest flip) keeps readers consistent; an in-place overwrite would
    corrupt concurrent scans."""
    df = spark.read.parquet(in_path)
    if "batch_id" in df.columns:
        df = df.drop("batch_id")
    if target_partitions:
        df = df.coalesce(target_partitions)
    (
        df.write.option("maxRecordsPerFile", max_records_per_file)
        .mode("overwrite")
        .parquet(out_path)
    )
