"""Structured Streaming operators over the events table.

The reference is batch-only (SURVEY.md §1.4); these operators extend the
engine to streams the idiomatic way: ``readStream`` → watermark → windowed
aggregation → sink. For local verification the parquet directory is replayed
through a memory sink synchronously (``processAllAvailable``), which makes the
result comparable to a batch oracle; in production the same plan runs against
Kafka with checkpointed exactly-once ``foreachBatch`` sinks.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos (read with nanosAsLong)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_QUERY_SEQ = [0]


def streaming_windowed_counts(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts per event_type computed by a real streaming
    query (file source → watermark → window agg → memory sink), returned as a
    batch DataFrame once the backlog is fully processed."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The file stream source wants a directory/glob, not a single file path.
    events = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "event_type",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "n",
            "total_value",
        )
    )
    _QUERY_SEQ[0] += 1
    name = f"stream_counts_{_QUERY_SEQ[0]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ses-stream-"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def sessionize_batch(
    df: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Sessionization as a batch window program: a session starts when the gap
    to the previous event of the same user exceeds ``gap_minutes``. Per-user
    ordering shuffles once on user_id."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    with_break = df.withColumn(
        "__new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    with_id = with_break.withColumn(
        "session_seq",
        F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return with_id.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )
