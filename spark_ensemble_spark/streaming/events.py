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
    # exact microsecond gaps: casting to long truncates to seconds and
    # disagrees with fractional-second oracles at the gap boundary
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    with_break = df.withColumn(
        "__new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
    )
    with_id = with_break.withColumn(
        "session_seq",
        F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return with_id.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        # round() then fixed-format: the string is identical across engines
        # even when the rounded doubles differ in the last ulp (Spark rounds
        # through BigDecimal, DuckDB through double arithmetic).
        F.format_string("%.4f", F.round(F.sum("value"), 4)).alias("session_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_seq long, n_events long, "
    "session_value double, session_start string"
)
# last_ts in MICROSECONDS (exact; second-truncation would disagree with the
# SQL oracle on sub-second gap boundaries) + the open session's accumulators
# so a session spanning micro-batches resumes instead of crashing.
SESSION_STATE_SCHEMA = (
    "last_ts long, session_seq long, n_events long, "
    "session_value double, session_start string"
)


def streaming_sessionize(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Custom stateful streaming sessionization via ``applyInPandasWithState``.

    Per-user state carries (last event time, session counter) across
    micro-batches; a gap > ``gap_minutes`` closes the previous session.
    Sessions fully contained in the processed backlog are emitted, so a
    single-batch file replay (processAllAvailable) produces exactly the batch
    sessionization — which is how it is verified. In production the same plan
    runs on Kafka with event-time timeouts closing idle sessions.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )

    gap_us = gap_minutes * 60 * 1_000_000

    def sessionize(key, pdfs, state):
        import pandas as pd

        rows = pd.concat(list(pdfs)).sort_values("ts")
        if state.exists:
            last_ts, seq, n_events, session_value, session_start = state.get
            cur = (
                {
                    "user_id": key[0],
                    "session_seq": seq,
                    "n_events": n_events,
                    "session_value": session_value,
                    "session_start": session_start,
                }
                if n_events
                else None
            )
        else:
            last_ts, seq, cur = None, 0, None
        out = []
        for ts, value in zip(rows["ts"], rows["value"]):
            epoch_us = ts.value // 1000  # pandas ns → µs, exact
            if last_ts is None or epoch_us - last_ts > gap_us:
                if cur is not None:
                    out.append(cur)
                seq += 1
                cur = {
                    "user_id": key[0],
                    "session_seq": seq,
                    "n_events": 0,
                    "session_value": 0.0,
                    "session_start": ts.strftime("%Y-%m-%d %H:%M:%S"),
                }
            cur["n_events"] += 1
            cur["session_value"] = round(cur["session_value"] + value, 10)
            last_ts = epoch_us
        if cur is not None:
            # Emit the still-open session each batch; a later batch extending
            # it re-emits the superseding row with the same (user, seq) key.
            out.append(cur)
        state.update(
            (
                last_ts,
                seq,
                cur["n_events"] if cur else 0,
                cur["session_value"] if cur else 0.0,
                cur["session_start"] if cur else "",
            )
        )
        if out:
            yield pd.DataFrame(out)

    sessions = (
        events.groupBy("user_id")
        .applyInPandasWithState(
            sessionize,
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
        .withColumn("session_value", F.format_string("%.4f", F.round("session_value", 4)))
    )
    _QUERY_SEQ[0] += 1
    name = f"stream_sessions_{_QUERY_SEQ[0]}"
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ses-state-"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
