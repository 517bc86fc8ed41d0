"""Online inference: fitted ensemble models applied to structured streams.

Every ensemble model in this package transforms via pure column expressions
over its base models' transforms (``core/base.py`` — no collect, no state),
so a fitted model composes with ``readStream`` as a STATELESS append-mode
projection: the classic online-scoring deployment where the model is
broadcast-resident and each micro-batch scores independently. No watermark,
no state store — the streaming cost is exactly the batch transform's cost
per micro-batch.

The reference is batch-only (SURVEY.md §1.4); this extends its estimator
surface to the stream side the same way ``streaming/events.py`` extends the
relational surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ensemble_spark.functions.rounding import floor_round as _floor_round

from .events import read_events_stream
from .runner import replay_session, run_to_memory


def score_stream(model, stream: DataFrame) -> DataFrame:
    """Apply a fitted model (any Transformer whose transform is expression-
    only — every ensemble model here qualifies) to a streaming DataFrame.
    Returns the scored stream; start it with any append-mode sink. Exists as
    a named seam so pipelines read ``score_stream(model, stream)`` rather
    than relying implicitly on transform/stream composability."""
    return model.transform(stream)


def _event_features(df: DataFrame) -> DataFrame:
    """Shared batch/stream feature projection for the scoring harness: a
    1-dim constant feature vector (the Dummy base ignores features; the
    point is exercising the full transform chain) + the value label."""
    from pyspark.ml.functions import array_to_vector

    return df.select(
        "event_id",
        array_to_vector(F.array(F.lit(1.0))).alias("features"),
        F.col("value").alias("label"),
    )


def streaming_scored_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-replay harness for :func:`score_stream`: fit a deterministic
    bagged ensemble (3 × Dummy(mean) — the bagged mean of identical means is
    avg(label), SQL-oracle-checkable) on the BATCH events table, then score
    the replayed event stream with it. Output: one scored row per event —
    the oracle checks the row count and the constant prediction, i.e. that
    the whole fit→broadcast→stream-transform chain ran."""
    from spark_ensemble_spark import DummyRegressor
    from spark_ensemble_spark.regression.bagging import BaggingRegressor
    from spark_ensemble_spark.sources.datasets import load_events

    spark = replay_session(spark)
    batch = _event_features(load_events(spark, sf_dir))
    model = BaggingRegressor(
        baseLearner=DummyRegressor(strategy="mean"),
        numBaseLearners=3,
        replacement=False,
        subsampleRatio=1.0,
        subspaceRatio=1.0,
    ).fit(batch)
    stream = _event_features(read_events_stream(spark, sf_dir))
    scored = score_stream(model, stream).select(
        "event_id", _floor_round(F.col("prediction"), 6).alias("prediction")
    )
    return run_to_memory(scored, "append", "stream_scored")


def ann_serve_stream(
    enc: DataFrame,
    query_stream: DataFrame,
    centroids: list,
    codebooks: list,
    out_path: str,
    checkpoint_dir: str,
    k: int = 5,
    nprobe: int = 3,
    residual: bool = True,
):
    """STREAMING vector search: serve a stream of query vectors against a
    frozen IVF-PQ index — the online leg of the ANN family, next to model
    scoring (`score_stream`) and BM25 alerting.

    The index frame ``enc`` (:func:`~spark_ensemble_spark.operators.\
similarity.ivfpq_encode`, persisted) is the STATIC side; each micro-batch
    of queries runs the full probe (cells + LUT broadcast + ADC + per-query
    top-k window) through ``foreachBatch`` — window functions are not
    allowed on unbounded streams, but a micro-batch IS a batch, so the
    exact batch probe serves unchanged. Results land as
    ``batch_id=N``-scoped parquet overwrites (the rollup store's
    exactly-once idempotent-rewrite convention: a replayed batch rewrites
    its own partition, never double-appends). Driver state: none — the
    quantizer literals ride in the plan.

    Returns the started ``StreamingQuery``; callers drain it and read
    ``out_path``."""
    from spark_ensemble_spark.operators.similarity import ivfpq_probe

    def score_batch(batch_df, batch_id: int) -> None:
        out = ivfpq_probe(
            enc,
            batch_df,
            centroids,
            codebooks,
            k=k,
            nprobe=nprobe,
            residual=residual,
        )
        out.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")

    return (
        query_stream.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def ann_index_stream(
    corpus_stream: DataFrame,
    centroids: list,
    codebooks: list,
    index_path: str,
    checkpoint_dir: str,
    residual: bool = True,
):
    """STREAMING index maintenance — the ingest leg of the ANN family,
    closing the lifecycle next to :func:`ann_serve_stream`'s query leg:
    corpus vectors arrive on a stream and each micro-batch is
    append-ENCODED into the persisted IVF-PQ index (cell id + PQ codes per
    vector, :func:`~spark_ensemble_spark.operators.similarity.\
ivfpq_encode`) as a ``batch_id=N``-scoped idempotent parquet overwrite —
    a crash-replayed batch rewrites its own partition, never
    double-indexes (the `incremental_dedup_stream` index convention).

    The quantizer (centroid + codebook literals) is FROZEN plan state —
    the same-books append-encode contract as ``save_pq_index``: new
    vectors join the index without touching, re-reading, or re-encoding
    what's already indexed, and any :func:`~spark_ensemble_spark.\
operators.similarity.ivfpq_probe` consumer (batch or the streaming
    server) reads the union directory as-of its own scan. Driver state:
    none. Returns the started StreamingQuery."""
    from spark_ensemble_spark.operators.similarity import ivfpq_encode

    def encode_batch(batch_df: DataFrame, batch_id: int) -> None:
        ivfpq_encode(
            batch_df, centroids, codebooks, residual=residual
        ).write.mode("overwrite").parquet(f"{index_path}/batch_id={batch_id}")

    return (
        corpus_stream.writeStream.foreachBatch(encode_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def ann_tombstone_stream(
    removed_stream: DataFrame,
    tombstone_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
):
    """STREAMING takedown maintenance for the persisted ANN code index —
    the delete leg next to :func:`ann_index_stream`'s appends (the
    ``bm25_tombstone_stream`` posture, vector edition): removed vector ids
    arrive on a stream and each micro-batch lands as a ``batch_id``-scoped
    tombstone id list. The code table is never rewritten — deletes are
    just more partials — and :func:`read_ann_index_dir` applies the
    accumulated tombstones at load with one anti-join. Idempotent per
    batch_id. Returns the started StreamingQuery."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select(id_col).distinct().write.mode("overwrite").parquet(
            f"{tombstone_path}/batch_id={batch_id}"
        )

    return (
        removed_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_ann_index_dir(spark, index_path: str, tombstone_path: str = None):
    """Load a stream-built ANN code index for :func:`~spark_ensemble_spark.\
operators.similarity.ivfpq_probe`, applying any :func:`ann_tombstone_stream`
    partials: the union code table anti-joined against the accumulated
    tombstone ids — serve-after-delete equals a from-scratch re-encode of
    the post-delete corpus (frozen quantizers make the surviving rows
    identical)."""
    import os

    enc = spark.read.parquet(index_path)
    if tombstone_path and os.path.isdir(tombstone_path):
        from spark_ensemble_spark.operators.similarity import (
            remove_from_ann_index,
        )

        tomb = spark.read.parquet(tombstone_path)
        idc = [c for c in tomb.columns if c != "batch_id"][0]
        enc = remove_from_ann_index(enc, tomb.select(idc))
    return enc


def compact_ann_index_dir(
    spark,
    index_path: str,
    tombstone_path: str,
    out_path: str,
    keep_recent: int = 0,
    out_tombstone_path: str = None,
) -> None:
    """COMPACTION for the streamed ANN code index — the
    ``compact_bm25_index_dir`` posture, vector edition: anti-join the
    accumulated tombstone ids out of the code table ONCE and rewrite the
    survivors as a fresh generation at ``out_path/batch_id=-1`` (the
    :func:`ann_index_stream` layout — ``-1`` not ``0``, so a new append
    stream's fresh checkpoint restarting at batch 0 cannot overwrite the
    compacted level with its idempotent ``batch_id=0`` write;
    :func:`read_ann_index_dir` serves it with ``tombstone_path=None`` and
    append/delete streams resume on top).  The quantizer is frozen plan
    state, so surviving code rows are byte-identical originals —
    compacted == re-encoded-post-delete-corpus, oracle-checked by
    ``streaming_ann_compaction``.  Read amplification (one anti-join per
    serve against the whole delete history) resets to zero.  Unlike BM25,
    no tombstone carry-forward is needed: ANN deletes are id-lists with
    no stats partial, so a post-compaction re-delivery just anti-joins
    rows that are already gone — idempotent by shape.

    ``keep_recent=r`` is the LEVELED variant (L0→L1, the
    ``compact_bm25_index_dir`` semantics): the ``r`` highest-batch-id
    code batches are carried over as verbatim file copies — write
    amplification stays bounded by one rewrite per level promotion —
    and only the cold batches below them fold into ``batch_id=-1``.
    Tombstone ids whose target vector lives in a kept hot batch are
    RETAINED at ``out_tombstone_path/batch_id=-1`` (required when any
    exist; serve the generation with ``tombstone_path=out_tombstone_path``)
    so the hot level's verbatim rows still anti-join away at read."""
    import os
    import shutil

    if os.path.realpath(out_path) == os.path.realpath(index_path):
        raise ValueError(
            "compact_ann_index_dir cannot compact in place: the rewrite "
            "would overwrite a directory its own lazy plan reads from — "
            "write a new generation directory, then swap"
        )
    from spark_ensemble_spark.streaming.corpus import _batch_dirs

    batch_ids = _batch_dirs(index_path)
    hot = batch_ids[len(batch_ids) - keep_recent:] if keep_recent > 0 else []
    cold = [b for b in batch_ids if b not in set(hot)]

    live_tomb = None
    if tombstone_path and os.path.isdir(tombstone_path):
        tomb = spark.read.parquet(tombstone_path)
        idc = [c for c in tomb.columns if c != "batch_id"][0]
        live_tomb = tomb.select(idc).distinct()

    # Validate the retained-tombstone precondition BEFORE writing any
    # output (ADVICE r11): raising after the cold fold / hot copies left a
    # partial — unsafe-to-serve — generation behind, and a retry into the
    # same out_path then crashed in copytree on the existing destination.
    retained = None
    if live_tomb is not None and hot:
        hot_enc = spark.read.parquet(
            *[f"{index_path}/batch_id={b}" for b in hot]
        )
        # the code-table id column is neighbor_id (the ivfpq_encode /
        # hamming-code layout remove_from_ann_index anti-joins on)
        retained = live_tomb.join(
            hot_enc.select(
                F.col("neighbor_id").alias(live_tomb.columns[0])
            ).distinct(),
            live_tomb.columns[0],
            "left_semi",
        )
        if retained.limit(1).count() == 0:
            retained = None
        elif out_tombstone_path is None:
            raise ValueError(
                "keep_recent compaction retained tombstone ids that "
                "target the kept hot level — pass out_tombstone_path "
                "so the generation can be served with them"
            )
    if cold:
        cold_enc = spark.read.parquet(
            *[f"{index_path}/batch_id={b}" for b in cold]
        )
        if live_tomb is not None:
            from spark_ensemble_spark.operators.similarity import (
                remove_from_ann_index,
            )

            cold_enc = remove_from_ann_index(cold_enc, live_tomb)
        cold_enc.write.mode("overwrite").parquet(f"{out_path}/batch_id=-1")
    # hot copies REMAPPED to reserved negative ids (-2, -3, … most-recent
    # first): a fresh append checkpoint restarting at batch 0 would
    # otherwise overwrite a hot copy parked at its original positive id
    # (ADVICE r11); dirs_exist_ok keeps a retried compaction idempotent.
    for j, b in enumerate(sorted(hot, reverse=True)):
        shutil.copytree(
            f"{index_path}/batch_id={b}",
            f"{out_path}/batch_id={-(2 + j)}",
            dirs_exist_ok=True,
        )
    if retained is not None:
        retained.write.mode("overwrite").parquet(
            f"{out_tombstone_path}/batch_id=-1"
        )
