"""Streaming corpus-curation operators.

Decontamination at INGEST time: the Bloom bitmask compiled from an eval
suite (:func:`~spark_ensemble_spark.operators.corpus.ngram_bloom_build`) is
pure constant state, so membership testing is a stateless per-row
projection — it composes with ``readStream`` in append mode with ZERO
streaming state (no watermark, no agg), which is exactly what a 100 TB/day
document firehose wants: contaminated docs never even land in the corpus.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ensemble_spark.operators.corpus import _md5_hash_pair
from spark_ensemble_spark.operators.dedup import _shingle_strings

# 2^bit as BIGINT for bit 0..63 (bit 63 is the sign-bit pattern); indexed by
# element_at because shiftleft/shiftright only take literal shift amounts,
# and inside a higher-order-function lambda the shift amount is a column.
_POW2 = [1 << i for i in range(63)] + [-(1 << 63)]


def _bloom_hit(s: Column, mask: Column, num_bits: int, num_hashes: int) -> Column:
    """True iff every double-hashed position of gram ``s`` is set in the
    Bloom ``mask`` (array<bigint> literal). Same md5-60-bit double hashing
    as the batch :func:`~spark_ensemble_spark.operators.corpus.\
bloom_contamination`, so stream and batch flag the identical gram set."""
    h1, h2 = _md5_hash_pair(s)
    p2 = F.lit(_POW2).cast("array<bigint>")
    cond = None
    for i in range(num_hashes):
        p = F.pmod(h1 + F.lit(i) * h2, F.lit(num_bits))
        # p < 2^20 ≪ 2^53: the double round-trip of floor(p/64) is exact
        w = F.floor(p / F.lit(64)).cast("int")
        bit = F.pmod(p, F.lit(64)).cast("int")
        c = (
            F.element_at(mask, w + F.lit(1)).bitwiseAND(
                F.element_at(p2, bit + F.lit(1))
            )
            != 0
        )
        cond = c if cond is None else (cond & c)
    return cond


def decontaminate_stream(
    docs: DataFrame,
    bloom_words: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 8,
    num_hashes: int = 4,
    max_ratio: float = 0.5,
) -> DataFrame:
    """Filter a document stream (or batch frame — the program is identical)
    against a Bloom decontamination mask: appends ``n_shingles`` /
    ``n_flagged`` / ``flagged_ratio`` and keeps rows with
    ``flagged_ratio <= max_ratio``.

    Unlike the batch :func:`~spark_ensemble_spark.operators.corpus.\
bloom_contamination` (explode → groupBy, the high-throughput shape), the
    per-document counts here are per-ROW folds over the shingle array —
    interpreted, so ~2-3× slower per token, but completely STATELESS:
    append-mode streaming with no watermark, no aggregation buffer, and
    exact parity with the batch flag decision (same shingles, same md5
    double-hash, same mask)."""
    num_bits = len(bloom_words) * 64
    mask = F.lit(bloom_words).cast("array<bigint>")
    shingles = _shingle_strings(F.col(text_col), shingle_size, "word")
    flagged = F.size(
        F.filter(shingles, lambda s: _bloom_hit(s, mask, num_bits, num_hashes))
    )
    out = (
        docs.withColumn("n_shingles", F.size(shingles).cast("bigint"))
        .withColumn("n_flagged", flagged.cast("bigint"))
        .withColumn(
            "flagged_ratio",
            F.round(F.col("n_flagged") / F.col("n_shingles").cast("double"), 6),
        )
    )
    return out.filter(F.col("flagged_ratio") <= max_ratio)


def read_documents_stream(
    spark: SparkSession, path: str, glob: str | None = "documents.parquet"
) -> DataFrame:
    """File-source streaming read of the documents table; the schema comes
    from a batch footer probe (no data job), mirroring
    :func:`~spark_ensemble_spark.streaming.events.read_events_stream`."""
    probe = spark.read.parquet(f"{path}/{glob}" if glob else path)
    reader = spark.readStream.schema(probe.schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.parquet(path)


def streaming_decontaminate(
    spark: SparkSession,
    sf_dir: str,
    shingle_size: int = 8,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    max_ratio: float = 0.5,
) -> DataFrame:
    """File-replay harness: compile the eval suite (doc_id % 20 == 0) to a
    Bloom mask batch-side, stream the documents table through the
    decontamination filter, and return the surviving rows' flag columns.
    Every eval member self-flags at ratio 1.0 and is dropped; clean docs
    pass with only Bloom false positives flagged."""
    from spark_ensemble_spark.operators.corpus import ngram_bloom_build
    from spark_ensemble_spark.sources.datasets import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = ngram_bloom_build(
        docs.filter(F.col("doc_id") % 20 == 0),
        "text",
        shingle_size,
        num_bits,
        num_hashes,
    )
    stream = read_documents_stream(spark, sf_dir).select("doc_id", "text")
    kept = decontaminate_stream(
        stream,
        words,
        "text",
        "doc_id",
        shingle_size,
        num_hashes,
        max_ratio,
    ).select("doc_id", "n_shingles", "n_flagged", "flagged_ratio")
    name = "stream_decontaminate_out"
    q = (
        kept.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ses-decontam-"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
