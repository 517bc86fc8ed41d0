"""Embedding-column utilities for training-data pipelines.

Beyond-reference operators (the reference has no embedding surface; provenance
is the standard retrieval/data-curation toolkit): L2 normalization, symmetric
int8 quantization (the storage format of large ANN corpora — 4× smaller than
float32, which at 100 TB is the difference between one copy and four), per-
dimension moment statistics (the whitening/normalization pass), and
deterministic hash-based dataset splitting (train/val/test assignment that is
reproducible across runs, engines, and row order — never ``rand()``, whose
output depends on partitioning).

Everything is pure Catalyst on ``array<float/double>`` columns — no UDFs; the
only wide stage in the module is ``dim_stats``'s aggregation, which reduces
to ``dim`` rows via map-side partials. The sole driver state is model-sized:
``train_pca_projection`` exports a (mean, k×dim components) literal dict, the
same train → export → codegen posture as the IVF/SemDeDup centroid exports.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def l2_normalize(vec: Column) -> Column:
    """Unit-L2 vector (zero vectors stay zero instead of dividing by 0).

    After normalization, cosine similarity is a plain dot product — at scale
    you normalize ONCE at ingest and every downstream ANN/dedup pass skips the
    per-pair norm arithmetic."""
    v = _as_double(vec)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(norm > 0, F.transform(v, lambda x: x / norm)).otherwise(v)


def quantize_int8(vec: Column) -> Column:
    """Symmetric per-vector int8 quantization: struct(codes array<int>, scale).

    ``scale = max(|x|)/127``; ``code = floor(x/scale + 0.5)`` (explicit
    half-up — ``round()`` ties differ between engines, ``floor(+0.5)`` does
    not). The all-zero vector gets scale 0 and all-zero codes. Dequantized
    error is bounded by scale/2 per component, so cosine on dequantized
    vectors is within ~1% for typical embedding distributions — the standard
    recall/storage trade of IVF-SQ8-style indexes."""
    v = _as_double(vec)
    amax = F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
    scale = amax / F.lit(127.0)
    codes = F.when(
        scale > 0,
        F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return F.struct(codes.alias("codes"), scale.alias("scale"))


def dequantize(codes: Column, scale: Column) -> Column:
    """Inverse of :func:`quantize_int8` (lossy): ``code * scale``."""
    return F.transform(codes, lambda c: c.cast("double") * scale)


def dim_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (dim, n, mean, m2, min, max): the statistics pass behind
    mean-centering / whitening / feature clipping.

    Plan: ``posexplode`` the vectors → groupBy(dim). The explode multiplies
    rows by ``dim``, but every column except (dim, value) is dropped FIRST and
    the aggregation partial-reduces map-side to ``dim`` groups — the shuffle
    carries dim × partitions rows, not corpus × dim. mean/m2 are computed as
    exact DECIMAL sums ÷ count so partial-agg order cannot move the reported
    values (same hardening as the relational aggregates)."""
    exploded = df.select(
        F.posexplode(_as_double(F.col(vec_col))).alias("dim", "__v")
    )
    dec = F.col("__v").cast("decimal(38,12)")
    # square in DOUBLE (IEEE-identical on any engine), then cast the product:
    # decimal×decimal would hit engine-specific precision-loss rules
    dec2 = (F.col("__v") * F.col("__v")).cast("decimal(38,12)")
    return exploded.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("mean"),
        (F.sum(dec2).cast("double") / F.count(F.lit(1))).alias("m2"),
        F.min("__v").alias("min"),
        F.max("__v").alias("max"),
    )


def split_by_hash(
    df: DataFrame,
    id_col: str,
    fractions: Dict[str, float],
    seed: str = "split",
) -> DataFrame:
    """Deterministic dataset split: adds a ``split`` column assigning each row
    to a named fraction by a stable hash of its id.

    ``bucket = md5(seed || id) mod 10^6`` → cumulative-fraction ranges. The
    assignment is a pure function of (seed, id): reproducible across runs,
    engines, partitionings, and row order — the property ``rand(seed)``-based
    splits silently lack (Spark's rand is seeded PER PARTITION, so a repartition
    reshuffles the split). Narrow projection; no shuffle, no RNG state.
    """
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    # 60-bit md5 prefix (see dedup._hash64) mod 1e6: cross-engine exact.
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 15),
            16,
            10,
        ).cast("long"),
        F.lit(1_000_000),
    )
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = bucket < int(round(cum * 1_000_000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)


def split_counts(
    df: DataFrame, id_col: str, fractions: Dict[str, float], seed: str = "split"
) -> DataFrame:
    """(split, n) summary of :func:`split_by_hash` — the verification view."""
    return (
        split_by_hash(df, id_col, fractions, seed)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_pca_projection(
    corpus: DataFrame, vec_col: str = "embedding", k: int = 8, dim: int | None = None
) -> dict:
    """Train a centering PCA projection and EXPORT it as plain literals —
    the train → export → codegen posture (same as train_ivf_centroids):
    ``{"mean": [dim floats], "components": [k lists of dim floats],
    "offsets": [k floats]}``, where ``offsets[j] = mean·components[j]`` so
    serving is ``proj_j(v) = dot(v, c_j) − offset_j`` (centering folded into
    a precomputed scalar — one fold per output dim, no per-row subtraction
    pass). The exported dict is model-sized driver state, JSON-serializable
    and reusable across engines.

    Dimensionality reduction is the standard pre-ANN pass at corpus scale:
    64→8 dims cuts candidate-scoring flops and index bytes ~8× while PCA
    keeps the highest-variance directions (a random projection of the same
    k keeps ~k/dim of the variance). Spark's ``ml.PCA`` famously does NOT
    center its input, so the mean is computed here and subtracted before
    the fit — otherwise component 1 just points at the data mean."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    v = _as_double(F.col(vec_col))
    base = corpus.select(v.alias("v"))
    if dim is None:
        dim = len(base.first()[0])
    mean_row = base.agg(
        *[F.avg(F.element_at("v", i + 1)).alias(f"m{i}") for i in range(dim)]
    ).first()
    mean = [float(mean_row[f"m{i}"]) for i in range(dim)]
    mean_arr = "array(" + ",".join(f"CAST('{x!r}' AS DOUBLE)" for x in mean) + ")"
    centered = base.select(
        F.expr(f"zip_with(v, {mean_arr}, (x, m) -> x - m)").alias("c")
    )
    model = PCA(k=k, inputCol="feat", outputCol="__p").fit(
        centered.select(array_to_vector("c").alias("feat"))
    )
    pc = model.pc.toArray()  # dim × k
    components = [[float(pc[i, j]) for i in range(dim)] for j in range(k)]
    offsets = [
        float(sum(m * c for m, c in zip(mean, comp))) for comp in components
    ]
    return {"mean": mean, "components": components, "offsets": offsets}


def train_word2vec_embeddings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 32,
    min_count: int = 2,
    max_iter: int = 1,
    seed: int = 7,
):
    """Spark ML Word2Vec over the corpus (SURVEY §7 step 9's named trainer):
    returns ``(doc_vectors, model)`` where ``doc_vectors`` is
    ``(id_col, embedding array<double>)`` — Word2Vec's document vector is
    the mean of its word vectors, so every document lands in the same
    space as the vocabulary. The TRAINED production entry point to the
    ANN/dedup families next to the hashed-BOW + projection bridge
    (``docs_embed_ann_topk``): feed ``doc_vectors`` to ``ivf_topk`` /
    ``ivfpq_encode`` / SemDeDup unchanged.

    Verification tier: Word2Vec's negative-sampling SGD is stochastic
    across partitionings, so this is a rows-only / property-test operator
    (the xxhash64-variant class) — the deterministic twin that
    hash-checks end-to-end is the fixed-projection bridge row.

    Scale: Spark ML Word2Vec broadcasts the vocabulary vectors per
    iteration (vocab × dim floats) and aggregates gradients — vocab-sized
    driver/executor state, corpus-sized data never collected; cap the
    vocabulary via ``min_count`` at 100 TB."""
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    toks = df.select(
        F.col(id_col),
        F.filter(
            F.split(
                F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
            ),
            lambda t: t != "",
        ).alias("__toks"),
    )
    w2v = Word2Vec(
        vectorSize=dim,
        minCount=min_count,
        maxIter=max_iter,
        seed=seed,
        inputCol="__toks",
        outputCol="__vec",
    )
    model = w2v.fit(toks)
    out = model.transform(toks).select(
        F.col(id_col), vector_to_array(F.col("__vec")).alias("embedding")
    )
    return out, model


def fixed_projection(dim: int, k: int, seed: int = 31) -> dict:
    """Deterministic pseudo-random projection in the exported-PCA dict
    format (zero mean/offsets, N(0, 1/√dim) components) — the FIXED
    quantizer of the projection family, importable without a SparkSession
    so DuckDB oracle builders embed the exact same literals.  Production
    swaps in :func:`train_pca_projection`'s trained literals the same way
    ``ivf_fixed_centroids``/``pq_fixed_codebooks`` swap for their trained
    counterparts; a random projection preserves pairwise geometry in
    expectation (Johnson-Lindenstrauss), which is what makes the fixed
    variant a usable — and fully replayable — dim-reduction stage."""
    import random

    rng = random.Random(seed)
    scale = 1.0 / dim**0.5
    comps = [[rng.gauss(0, scale) for _ in range(dim)] for _ in range(k)]
    return {
        "mean": [0.0] * dim,
        "components": comps,
        "offsets": [0.0] * k,
    }


def pca_project_sql(vec_sql: str, projection: dict) -> str:
    """DuckDB mirror of :func:`pca_project` for one row's vector expression:
    a list literal of k sequential-fold dot products minus the offset
    literals — the same IEEE summation order as the Spark
    ``aggregate(zip_with(...))`` chains (``functions.rounding.seq_dot_sql``),
    so a fixed or exported projection replays bit-for-bit."""
    from spark_ensemble_spark.functions.rounding import seq_dot_sql

    outs = []
    for comp, off in zip(projection["components"], projection["offsets"]):
        arr = "[" + ",".join(f"CAST('{x!r}' AS DOUBLE)" for x in comp) + "]"
        outs.append(f"({seq_dot_sql(vec_sql, arr)}) - CAST('{off!r}' AS DOUBLE)")
    return "[" + ", ".join(outs) + "]"


def save_pca_projection(projection: dict, path: str) -> None:
    """Persist an exported projection as JSON — the serving artifact a later
    job (or another engine) loads without retraining; pairs with the PQ
    index persistence (`similarity.save_pq_index`) for a fully
    re-loadable embedding pipeline."""
    from spark_ensemble_spark.core.persistence import save_json

    save_json(path, projection)


def load_pca_projection(path: str) -> dict:
    """Inverse of :func:`save_pca_projection`."""
    from spark_ensemble_spark.core.persistence import load_json

    return load_json(path)


def pca_project(
    df: DataFrame,
    projection: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Apply an exported PCA projection as deterministic fold chains:
    ``out[j] = aggregate(zip_with(v, c_j)) − offset_j`` — the same
    left-to-right IEEE order as the SRP/IVF chains, so given fixed literals
    the projection is bit-replayable by a SQL oracle. One narrow projection,
    no shuffle; k folds per row (k ≪ dim is the point)."""
    dots = []
    for comp, off in zip(projection["components"], projection["offsets"]):
        arr = "array(" + ",".join(f"CAST('{x!r}' AS DOUBLE)" for x in comp) + ")"
        dots.append(
            F.expr(
                f"aggregate(zip_with(transform({vec_col}, e -> CAST(e AS DOUBLE)), "
                f"{arr}, (a, b) -> a * b), "
                f"CAST(0.0 AS DOUBLE), (s, x) -> s + x) - CAST('{off!r}' AS DOUBLE)"
            )
        )
    return df.withColumn(out_col, F.array(*dots))
