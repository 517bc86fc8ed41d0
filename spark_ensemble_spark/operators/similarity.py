"""Similarity search (ANN) over embedding columns.

* :func:`brute_force_topk` — exact cosine top-k: broadcast the (small) query
  set, one pass over the corpus, per-query top-k via window. The baseline and
  the oracle path.
* :func:`ivf_topk` — IVF-style approximate search: KMeans centroids (trained
  on a sample), corpus partitioned by nearest centroid, queries probe the
  ``nprobe`` nearest centroids only. At 100 TB the scan is cut by
  ``nprobe/num_clusters`` and the shuffle key is the centroid id.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query (query_id, neighbor_id, cosine, rank).

    Ties break on neighbor id so results are deterministic across engines.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    joined = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("cv"), F.col("qv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_clusters: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 13,
    kmeans_max_iter: int = 8,
) -> DataFrame:
    """IVF approximate top-k: assign corpus rows to their nearest KMeans
    centroid, probe only the ``nprobe`` closest centroids per query."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("feat", array_to_vector("cv"))
    km = KMeans(
        k=num_clusters,
        seed=seed,
        maxIter=kmeans_max_iter,  # coarse quantizer: convergence precision is wasted here
        featuresCol="feat",
        predictionCol="cluster",
    )
    model = km.fit(c)
    assigned = model.transform(c).select("neighbor_id", "cv", "cluster")

    centroids = [list(map(float, ctr)) for ctr in model.clusterCenters()]
    centroid_arr = F.array(
        *[F.array(*[F.lit(x) for x in ctr]) for ctr in centroids]
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    # distances to every centroid → nprobe nearest cluster ids
    dists = F.transform(
        centroid_arr,
        lambda ctr: F.aggregate(
            F.zip_with(F.col("qv"), ctr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda s, v: s + v,
        ),
    )
    probes = F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(
                    dists,
                    F.sequence(F.lit(0), F.lit(num_clusters - 1)),
                    lambda d, i: F.struct(d.alias("d"), i.alias("i")),
                )
            ),
            lambda s: s["i"],
        ),
        1,
        nprobe,
    )
    q = q.withColumn("cluster", F.explode(probes))

    joined = assigned.join(q, on="cluster").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("cv"), F.col("qv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
