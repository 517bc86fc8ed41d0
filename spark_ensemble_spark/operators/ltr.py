"""Learning-to-rank over hybrid retrieval features.

The supervised counterpart of ``rrf_fuse``: instead of fusing branch RANKS
with a fixed reciprocal formula, collect each candidate's branch SCORES as
features and rank by a learned linear model — the classic LTR serving
shape (pointwise linear scorer over lexical + semantic signals), and the
place where this repo's two halves meet: the retrieval stack produces the
features, the estimator discipline (train → export literals → serve as
pure column expressions) produces the model.

Exactness contract (what makes every stage hash-checkable): both feature
sources already live on the 1e-6 grid — BM25 scores arrive as exact
micro-unit BIGINTs and cosines are floor-rounded doubles — so features
are EXACT BIGINTs, the learned weights grid the same way, and a
candidate's score is a plain integer dot product: order-insensitive,
overflow-safe (|w|·|x| ≤ ~1e13 per term), and bit-identical on every
engine. Ranking sorts native int64, so a cross-engine tie hazard cannot
exist by construction — the lesson of the r7/r8 rounding campaigns,
applied from the start.

Training (:func:`ltr_train_weights`) solves the 2-feature least-squares
normal equations from EXACT integer sums: one distributed ``agg`` of
BIGINT products summed as DECIMAL(38,0) (order-insensitive exact at any
scale), then a driver-side Cramer solve in arbitrary-precision rational
arithmetic — model-sized driver state, fully deterministic under
repartitioning, exported as gridded literals like every other trained
quantizer here (``train_ivf_centroids``, ``pq_train_codebooks``). The
oracle-checked serving row uses fixed literals for the same reason the
IVF row does: the oracle string is static; the trainer is verified by
planted-weight recovery and partition-invariance property tests.

Reference parity: the reference engine has no retrieval or LTR surface —
beyond-reference LLM-pipeline scope (SURVEY.md §6). Pointwise linear LTR
per Joachims 2002 / the classic "learning to rank using gradient descent"
framing, implemented as exact least squares.
"""

from __future__ import annotations

import math
from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_ensemble_spark.functions.rounding import (
    floor_round_int as _floor_round_int,
    floor_round_int_sql as _floor_round_int_sql,
)

SCALE = 10**6


def ltr_features(
    lex: DataFrame,
    vec: DataFrame,
    doc_col: str = "doc_id",
) -> DataFrame:
    """Candidate feature frame from the two branch top-k lists: FULL OUTER
    join on (query_id, doc) — a candidate found by only one branch keeps a
    0 for the other's feature (the standard LTR missing-signal convention)
    — with both features as exact 1e-6-scaled BIGINTs.

    ``lex``: ``(query_id, doc, score_micro BIGINT)`` from ``bm25_topk``.
    ``vec``: ``(query_id, doc, cosine double)`` from any similarity top-k.
    Frames are top-k-sized (k·|queries| rows each) — the join is tiny
    regardless of corpus size."""
    lf = lex.select(
        "query_id",
        F.col(doc_col),
        F.col("score_micro").cast("long").alias("x_bm25"),
    )
    vf = vec.select(
        "query_id",
        F.col(doc_col),
        _floor_round_int(F.col("cosine"), 6).alias("x_cos"),
    )
    return (
        lf.join(vf, ["query_id", doc_col], "outer")
        .withColumn("x_bm25", F.coalesce("x_bm25", F.lit(0)))
        .withColumn("x_cos", F.coalesce("x_cos", F.lit(0)))
    )


def ltr_score(
    features: DataFrame,
    w_bm25: float,
    w_cos: float,
    k: int = 5,
    doc_col: str = "doc_id",
) -> DataFrame:
    """Rank candidates by the gridded linear model: weights snap to the
    1e-6 grid (``floor(w·10⁶+0.5)`` — exact ints), a candidate's score is
    the BIGINT dot product ``w_bm25·x_bm25 + w_cos·x_cos``, and the
    ranking sorts exact int64 (desc, doc asc) — no float enters the sort
    key. The reported ``ltr_score`` unscales once (÷10¹²) for
    readability; both engines divide the same exact integer, so even the
    double column hashes identically."""
    wb = int(math.floor(w_bm25 * SCALE + 0.5))
    wc = int(math.floor(w_cos * SCALE + 0.5))
    scored = features.withColumn(
        "__si", F.lit(wb) * F.col("x_bm25") + F.lit(wc) * F.col("x_cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__si"), F.asc(doc_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            doc_col,
            (F.col("__si").cast("double") / F.lit(1.0e12)).alias("ltr_score"),
            "rank",
        )
    )


def ltr_oracle_sql(
    lex_sql: str,
    vec_sql: str,
    w_bm25: float,
    w_cos: float,
    k: int = 5,
    doc_col: str = "doc_id",
) -> str:
    """DuckDB replay of ``ltr_score(ltr_features(...))``: the same outer
    join, the same exact integer scaling/weights/dot product, the same
    (score desc, doc asc) tie-break. ``lex_sql`` must emit
    ``(query_id, {doc}, score_micro)``; ``vec_sql`` ``(query_id, {doc},
    cosine)``."""
    wb = int(math.floor(w_bm25 * SCALE + 0.5))
    wc = int(math.floor(w_cos * SCALE + 0.5))
    return f"""
    WITH lex AS (
      SELECT query_id, {doc_col},
             CAST(score_micro AS BIGINT) AS x_bm25
      FROM ({lex_sql})
    ),
    vec AS (
      SELECT query_id, {doc_col},
             {_floor_round_int_sql('cosine', 6)} AS x_cos
      FROM ({vec_sql})
    ),
    feat AS (
      SELECT query_id, {doc_col},
             COALESCE(x_bm25, 0) AS x_bm25,
             COALESCE(x_cos, 0) AS x_cos
      FROM lex FULL OUTER JOIN vec USING (query_id, {doc_col})
    ),
    scored AS (
      SELECT query_id, {doc_col},
             {wb} * x_bm25 + {wc} * x_cos AS si
      FROM feat
    )
    SELECT query_id, {doc_col},
           CAST(si AS DOUBLE) / 1000000000000.0 AS ltr_score,
           rank
    FROM (
      SELECT *, CAST(row_number() OVER (
                  PARTITION BY query_id ORDER BY si DESC, {doc_col}
                ) AS INT) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def ltr_train_weights(
    features: DataFrame,
    label_col: str = "label",
    grid_to: int = 6,
) -> tuple[float, float, float]:
    """Exact least-squares fit of ``label ≈ w_b·x_bm25/10⁶ + w_c·x_cos/10⁶
    + bias``: returns ``(w_bm25, w_cos, bias)`` gridded to ``grid_to``
    decimals.

    ONE distributed aggregate computes the nine normal-equation sums over
    the exact scaled-integer features and an integer-scaled label
    (``floor(y·10⁶+0.5)``), each product summed as DECIMAL(38,0) —
    order-insensitive exact, so the fit is bit-deterministic under any
    partitioning. The 3×3 solve runs driver-side in arbitrary-precision
    ``Fraction`` arithmetic (exact Cramer — the determinant magnitudes that
    overflow any fixed-width SQL type are free in Python), then the exact
    rationals grid to plan literals. Degenerate systems (constant feature,
    det = 0) raise rather than returning garbage."""
    yi = _floor_round_int(F.col(label_col).cast("double"), 6)
    f = features.select(
        F.col("x_bm25").alias("a"), F.col("x_cos").alias("b"), yi.alias("y")
    )

    def dsum(expr) -> F.Column:
        return F.sum(expr.cast("decimal(38,0)"))

    row = f.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("a")).alias("sa"),
        dsum(F.col("b")).alias("sb"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("a") * F.col("a")).alias("saa"),
        dsum(F.col("a") * F.col("b")).alias("sab"),
        dsum(F.col("b") * F.col("b")).alias("sbb"),
        dsum(F.col("a") * F.col("y")).alias("say"),
        dsum(F.col("b") * F.col("y")).alias("sby"),
    ).collect()[0]
    n = int(row["n"])
    if n == 0:
        raise ValueError("ltr_train_weights: empty feature frame")
    sa, sb, sy = int(row["sa"]), int(row["sb"]), int(row["sy"])
    saa, sab, sbb = int(row["saa"]), int(row["sab"]), int(row["sbb"])
    say, sby = int(row["say"]), int(row["sby"])

    # normal equations in the SCALED units (features a,b and label y are all
    # ×10⁶): [saa sab sa; sab sbb sb; sa sb n] · [wa; wb; c] = [say; sby; sy]
    m = [
        [Fraction(saa), Fraction(sab), Fraction(sa)],
        [Fraction(sab), Fraction(sbb), Fraction(sb)],
        [Fraction(sa), Fraction(sb), Fraction(n)],
    ]
    rhs = [Fraction(say), Fraction(sby), Fraction(sy)]

    def det3(a) -> Fraction:
        return (
            a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1])
            - a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0])
            + a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0])
        )

    d = det3(m)
    if d == 0:
        raise ValueError("ltr_train_weights: singular normal equations")

    def solve(col: int) -> Fraction:
        mm = [r[:] for r in m]
        for i in range(3):
            mm[i][col] = rhs[i]
        return det3(mm) / d

    # wa/wb are unit-free (scaled feature regressed on scaled label — the
    # two 10⁶ factors cancel); the intercept carries one residual 10⁶
    # (scaled-label units) — unscale it.
    wa, wb_, c = solve(0), solve(1), solve(2) / SCALE
    g = 10**grid_to

    def grid(x: Fraction) -> float:
        return float(math.floor(x * g + Fraction(1, 2)) / g)

    return grid(wa), grid(wb_), grid(c)
