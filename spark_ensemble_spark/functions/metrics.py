"""One-pass model-evaluation metrics as DataFrame aggregations.

The reference evaluates models inside its test suites with driver-side
RegressionEvaluator / MulticlassClassificationEvaluator calls (e.g.
``BaggingClassifierSuite.scala:48-78``, ``GBMRegressorSuite.scala:51-76``).
Here the same metrics are first-class distributed operators: a single
hash-aggregate pass over (label, prediction) columns, no collect of data,
so the evaluation itself scales with the scoring scan at 100 TB.

Summation-order hardening: squared/absolute error sums are accumulated in
DECIMAL(38,6) so partial-aggregation order (8 vs 1000 executors) cannot move
the rounded output — the same discipline as ``q1_pricing_summary``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ensemble_spark.functions.rounding import (
    floor_round,
    floor_round_int,
    floor_round_int_sql,
    floor_round_sql,
)
from spark_ensemble_spark.functions.detmath import (
    det_ln as _det_ln,
    det_ln_sql as _det_ln_sql,
)

_floor_round = floor_round
_floor_round_sql = floor_round_sql

_DEC = "decimal(38,6)"


def regression_metrics(
    df: DataFrame,
    label_col: str = "label",
    prediction_col: str = "prediction",
    round_to: int = 6,
) -> DataFrame:
    """RMSE / MAE / R² / n in ONE aggregation pass.

    R² is computed from sufficient statistics (Σy, Σy², Σ(y−p)²) rather than
    a second centering pass, so the whole evaluation is a single map-side-
    combined hash aggregate — one job, no re-scan, no driver math beyond the
    final row.
    """
    y = F.col(label_col)
    p = F.col(prediction_col)
    err = y - p
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((err * err).cast(_DEC)).cast("double").alias("sse"),
        F.sum(F.abs(err).cast(_DEC)).cast("double").alias("sae"),
        F.sum(y.cast(_DEC)).cast("double").alias("sy"),
        F.sum((y * y).cast(_DEC)).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    sst = F.col("syy") - F.col("sy") * F.col("sy") / n
    return agg.select(
        F.col("n"),
        _floor_round(F.sqrt(F.col("sse") / n), round_to).alias("rmse"),
        _floor_round(F.col("sae") / n, round_to).alias("mae"),
        _floor_round(
            F.when(sst > 0, 1.0 - F.col("sse") / sst).otherwise(F.lit(None)),
            round_to,
        ).alias("r2"),
    )


def regression_metrics_sql(
    table_expr: str,
    label_sql: str,
    prediction_sql: str,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`regression_metrics` (same decimal partials,
    same rounding) for oracle registration."""
    return f"""
    SELECT n,
           {_floor_round_sql("sqrt(sse / n)", round_to)} AS rmse,
           {_floor_round_sql("sae / n", round_to)} AS mae,
           {_floor_round_sql('''CASE WHEN (syy - sy*sy/n) > 0
                      THEN 1.0 - sse / (syy - sy*sy/n) END''', round_to)} AS r2
    FROM (
      SELECT count(*) AS n,
             CAST(sum(CAST((y - p) * (y - p) AS DECIMAL(38,6))) AS DOUBLE) AS sse,
             CAST(sum(CAST(abs(y - p) AS DECIMAL(38,6))) AS DOUBLE) AS sae,
             CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
      FROM (SELECT {label_sql} AS y, {prediction_sql} AS p FROM {table_expr})
    )
    """


def classification_metrics(
    df: DataFrame,
    label_col: str = "label",
    prediction_col: str = "prediction",
    round_to: int = 6,
) -> DataFrame:
    """Per-class precision / recall / F1 + support, one row per true class.

    Shape: ONE shuffle on (label, prediction) builds the confusion counts —
    a K²-row frame however large the input — then all per-class math happens
    on that tiny frame (window sums over K² rows, no second pass over data).
    Classes the model never predicts get precision 0.0 (the sklearn
    zero-division=0 convention) so the output never contains NULL floats.
    """
    lbl = F.col(label_col).cast("double")
    prd = F.col(prediction_col).cast("double")
    conf = (
        df.select(lbl.alias("label"), prd.alias("prediction"))
        .groupBy("label", "prediction")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # per-class totals re-aggregate the K^2-row confusion frame (tiny);
    # classes with zero true positives still need a row, so start from the
    # per-class true totals and left-join the diagonal
    diag = conf.filter(F.col("label") == F.col("prediction")).select(
        "label", F.col("c").alias("tp")
    )
    truths = conf.groupBy("label").agg(F.sum("c").alias("n_true"))
    preds = conf.groupBy("prediction").agg(F.sum("c").alias("n_pred"))
    base = (
        truths.join(diag, "label", "left")
        .join(preds.withColumnRenamed("prediction", "label"), "label", "left")
        .select(
            "label",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            "n_true",
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
        )
    )
    precision = F.when(
        F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")
    ).otherwise(F.lit(0.0))
    recall = F.col("tp") / F.col("n_true")
    f1 = F.when(
        (precision + recall) > 0, 2 * precision * recall / (precision + recall)
    ).otherwise(F.lit(0.0))
    return base.select(
        "label",
        F.col("n_true").cast("bigint").alias("support"),
        F.col("tp").cast("bigint").alias("tp"),
        _floor_round(precision, round_to).alias("precision"),
        _floor_round(recall, round_to).alias("recall"),
        _floor_round(f1, round_to).alias("f1"),
    )


def classification_metrics_sql(
    table_expr: str,
    label_sql: str,
    prediction_sql: str,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`classification_metrics`."""
    return f"""
    WITH pairs AS (
      SELECT CAST({label_sql} AS DOUBLE) AS label,
             CAST({prediction_sql} AS DOUBLE) AS prediction
      FROM {table_expr}
    ),
    truths AS (SELECT label, count(*) AS n_true FROM pairs GROUP BY label),
    preds AS (SELECT prediction, count(*) AS n_pred FROM pairs GROUP BY prediction),
    diag AS (
      SELECT label, count(*) AS tp FROM pairs
      WHERE label = prediction GROUP BY label
    ),
    base AS (
      SELECT t.label,
             t.n_true,
             coalesce(d.tp, 0) AS tp,
             coalesce(p.n_pred, 0) AS n_pred
      FROM truths t
      LEFT JOIN diag d USING (label)
      LEFT JOIN preds p ON p.prediction = t.label
    )
    SELECT label,
           CAST(n_true AS BIGINT) AS support,
           CAST(tp AS BIGINT) AS tp,
           {_floor_round_sql("CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred ELSE 0.0 END", round_to)} AS precision,
           {_floor_round_sql("tp * 1.0 / n_true", round_to)} AS recall,
           {_floor_round_sql('''CASE WHEN (CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred ELSE 0.0 END
                            + tp * 1.0 / n_true) > 0
                      THEN 2.0 * (CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred ELSE 0.0 END)
                               * (tp * 1.0 / n_true)
                           / ((CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred ELSE 0.0 END)
                              + tp * 1.0 / n_true)
                      ELSE 0.0 END''', round_to)} AS f1
    FROM base
    """


def _psi_bucket(col, edges):
    """Bin index for explicit ``edges`` (len+1 buckets: underflow 0, then
    one per edge interval, overflow len). A CASE chain with float literals
    both engines fold identically; NULLs go to bucket -1 so they are
    visible rather than silently merged."""
    expr = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        expr = F.when(col < F.lit(edges[i]), F.lit(i)).otherwise(expr)
    return F.when(col.isNull(), F.lit(-1)).otherwise(expr)


def population_stability_index(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    edges: list,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard drift monitor between dataset versions or between
    a training corpus and live traffic (PSI < 0.1 stable, > 0.25 drifted).

    Per bucket (explicit ``edges``, fully engine-replayable):
    ``psi_term = (pa − pb) · ln(pa / pb)`` with +0.5 count smoothing so an
    empty bucket cannot produce ±inf. Returns one row per bucket
    (``bucket, n_a, n_b, pa, pb, psi_term``) plus the scalar total as a
    1-row union-able aggregate via ``.agg(sum(psi_term))`` — callers who
    want the dashboard number sum the frame.

    Scale shape: each side is ONE |buckets|-row hash aggregate (map-side
    partials); the join and the ratio math run on those tiny frames. The
    two scans never join each other."""

    def counts(df, name):
        return (
            df.select(_psi_bucket(F.col(value_col), edges).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(name))
        )

    a, b = counts(df_a, "n_a"), counts(df_b, "n_b")
    # totals re-aggregate the bucket frames — each snapshot is scanned ONCE;
    # coalesce(0) keeps an EMPTY snapshot fully smoothed instead of NULLing
    # every term through a NULL total
    ta = a.agg(F.coalesce(F.sum("n_a"), F.lit(0)).alias("__ta"))
    tb = b.agg(F.coalesce(F.sum("n_b"), F.lit(0)).alias("__tb"))
    k = len(edges) + 2  # underflow + intervals + overflow (+ null bucket -1)
    joined = (
        a.join(b, "bucket", "full_outer")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).cast("bigint").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
            F.col("__ta"),
            F.col("__tb"),
        )
    )
    pa = (F.col("n_a") + F.lit(0.5)) / (F.col("__ta") + F.lit(0.5 * k))
    pb = (F.col("n_b") + F.lit(0.5)) / (F.col("__tb") + F.lit(0.5 * k))
    return joined.select(
        "bucket",
        "n_a",
        "n_b",
        _floor_round(pa, round_to).alias("pa"),
        _floor_round(pb, round_to).alias("pb"),
        # det_ln, never the engine's ln (the BM25 r7-r9 env-hazard class)
        _floor_round((pa - pb) * _det_ln(pa / pb), round_to).alias("psi_term"),
    )


def psi_oracle_sql(
    source_a: str,
    source_b: str,
    value_col: str,
    edges: list,
    round_to: int = 6,
) -> str:
    """DuckDB SQL replaying :func:`population_stability_index` bit-for-bit:
    the same CASE-chain bucketing with identical float literals, +0.5
    smoothing, and double division/ln order. ``source_a``/``source_b`` are
    SQL relations (table names or parenthesized subqueries)."""
    from spark_ensemble_spark.functions.detmath import double_literal_sql

    case = f"{len(edges)}"
    for i in range(len(edges) - 1, -1, -1):
        # string->double spelling: a bare inexact edge literal would take
        # DuckDB's DECIMAL comparison path (detmath._dlit)
        case = f"CASE WHEN v < {double_literal_sql(float(edges[i]))} THEN {i} ELSE {case} END"
    bucket = f"CASE WHEN v IS NULL THEN -1 ELSE {case} END"
    k = len(edges) + 2
    return f"""
    WITH a AS (
      SELECT {bucket} AS bucket, count(*) AS n_a
      FROM (SELECT {value_col} AS v FROM {source_a}) GROUP BY 1
    ),
    b AS (
      SELECT {bucket} AS bucket, count(*) AS n_b
      FROM (SELECT {value_col} AS v FROM {source_b}) GROUP BY 1
    ),
    na AS (SELECT CAST(coalesce(sum(n_a), 0) AS BIGINT) AS t FROM a),
    nb AS (SELECT CAST(coalesce(sum(n_b), 0) AS BIGINT) AS t FROM b),
    j AS (
      SELECT coalesce(a.bucket, b.bucket) AS bucket,
             CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
             CAST(coalesce(n_b, 0) AS BIGINT) AS n_b
      FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
    )
    SELECT bucket, n_a, n_b,
           {_floor_round_sql(f"(n_a + 0.5) / (na.t + 0.5 * {k})", round_to)} AS pa,
           {_floor_round_sql(f"(n_b + 0.5) / (nb.t + 0.5 * {k})", round_to)} AS pb,
           {_floor_round_sql(f'''((n_a + 0.5) / (na.t + 0.5 * {k}) - (n_b + 0.5) / (nb.t + 0.5 * {k}))
                 * {_det_ln_sql(f"((n_a + 0.5) / (na.t + 0.5 * {k})) / ((n_b + 0.5) / (nb.t + 0.5 * {k}))")}''', round_to)} AS psi_term
    FROM j, na, nb
    """


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram / ECE inputs — the calibration audit every
    scored gate should publish before its threshold is trusted: scores in
    [0, 1] bucket into ``n_bins`` equal-width bins, each reporting its
    count, mean score (predicted rate), and empirical positive rate. A
    calibrated scorer has mean_score ≈ pos_rate per bin; ECE is the
    n-weighted |difference| over the returned frame.

    Exactness: the bin key is ``floor(score·n)`` on doubles both engines
    compute identically (scorers here are all-arithmetic); the mean is an
    integer-scaled BIGINT sum unscaled once (order-free exact); the
    positive rate is one division of exact integer counts. One map-side
    aggregate — at 100 TB this is a single pass with ``n_bins`` output
    rows."""
    s = F.col(score_col).cast("double")
    bin_ = F.least(
        F.floor(s * F.lit(float(n_bins))).cast("int"), F.lit(n_bins - 1)
    )
    y = F.col(label_col).cast("long")
    agg = (
        df.select(bin_.alias("bin"), floor_round_int(s, 6).alias("__si"), y.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__si").alias("__ssum"),
            F.sum("__y").alias("__pos"),
        )
    )
    return agg.select(
        "bin",
        "n",
        floor_round(F.col("__ssum").cast("double") / F.lit(1e6) / F.col("n"), 6).alias(
            "mean_score"
        ),
        floor_round(F.col("__pos").cast("double") / F.col("n"), 6).alias("pos_rate"),
    )


def calibration_bins_sql(
    score_sql: str,
    label_sql: str,
    table_sql: str,
    n_bins: int = 10,
) -> str:
    """DuckDB replay of :func:`calibration_bins` over any (score, label)
    SQL expressions and source relation."""
    s = f"CAST({score_sql} AS DOUBLE)"
    return f"""
    WITH b AS (
      SELECT LEAST(CAST(floor({s} * CAST({float(n_bins)!r} AS DOUBLE)) AS INT),
                   {n_bins - 1}) AS bin,
             {floor_round_int_sql(s, 6)} AS si,
             CAST({label_sql} AS BIGINT) AS y
      FROM {table_sql}
    ),
    agg AS (
      SELECT bin, count(*) AS n, sum(si) AS ssum, sum(y) AS pos
      FROM b GROUP BY bin
    )
    SELECT bin, n,
           {floor_round_sql("CAST(ssum AS DOUBLE) / 1000000.0 / n", 6)} AS mean_score,
           {floor_round_sql("CAST(pos AS DOUBLE) / n", 6)} AS pos_rate
    FROM agg
    """
