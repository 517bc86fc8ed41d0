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
        F.round(F.sqrt(F.col("sse") / n), round_to).alias("rmse"),
        F.round(F.col("sae") / n, round_to).alias("mae"),
        F.round(
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
           round(sqrt(sse / n), {round_to}) AS rmse,
           round(sae / n, {round_to}) AS mae,
           round(CASE WHEN (syy - sy*sy/n) > 0
                      THEN 1.0 - sse / (syy - sy*sy/n) END, {round_to}) AS r2
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
        F.round(precision, round_to).alias("precision"),
        F.round(recall, round_to).alias("recall"),
        F.round(f1, round_to).alias("f1"),
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
           round(CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred ELSE 0.0 END, {round_to}) AS precision,
           round(tp * 1.0 / n_true, {round_to}) AS recall,
           round(CASE WHEN (CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred ELSE 0.0 END
                            + tp * 1.0 / n_true) > 0
                      THEN 2.0 * (CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred ELSE 0.0 END)
                               * (tp * 1.0 / n_true)
                           / ((CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred ELSE 0.0 END)
                              + tp * 1.0 / n_true)
                      ELSE 0.0 END, {round_to}) AS f1
    FROM base
    """
