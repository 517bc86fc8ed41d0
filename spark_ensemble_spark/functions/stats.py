"""Distributed statistics helpers (the reference's ``Utils.weightedMedian``
generalized from model combining to data columns)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def weighted_median_of(df: DataFrame, value_col: str, weight_col: str) -> DataFrame:
    """Global weighted median: first value whose running weight reaches half
    the total (``ensemble/Utils.scala:26-40`` semantics, expressed as a window
    program so any SQL engine computes the identical answer).

    One sort-shuffle; for grouped medians partition the windows by the group
    key instead of using a global order.
    """
    w_order = Window.orderBy(F.col("v"), F.col("w"))
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    with_cum = df.select(
        F.col(value_col).alias("v"), F.col(weight_col).cast("double").alias("w")
    ).withColumn("cum", F.sum("w").over(w_order.rowsBetween(Window.unboundedPreceding, 0))).withColumn(
        "total", F.sum("w").over(w_all)
    )
    return (
        with_cum.filter(F.col("cum") >= 0.5 * F.col("total"))
        .orderBy("v")
        .limit(1)
        .select(F.col("v").alias("weighted_median"))
    )
