"""Unit tests for functions/metrics.py (one-pass distributed evaluators).

Hand-computed expectations on tiny frames, plus the conventions that make the
outputs oracle-stable: zero-division classes get 0.0 (never NULL), R² is NULL
only for zero-variance labels, and a class absent from predictions still gets
an output row.
"""

import math

import pytest

from spark_ensemble_spark.functions.metrics import (
    classification_metrics,
    regression_metrics,
)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_regression_metrics_hand_values(spark):
    # labels 1,2,3,4 with predictions 1,2,2,6: errors 0,0,1,-2
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (3.0, 2.0), (4.0, 6.0)], "label double, prediction double"
    )
    r = _one(regression_metrics(df))
    assert r.n == 4
    assert r.rmse == pytest.approx(math.sqrt(5 / 4), abs=1e-6)
    assert r.mae == pytest.approx(3 / 4, abs=1e-6)
    # sst = sum(y^2) - (sum y)^2 / n = 30 - 25 = 5; sse = 5 -> r2 = 0
    assert r.r2 == pytest.approx(0.0, abs=1e-6)


def test_regression_metrics_perfect_and_constant_label(spark):
    perfect = spark.createDataFrame(
        [(1.0, 1.0), (5.0, 5.0)], "label double, prediction double"
    )
    r = _one(regression_metrics(perfect))
    assert r.rmse == 0.0 and r.mae == 0.0 and r.r2 == 1.0
    # zero-variance label: r2 undefined -> NULL, rmse still real
    const = spark.createDataFrame(
        [(2.0, 1.0), (2.0, 3.0)], "label double, prediction double"
    )
    r = _one(regression_metrics(const))
    assert r.r2 is None
    assert r.rmse == pytest.approx(1.0, abs=1e-6)


def test_classification_metrics_hand_values(spark):
    # y:    0 0 0 1 1 2
    # pred: 0 1 0 1 1 0   (class 2 never predicted)
    pairs = [(0, 0), (0, 1), (0, 0), (1, 1), (1, 1), (2, 0)]
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in pairs], "label double, prediction double"
    )
    rows = {r.label: r for r in classification_metrics(df).collect()}
    assert set(rows) == {0.0, 1.0, 2.0}
    r0 = rows[0.0]
    assert (r0.support, r0.tp) == (3, 2)
    assert r0.precision == pytest.approx(2 / 3, abs=1e-6)  # predicted 0 thrice
    assert r0.recall == pytest.approx(2 / 3, abs=1e-6)
    r1 = rows[1.0]
    assert (r1.support, r1.tp) == (2, 2)
    assert r1.precision == pytest.approx(2 / 3, abs=1e-6)
    assert r1.recall == 1.0
    # never-predicted class: row exists, zero-division convention -> 0.0
    r2_ = rows[2.0]
    assert (r2_.support, r2_.tp) == (1, 0)
    assert r2_.precision == 0.0 and r2_.recall == 0.0 and r2_.f1 == 0.0


def test_classification_metrics_accuracy_identity(spark):
    # sum(tp) / sum(support) must equal plain accuracy
    pairs = [(0, 0), (0, 1), (1, 1), (1, 1), (2, 0), (2, 2)]
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in pairs], "label double, prediction double"
    )
    rows = classification_metrics(df).collect()
    acc = sum(r.tp for r in rows) / sum(r.support for r in rows)
    assert acc == pytest.approx(4 / 6, abs=1e-9)


def test_psi_detects_shift_and_handles_empty_buckets(spark):
    """Identical snapshots → PSI ≈ 0; a shifted snapshot → large PSI; a
    bucket empty on one side is smoothed, never ±inf; NULLs surface in
    bucket -1."""
    from pyspark.sql import functions as F

    from spark_ensemble_spark.functions.metrics import (
        population_stability_index,
    )

    a = spark.createDataFrame([(float(i % 10),) for i in range(100)], "v double")
    edges = [2.0, 5.0, 8.0]
    same = population_stability_index(a, a, "v", edges)
    assert abs(sum(r.psi_term for r in same.collect())) < 1e-9
    shifted = a.select((F.col("v") + 6.0).alias("v"))
    drift = population_stability_index(a, shifted, "v", edges)
    terms = {r.bucket: r.psi_term for r in drift.collect()}
    assert sum(terms.values()) > 0.25  # the classic "drifted" bar
    assert all(abs(t) < float("inf") for t in terms.values())
    with_null = spark.createDataFrame([(1.0,), (None,)], "v double")
    nb = {r.bucket for r in
          population_stability_index(with_null, a, "v", edges).collect()}
    assert -1 in nb
