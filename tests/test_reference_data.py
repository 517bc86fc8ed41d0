"""Reference-DATASET quality parity (VERDICT r9 missing #4 / next #6).

BASELINE.md's quality rows are asserted by the reference on ITS OWN
datasets (``/root/reference/data/*.svm``); the default suite asserts the
same PROPERTIES on synthetic fixtures.  This module closes the loop: load
the actual reference libsvm files through ``read_libsvm`` and assert the
BASELINE.md rows verbatim —

* letter (14,999 rows, 16 features, 26 classes, labels shifted 1-26→0-25
  exactly as ``BaggingClassifierSuite.scala:50-54``): bagging accuracy
  strictly greater than a single DecisionTree (suite :48-78) AND strictly
  greater than its best base member (:80-112);
* cpusmall (8,191 rows, 12 features, regression): GBM rmse strictly lower
  than a single DecisionTree AND lower than Spark's own ``GBTRegressor``
  (``GBMRegressorSuite.scala:51-76``).

Opt-in (several minutes of tree fitting — too slow for the default lane):

    SPARK_GRAFT_REFERENCE_DATA=1 python -m pytest tests/test_reference_data.py -q
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_REFERENCE_DATA") != "1",
    reason="reference-data quality lane is opt-in (SPARK_GRAFT_REFERENCE_DATA=1)",
)

_LETTER = "/root/reference/data/letter/letter.svm"
_CPUSMALL = "/root/reference/data/cpusmall/cpusmall.svm"


@pytest.fixture(scope="module")
def letter_splits(spark):
    from spark_ensemble_spark.sources.io import read_libsvm

    if not os.path.exists(_LETTER):
        pytest.skip("reference letter.svm not present")
    df = read_libsvm(spark, _LETTER, num_features=16).withColumn(
        "label", F.col("label") - 1  # 1-26 → 0-25, BaggingClassifierSuite:50-54
    )
    train, test = df.randomSplit([0.8, 0.2], seed=0)
    return train.cache(), test.cache()


@pytest.fixture(scope="module")
def cpusmall_splits(spark):
    from spark_ensemble_spark.sources.io import read_libsvm

    if not os.path.exists(_CPUSMALL):
        pytest.skip("reference cpusmall.svm not present")
    df = read_libsvm(spark, _CPUSMALL, num_features=12)
    train, test = df.randomSplit([0.7, 0.3], seed=0)
    return train.cache(), test.cache()


def test_bagging_beats_tree_and_best_member_on_letter(letter_splits):
    """BASELINE.md rows 1-2 on the reference's own letter data: 20 bagged
    trees (subsample 0.8 w/ replacement, subspace 0.8) beat both a single
    DecisionTree and the ensemble's best individual member."""
    from pyspark.ml.classification import DecisionTreeClassifier
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator

    from spark_ensemble_spark.classification.bagging import BaggingClassifier

    train, test = letter_splits
    base = DecisionTreeClassifier(maxDepth=10)
    ev = MulticlassClassificationEvaluator(metricName="accuracy")
    model = BaggingClassifier(
        baseLearner=base,
        numBaseLearners=20,
        subsampleRatio=0.8,
        replacement=True,
        subspaceRatio=0.8,
        parallelism=8,
        seed=0,
    ).fit(train)
    ens_acc = ev.evaluate(model.transform(test))
    tree_acc = ev.evaluate(base.fit(train).transform(test))
    # member scoring through the model's own chained-JVM-transform path —
    # one pass, no per-member collect (the test_bagging suite idiom)
    from spark_ensemble_spark.core.base import score_base_models

    scored, outs, _ = score_base_models(
        test,
        model.getFeaturesCol(),
        model.models,
        model.subspaces,
        model.numFeatures,
        prefix="__m_",
    )
    row = scored.agg(
        *[
            F.avg((F.col(o["prediction"]) == F.col("label")).cast("double")).alias(
                f"acc{i}"
            )
            for i, o in enumerate(outs)
        ]
    ).first()
    best_member = max(row[f"acc{i}"] for i in range(len(outs)))
    assert ens_acc > tree_acc, (ens_acc, tree_acc)
    assert ens_acc > best_member, (ens_acc, best_member)


def test_gbm_beats_tree_and_gbt_on_cpusmall(cpusmall_splits):
    """BASELINE.md row 4 on the reference's own cpusmall data: 10-round GBM
    rmse strictly below a single DecisionTree AND below Spark MLlib's
    GBTRegressor at the same round count."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.regression import DecisionTreeRegressor, GBTRegressor

    from spark_ensemble_spark.regression.gbm import GBMRegressor

    train, test = cpusmall_splits
    ev = RegressionEvaluator(metricName="rmse")
    gbm = GBMRegressor(
        baseLearner=DecisionTreeRegressor(maxDepth=5),
        numBaseLearners=10,
    ).fit(train)
    gbm_rmse = ev.evaluate(gbm.transform(test))
    tree_rmse = ev.evaluate(
        DecisionTreeRegressor(maxDepth=5).fit(train).transform(test)
    )
    gbt_rmse = ev.evaluate(
        GBTRegressor(maxIter=10, maxDepth=5, seed=0).fit(train).transform(test)
    )
    assert gbm_rmse < tree_rmse, (gbm_rmse, tree_rmse)
    assert gbm_rmse < gbt_rmse, (gbm_rmse, gbt_rmse)
