"""DummyRegressor / DummyClassifier parity tests.

Mirrors the reference's exact-statistics assertions
(``DummyRegressorSuite.scala:54-110``, ``DummyClassifierSuite.scala:54-96``).
"""

import math

import pytest
from pyspark.ml.linalg import Vectors

from spark_ensemble_spark import (
    DummyClassificationModel,
    DummyClassifier,
    DummyRegressionModel,
    DummyRegressor,
)


@pytest.fixture(scope="module")
def reg_df(spark):
    data = [(float(i), Vectors.dense([float(i), 1.0])) for i in range(1, 101)]
    return spark.createDataFrame(data, ["label", "features"]).cache()


@pytest.fixture(scope="module")
def clf_df(spark):
    data = [(0.0, Vectors.dense([1.0]))] * 60 + [(1.0, Vectors.dense([2.0]))] * 30 + [
        (2.0, Vectors.dense([3.0]))
    ] * 10
    return spark.createDataFrame(data, ["label", "features"]).cache()


def test_mean(reg_df):
    model = DummyRegressor(strategy="mean").fit(reg_df)
    assert model.prediction == pytest.approx(50.5)
    out = model.transform(reg_df)
    vals = [r.prediction for r in out.select("prediction").distinct().collect()]
    assert vals == [pytest.approx(50.5)]


def test_median_exact(reg_df):
    model = DummyRegressor(strategy="median", tol=0.0).fit(reg_df)
    assert model.prediction == pytest.approx(50.0)


def test_quantile_exact(reg_df):
    model = DummyRegressor(strategy="quantile", quantile=0.9, tol=0.0).fit(reg_df)
    assert model.prediction == pytest.approx(90.0)


def test_constant(reg_df):
    model = DummyRegressor(strategy="constant", constant=7.5).fit(reg_df)
    assert model.prediction == 7.5


def test_regressor_save_load(reg_df, tmp_path):
    model = DummyRegressor(strategy="mean").fit(reg_df)
    p = str(tmp_path / "dummy_reg")
    model.save(p)
    loaded = DummyRegressionModel.load(p)
    assert loaded.prediction == model.prediction
    orig = model.transform(reg_df).select("prediction").collect()
    re = loaded.transform(reg_df).select("prediction").collect()
    assert orig == re


def test_prior(clf_df):
    model = DummyClassifier(strategy="prior").fit(clf_df)
    assert model.numClasses == 3
    assert model.probability == pytest.approx([0.6, 0.3, 0.1])
    assert model.rawPrediction == pytest.approx([math.log(0.6), math.log(0.3), math.log(0.1)])
    out = model.transform(clf_df)
    row = out.select("prediction", "probability", "rawPrediction").first()
    assert row.prediction == 0.0
    assert list(row.probability) == pytest.approx([0.6, 0.3, 0.1])


def test_uniform(clf_df):
    model = DummyClassifier(strategy="uniform").fit(clf_df)
    assert model.probability == pytest.approx([1 / 3] * 3)
    assert model.transform(clf_df).select("prediction").first().prediction == 0.0


def test_constant_classifier(clf_df):
    model = DummyClassifier(strategy="constant", constant=2.0).fit(clf_df)
    assert model.transform(clf_df).select("prediction").first().prediction == 2.0


def test_classifier_save_load(clf_df, tmp_path):
    model = DummyClassifier(strategy="prior").fit(clf_df)
    p = str(tmp_path / "dummy_clf")
    model.save(p)
    loaded = DummyClassificationModel.load(p)
    assert loaded.probability == model.probability
    assert loaded.numClasses == model.numClasses


def test_bad_label_col(reg_df):
    with pytest.raises(ValueError, match="kek"):
        DummyRegressor(labelCol="kek").fit(reg_df)
