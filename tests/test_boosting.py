"""Boosting parity tests, modeled on the reference suites
(``BoostingRegressorSuite.scala``, ``BoostingClassifierSuite.scala``):
prefix-model improvement, median≈mean voting, SAMME≈SAMME.R, degenerate
constant-label truncation, save/load round-trips.
"""

import pytest
from pyspark.ml.classification import DecisionTreeClassifier
from pyspark.ml.evaluation import (
    MulticlassClassificationEvaluator,
    RegressionEvaluator,
)
from pyspark.ml.linalg import Vectors
from pyspark.ml.regression import DecisionTreeRegressor

from spark_ensemble_spark.classification.boosting import (
    BoostingClassificationModel,
    BoostingClassifier,
)
from spark_ensemble_spark.regression.boosting import (
    BoostingRegressionModel,
    BoostingRegressor,
)
from spark_ensemble_spark.sources.datasets import multiclass_dataset, regression_dataset


@pytest.fixture(scope="module")
def reg_splits(spark, sf_dir):
    train, test = regression_dataset(spark, sf_dir).randomSplit([0.7, 0.3], seed=0)
    return train.cache(), test.cache()


@pytest.fixture(scope="module")
def clf_splits(spark, sf_dir):
    train, test = multiclass_dataset(spark, sf_dir).randomSplit([0.7, 0.3], seed=0)
    return train.cache(), test.cache()


def test_boosting_regressor_beats_single_tree(reg_splits):
    train, test = reg_splits
    base = DecisionTreeRegressor(maxDepth=5)
    model = BoostingRegressor(baseLearner=base, numBaseLearners=6).fit(train)
    assert 1 <= model.numModels <= 6
    ev = RegressionEvaluator(metricName="rmse")
    boost_rmse = ev.evaluate(model.transform(test))
    single_rmse = ev.evaluate(base.fit(train).transform(test))
    assert boost_rmse < single_rmse * 1.05


def test_median_vs_mean_voting(reg_splits):
    train, test = reg_splits
    base = DecisionTreeRegressor(maxDepth=8)
    model = BoostingRegressor(baseLearner=base, numBaseLearners=5).fit(train)
    ev = RegressionEvaluator(metricName="rmse")
    rmse_median = ev.evaluate(model.transform(test))
    model_mean = model.copy()
    model_mean.setParams(votingStrategy="mean")
    rmse_mean = ev.evaluate(model_mean.transform(test))
    # reference asserts ±0.1 absolute on cpusmall; our scale differs, use relative
    assert rmse_median == pytest.approx(rmse_mean, rel=0.25)


def test_constant_label_truncates(spark):
    """FIXTURES.md F6 / reference maxErrorIsNull (:154-167): constant labels
    reach zero error and stop after one model with rmse 0."""
    df = spark.createDataFrame(
        [(1.0, Vectors.dense([1.0, 1.0]))] * 100, ["label", "features"]
    )
    model = BoostingRegressor(
        baseLearner=DecisionTreeRegressor(), numBaseLearners=20
    ).fit(df)
    assert model.numModels < 20
    out = model.transform(df)
    ev = RegressionEvaluator(metricName="rmse")
    assert ev.evaluate(out) == pytest.approx(0.0, abs=1e-12)


def test_samme_vs_samme_r(clf_splits):
    train, test = clf_splits
    base = DecisionTreeClassifier(maxDepth=8)
    ev = MulticlassClassificationEvaluator(metricName="accuracy")
    accs = {}
    for algo in ("real", "discrete"):
        model = BoostingClassifier(
            baseLearner=base, numBaseLearners=5, algorithm=algo
        ).fit(train)
        out = model.transform(test)
        accs[algo] = ev.evaluate(out)
        row = out.select("probability", "rawPrediction").first()
        assert sum(row.probability) == pytest.approx(1.0, abs=1e-9)
        if algo == "real":
            # SAMME.R raw predictions sum to ~0 per row (reference property
            # test, BoostingClassifierSuite.scala:126-141)
            assert sum(row.rawPrediction) == pytest.approx(0.0, abs=1e-6)
    assert accs["real"] > 0.5 and accs["discrete"] > 0.5
    assert abs(accs["real"] - accs["discrete"]) < 0.1


def test_boosting_regressor_save_load(reg_splits, tmp_path):
    train, test = reg_splits
    model = BoostingRegressor(
        baseLearner=DecisionTreeRegressor(maxDepth=3), numBaseLearners=3
    ).fit(train)
    p = str(tmp_path / "boost_reg")
    model.save(p)
    loaded = BoostingRegressionModel.load(p)
    assert loaded.weights == model.weights
    assert (
        model.transform(test).select("prediction").collect()
        == loaded.transform(test).select("prediction").collect()
    )


def test_boosting_classifier_save_load(clf_splits, tmp_path):
    train, test = clf_splits
    model = BoostingClassifier(
        baseLearner=DecisionTreeClassifier(maxDepth=3),
        numBaseLearners=3,
        algorithm="discrete",
    ).fit(train)
    p = str(tmp_path / "boost_clf")
    model.save(p)
    loaded = BoostingClassificationModel.load(p)
    assert loaded.weights == model.weights
    assert loaded.getAlgorithm() == "discrete"
    assert (
        model.transform(test).select("prediction").collect()
        == loaded.transform(test).select("prediction").collect()
    )


def test_bad_label_col(reg_splits):
    train, _ = reg_splits
    with pytest.raises(ValueError, match="kek"):
        BoostingRegressor(
            baseLearner=DecisionTreeRegressor(), labelCol="kek"
        ).fit(train)


def test_fit_instrumentation_emits_iteration_lines(reg_splits, caplog):
    import logging

    from spark_ensemble_spark import DummyRegressor
    from spark_ensemble_spark.core.instrumentation import LOGGER_NAME

    train, _ = reg_splits
    with caplog.at_level(logging.INFO, logger=LOGGER_NAME):
        BoostingRegressor(
            baseLearner=DummyRegressor(strategy="mean"), numBaseLearners=3
        ).fit(train)
    lines = [r.message for r in caplog.records if "iter=" in r.message]
    assert lines, "expected per-iteration instrumentation lines"
    assert any("estimator_error=" in m for m in lines)
    assert any("fit" in r.message and "model(s)" in r.message for r in caplog.records)
