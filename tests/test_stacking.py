"""Stacking parity tests (reference ``StackingRegressorSuite``/
``StackingClassifierSuite``): ensemble at least on par with members, all
stackMethods, save/load round-trips."""

import pytest
from pyspark.ml.classification import DecisionTreeClassifier, LogisticRegression
from pyspark.ml.evaluation import (
    MulticlassClassificationEvaluator,
    RegressionEvaluator,
)
from pyspark.ml.regression import DecisionTreeRegressor, LinearRegression

from spark_ensemble_spark.classification.stacking import (
    StackingClassificationModel,
    StackingClassifier,
)
from spark_ensemble_spark.regression.stacking import (
    StackingRegressionModel,
    StackingRegressor,
)
from spark_ensemble_spark.sources.datasets import multiclass_dataset, regression_dataset


@pytest.fixture(scope="module")
def reg_splits(spark, sf_dir):
    train, test = regression_dataset(spark, sf_dir).randomSplit([0.8, 0.2], seed=0)
    return train.cache(), test.cache()


@pytest.fixture(scope="module")
def clf_splits(spark, sf_dir):
    train, test = multiclass_dataset(spark, sf_dir).randomSplit([0.8, 0.2], seed=0)
    return train.cache(), test.cache()


def test_stacking_regressor(reg_splits):
    train, test = reg_splits
    learners = [
        DecisionTreeRegressor(maxDepth=3),
        DecisionTreeRegressor(maxDepth=5),
        LinearRegression(regParam=0.1),
    ]
    model = StackingRegressor(
        baseLearners=learners, stacker=LinearRegression(), parallelism=3
    ).fit(train)
    assert model.numModels == 3
    ev = RegressionEvaluator(metricName="rmse")
    stack_rmse = ev.evaluate(model.transform(test))
    member_rmses = [
        ev.evaluate(l.fit(train).transform(test)) for l in learners
    ]
    # base learners are fitted on the full training set (reference behavior),
    # so the stacker favors whichever member looks best in-sample; assert
    # on-par-with-members rather than strictly-better
    assert stack_rmse <= min(member_rmses) * 1.10


@pytest.mark.parametrize("method", ["class", "raw", "proba"])
def test_stacking_classifier_methods(clf_splits, method):
    train, test = clf_splits
    learners = [
        DecisionTreeClassifier(maxDepth=5),
        DecisionTreeClassifier(maxDepth=10),
    ]
    model = StackingClassifier(
        baseLearners=learners,
        stacker=LogisticRegression(maxIter=20),
        stackMethod=method,
        parallelism=2,
    ).fit(train)
    out = model.transform(test)
    assert "prediction" in out.columns
    ev = MulticlassClassificationEvaluator(metricName="accuracy")
    assert ev.evaluate(out) > 0.5


def test_stacking_regressor_save_load(reg_splits, tmp_path):
    train, test = reg_splits
    model = StackingRegressor(
        baseLearners=[DecisionTreeRegressor(maxDepth=3), LinearRegression()],
        stacker=LinearRegression(),
    ).fit(train)
    p = str(tmp_path / "stack_reg")
    model.save(p)
    loaded = StackingRegressionModel.load(p)
    assert (
        model.transform(test).select("prediction").collect()
        == loaded.transform(test).select("prediction").collect()
    )


def test_stacking_classifier_save_load(clf_splits, tmp_path):
    train, test = clf_splits
    model = StackingClassifier(
        baseLearners=[DecisionTreeClassifier(maxDepth=3)],
        stacker=LogisticRegression(maxIter=10),
        stackMethod="proba",
    ).fit(train)
    p = str(tmp_path / "stack_clf")
    model.save(p)
    loaded = StackingClassificationModel.load(p)
    assert loaded.getStackMethod() == "proba"
    assert (
        model.transform(test).select("prediction").collect()
        == loaded.transform(test).select("prediction").collect()
    )


def test_stacking_estimator_save_load(tmp_path):
    est = StackingRegressor(
        baseLearners=[DecisionTreeRegressor(maxDepth=2), LinearRegression()],
        stacker=LinearRegression(regParam=0.5),
        parallelism=2,
    )
    p = str(tmp_path / "stack_est")
    est.save(p)
    loaded = StackingRegressor.load(p)
    assert len(loaded.getBaseLearners()) == 2
    assert loaded.getStacker().getRegParam() == 0.5
