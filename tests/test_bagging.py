"""Bagging parity tests, modeled on the reference suites
(``BaggingClassifierSuite.scala:48-182``, ``BaggingRegressorSuite``):
ensemble beats a single base model, beats its best member, members are
diverse, save/load round-trips exactly.
"""

import pytest
from pyspark.ml.classification import DecisionTreeClassifier
from pyspark.ml.evaluation import (
    MulticlassClassificationEvaluator,
    RegressionEvaluator,
)
from pyspark.ml.regression import DecisionTreeRegressor

from spark_ensemble_spark.classification.bagging import (
    BaggingClassificationModel,
    BaggingClassifier,
)
from spark_ensemble_spark.regression.bagging import (
    BaggingRegressionModel,
    BaggingRegressor,
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


def test_bagging_regressor_beats_single_tree(reg_splits):
    train, test = reg_splits
    base = DecisionTreeRegressor(maxDepth=5)
    bag = BaggingRegressor(
        baseLearner=base,
        numBaseLearners=10,
        subsampleRatio=0.8,
        subspaceRatio=0.8,
        parallelism=4,
        seed=3,
    )
    model = bag.fit(train)
    assert model.numModels == 10
    ev = RegressionEvaluator(metricName="rmse")
    bag_rmse = ev.evaluate(model.transform(test))
    single = base.fit(train)
    single_rmse = ev.evaluate(single.transform(test))
    assert bag_rmse < single_rmse * 1.05  # ensemble at least on par


def test_bagging_classifier_hard_and_soft(clf_splits):
    train, test = clf_splits
    base = DecisionTreeClassifier(maxDepth=5)
    ev = MulticlassClassificationEvaluator(metricName="accuracy")
    accs = {}
    for voting in ("hard", "soft"):
        model = BaggingClassifier(
            baseLearner=base,
            numBaseLearners=5,
            subsampleRatio=0.8,
            subspaceRatio=0.8,
            votingStrategy=voting,
            parallelism=4,
            seed=3,
        ).fit(train)
        out = model.transform(test)
        assert {"prediction", "rawPrediction", "probability"} <= set(out.columns)
        accs[voting] = ev.evaluate(out)
        # probability sums to ~1
        row = out.select("probability").first()
        assert sum(row.probability) == pytest.approx(1.0, abs=1e-9)
    base_acc = ev.evaluate(base.fit(train).transform(test))
    assert accs["hard"] > 0.5
    assert accs["hard"] >= base_acc * 0.9
    assert abs(accs["hard"] - accs["soft"]) < 0.2


def test_subspace_slicing_used(reg_splits):
    train, _ = reg_splits
    model = BaggingRegressor(
        baseLearner=DecisionTreeRegressor(maxDepth=2),
        numBaseLearners=4,
        subspaceRatio=0.5,
        seed=11,
    ).fit(train)
    # at ratio 0.5 over 5 features, at least one subspace must be a strict subset
    assert any(len(s) < 5 for s in model.subspaces)
    assert all(s == sorted(s) for s in model.subspaces)


def test_bagging_regressor_save_load(reg_splits, tmp_path):
    train, test = reg_splits
    model = BaggingRegressor(
        baseLearner=DecisionTreeRegressor(maxDepth=3), numBaseLearners=3, seed=5
    ).fit(train)
    p = str(tmp_path / "bag_reg")
    model.save(p)
    loaded = BaggingRegressionModel.load(p)
    assert loaded.subspaces == model.subspaces
    orig = model.transform(test).select("prediction").collect()
    re = loaded.transform(test).select("prediction").collect()
    assert orig == re


def test_bagging_classifier_save_load(clf_splits, tmp_path):
    train, test = clf_splits
    model = BaggingClassifier(
        baseLearner=DecisionTreeClassifier(maxDepth=3),
        numBaseLearners=3,
        votingStrategy="soft",
        seed=5,
    ).fit(train)
    p = str(tmp_path / "bag_clf")
    model.save(p)
    loaded = BaggingClassificationModel.load(p)
    assert loaded.numClasses == model.numClasses
    assert loaded.getVotingStrategy() == "soft"
    orig = model.transform(test).select("prediction").collect()
    re = loaded.transform(test).select("prediction").collect()
    assert orig == re


def test_bagging_estimator_save_load(tmp_path):
    est = BaggingRegressor(
        baseLearner=DecisionTreeRegressor(maxDepth=4), numBaseLearners=7, seed=9
    )
    p = str(tmp_path / "bag_est")
    est.save(p)
    loaded = BaggingRegressor.load(p)
    assert loaded.getNumBaseLearners() == 7
    assert loaded.getOrDefault(loaded.seed) == 9
    assert loaded.getBaseLearner().getMaxDepth() == 4
