"""GBM parity tests, modeled on the reference suites
(``GBMRegressorSuite.scala``, ``GBMClassifierSuite.scala``, ``GBMLossSuite.scala``):
loss-gradient finite-difference checks, prefix improvement, early stopping,
all losses trainable, save/load round-trips.
"""

import random

import pytest
from pyspark.ml.evaluation import (
    MulticlassClassificationEvaluator,
    RegressionEvaluator,
)
from pyspark.ml.regression import DecisionTreeRegressor
from pyspark.sql import functions as F

from spark_ensemble_spark.boosting.losses import (
    AbsoluteLoss,
    BernoulliLoss,
    ExponentialLoss,
    HuberLoss,
    LogCoshLoss,
    QuantileLoss,
    ScaledLogCoshLoss,
    SquaredLoss,
)
from spark_ensemble_spark.classification.gbm import GBMClassificationModel, GBMClassifier
from spark_ensemble_spark.regression.gbm import GBMRegressionModel, GBMRegressor
from spark_ensemble_spark.sources.datasets import multiclass_dataset, regression_dataset


# ---- gradient checking (reference GBMLossSuite.scala:84-125) ---------------


@pytest.mark.parametrize(
    "loss",
    [
        SquaredLoss(),
        AbsoluteLoss(),
        LogCoshLoss(),
        ScaledLogCoshLoss(0.7),
        HuberLoss(0.8),
        QuantileLoss(0.3),
        ExponentialLoss(),
        BernoulliLoss(),
    ],
    ids=lambda l: type(l).__name__,
)
def test_gradient_finite_difference(loss):
    rng = random.Random(42)
    eps = 1e-6
    checked = 0
    for _ in range(500):
        y = rng.gauss(0, 1)
        p = rng.gauss(0, 1)
        if isinstance(loss, (ExponentialLoss, BernoulliLoss)):
            y = 1.0 if y > 0 else -1.0  # encoded margin labels
        # skip non-differentiable kinks
        if isinstance(loss, (AbsoluteLoss, QuantileLoss)) and abs(y - p) < 1e-4:
            continue
        if isinstance(loss, HuberLoss) and abs(abs(y - p) - loss.delta) < 1e-4:
            continue
        if isinstance(loss, ScaledLogCoshLoss) and abs(y - p) < 1e-4:
            continue
        num = (loss.loss_py(y, p + eps) - loss.loss_py(y, p - eps)) / (2 * eps)
        ana = loss.gradient_py(y, p)
        assert num == pytest.approx(ana, abs=1e-4), f"y={y} p={p}"
        if loss.has_hessian:
            numh = (loss.gradient_py(y, p + eps) - loss.gradient_py(y, p - eps)) / (
                2 * eps
            )
            assert numh == pytest.approx(loss.hessian_py(y, p), abs=1e-4)
        checked += 1
    assert checked > 400


# ---- estimator behavior ----------------------------------------------------


@pytest.fixture(scope="module")
def reg_splits(spark, sf_dir):
    train, test = regression_dataset(spark, sf_dir).randomSplit([0.7, 0.3], seed=0)
    return train.cache(), test.cache()


@pytest.fixture(scope="module")
def clf_splits(spark, sf_dir):
    train, test = multiclass_dataset(spark, sf_dir).randomSplit([0.7, 0.3], seed=0)
    return train.cache(), test.cache()


def test_gbm_regressor_prefix_improvement(reg_splits):
    """Truncated-prefix models improve train rmse monotonically for squared
    loss at small learning rate (reference GBMRegressorSuite.scala:126-164)."""
    train, _ = reg_splits
    model = GBMRegressor(
        baseLearner=DecisionTreeRegressor(maxDepth=5),
        numBaseLearners=4,
        learningRate=0.5,
        optimizedWeights=True,
    ).fit(train)
    ev = RegressionEvaluator(metricName="rmse")
    rmses = []
    for k in range(1, model.numModels + 1):
        prefix = GBMRegressionModel(
            model.weights[:k],
            model.subspaces[:k],
            model.models[:k],
            model.init,
            model.numFeatures,
        )
        rmses.append(ev.evaluate(prefix.transform(train)))
    improving = sum(1 for a, b in zip(rmses, rmses[1:]) if b <= a + 1e-9)
    assert improving == len(rmses) - 1, rmses


def test_gbm_regressor_beats_single_tree(reg_splits):
    train, test = reg_splits
    base = DecisionTreeRegressor(maxDepth=5)
    model = GBMRegressor(
        baseLearner=base, numBaseLearners=8, learningRate=0.3
    ).fit(train)
    ev = RegressionEvaluator(metricName="rmse")
    gbm_rmse = ev.evaluate(model.transform(test))
    single_rmse = ev.evaluate(base.fit(train).transform(test))
    assert gbm_rmse < single_rmse * 1.02


@pytest.mark.parametrize(
    "loss", ["squared", "absolute", "huber", "quantile", "logcosh", "scaledlogcosh"]
)
@pytest.mark.parametrize("updates", ["gradient", "newton"])
def test_gbm_regressor_losses_train(reg_splits, loss, updates):
    train, test = reg_splits
    model = GBMRegressor(
        baseLearner=DecisionTreeRegressor(maxDepth=3),
        numBaseLearners=2,
        loss=loss,
        updates=updates,
        optimizedWeights=False,
        learningRate=0.5,
    ).fit(train)
    assert model.numModels == 2
    assert model.transform(test).select("prediction").first()[0] is not None


def test_gbm_early_stopping(reg_splits):
    train, _ = reg_splits
    with_val = train.withColumn("val", F.rand(seed=5) > 0.8)
    model = GBMRegressor(
        baseLearner=DecisionTreeRegressor(maxDepth=2),
        numBaseLearners=15,
        learningRate=1.0,
        validationIndicatorCol="val",
        validationTol=0.05,
        numRounds=1,
        optimizedWeights=False,
    ).fit(with_val)
    # depth-2 trees stall quickly; early stopping must truncate
    assert model.numModels < 15


def test_gbm_classifier_multiclass(clf_splits):
    train, test = clf_splits
    model = GBMClassifier(
        baseLearner=DecisionTreeRegressor(maxDepth=5),
        numBaseLearners=3,
        loss="logloss",
        parallelism=3,
        learningRate=0.5,
    ).fit(train)
    out = model.transform(test)
    ev = MulticlassClassificationEvaluator(metricName="accuracy")
    acc = ev.evaluate(out)
    assert acc > 0.45
    row = out.select("probability", "rawPrediction").first()
    assert sum(row.probability) == pytest.approx(1.0, abs=1e-9)
    assert len(row.rawPrediction) == model.numClasses


@pytest.mark.parametrize("loss", ["exponential", "bernoulli"])
def test_gbm_classifier_binary(clf_splits, loss, spark, sf_dir):
    binary = multiclass_dataset(spark, sf_dir).withColumn(
        "label", (F.col("label") >= 1).cast("double")
    )
    train, test = binary.randomSplit([0.7, 0.3], seed=0)
    model = GBMClassifier(
        baseLearner=DecisionTreeRegressor(maxDepth=5),
        numBaseLearners=3,
        loss=loss,
        updates="newton",
    ).fit(train)
    assert model.dim == 1
    out = model.transform(test)
    ev = MulticlassClassificationEvaluator(metricName="accuracy")
    assert ev.evaluate(out) > 0.6
    row = out.select("probability").first()
    assert sum(row.probability) == pytest.approx(1.0, abs=1e-9)


def test_gbm_regressor_save_load(reg_splits, tmp_path):
    train, test = reg_splits
    model = GBMRegressor(
        baseLearner=DecisionTreeRegressor(maxDepth=3),
        numBaseLearners=2,
        optimizedWeights=False,
    ).fit(train)
    p = str(tmp_path / "gbm_reg")
    model.save(p)
    loaded = GBMRegressionModel.load(p)
    assert loaded.weights == model.weights
    assert loaded.subspaces == model.subspaces
    assert (
        model.transform(test).select("prediction").collect()
        == loaded.transform(test).select("prediction").collect()
    )


def test_gbm_classifier_save_load(clf_splits, tmp_path):
    train, test = clf_splits
    model = GBMClassifier(
        baseLearner=DecisionTreeRegressor(maxDepth=3),
        numBaseLearners=2,
        loss="logloss",
        optimizedWeights=False,
    ).fit(train)
    p = str(tmp_path / "gbm_clf")
    model.save(p)
    loaded = GBMClassificationModel.load(p)
    assert loaded.weights == model.weights
    assert loaded.dim == model.dim
    assert loaded.initRaw == model.initRaw
    assert (
        model.transform(test).select("prediction").collect()
        == loaded.transform(test).select("prediction").collect()
    )


def test_gbm_classifier_early_stopping(clf_splits):
    train, _ = clf_splits
    with_val = train.withColumn("val", F.rand(seed=5) > 0.8)
    model = GBMClassifier(
        baseLearner=DecisionTreeRegressor(maxDepth=2),
        numBaseLearners=8,
        loss="logloss",
        learningRate=1.0,
        validationIndicatorCol="val",
        validationTol=0.05,
        numRounds=1,
        optimizedWeights=False,
        parallelism=3,
    ).fit(with_val)
    # depth-2 stumps stall fast on this task; validation must truncate
    assert model.numModels < 8
    assert len(model.weights) == model.numModels
