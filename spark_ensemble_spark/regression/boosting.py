"""BoostingRegressor — AdaBoost.R2 (Drucker 1997).

Semantic parity with
``/root/reference/core/src/main/scala/org/apache/spark/ml/regression/BoostingRegressor.scala:138-357``:
sequential reweighting by relative absolute error with loss ∈ {exponential,
linear, squared}; stops early when max error is 0 (perfect fit) or estimator
error >= 0.5 (the offending model is still kept, as the reference does);
prediction = weighted median (default) or weighted mean of base predictions.

DataFrame-native state: the evolving boosting weight is a column updated with
``withColumn`` each round (never an ``RDD.zip`` — SURVEY.md §2.4), persisted
and lineage-truncated via :class:`DFIterationCache`.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

from pyspark.ml.base import Estimator
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import (
    HasAggregationDepth,
    HasCheckpointInterval,
    HasSeed,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ensemble_spark.core.base import (
    EnsembleRegressionModel,
    PredictorParams,
    score_base_models,
)
from spark_ensemble_spark.core.instances import extract_instances, get_num_features
from spark_ensemble_spark.core.instrumentation import FitInstrumentation
from spark_ensemble_spark.core.params import (
    HasBaseLearner,
    HasNumBaseLearners,
    HasVotingStrategy,
)
from spark_ensemble_spark.core.persistence import (
    EnsembleReadWrite,
    load_ensemble,
    load_instance,
    load_metadata,
    save_ensemble,
    save_instance,
    save_metadata,
    set_params_from_metadata,
)
from spark_ensemble_spark.core.utils import (
    DFIterationCache,
    fit_base_learner,
    weighted_mean,
    weighted_median,
)

_LOSS_TYPES = ("exponential", "linear", "squared")
_VOTING = ("median", "mean")


def _loss_expr(loss_type: str, error):
    """Loss of the normalized error (``BoostingRegressorParams.loss``,
    ``BoostingRegressor.scala:97-106``)."""
    if loss_type == "exponential":
        return 1 - F.exp(-error)
    if loss_type == "linear":
        return error
    if loss_type == "squared":
        return error * error
    raise ValueError(f"bad loss type {loss_type}")


class _BoostingRegressorParams(
    PredictorParams,
    HasBaseLearner,
    HasNumBaseLearners,
    HasVotingStrategy,
    HasCheckpointInterval,
    HasSeed,
    # Reference API parity (BoostingParams.scala treeAggregate depth); no-op
    # under DataFrame aggregation (SURVEY.md §2.4).
    HasAggregationDepth,
):
    lossType: Param = Param(
        Params._dummy(),
        "lossType",
        f"boosting loss applied to the normalized error, one of {_LOSS_TYPES}",
        typeConverter=TypeConverters.toString,
    )

    def __init__(self) -> None:
        super().__init__()
        self._setDefault(
            lossType="exponential",
            votingStrategy="median",
            checkpointInterval=10,
            seed=17,
        )

    def getLossType(self) -> str:
        v = self.getOrDefault(self.lossType).lower()
        if v not in _LOSS_TYPES:
            raise ValueError(f"lossType must be one of {_LOSS_TYPES}, got {v}")
        return v

    def getVotingStrategy(self) -> str:
        v = self.getOrDefault(self.votingStrategy).lower()
        if v not in _VOTING:
            raise ValueError(f"votingStrategy must be one of {_VOTING}, got {v}")
        return v


class BoostingRegressor(Estimator, _BoostingRegressorParams, EnsembleReadWrite):
    def __init__(self, **kwargs) -> None:
        super().__init__()
        if "baseLearner" in kwargs:
            self.set(self.baseLearner, kwargs.pop("baseLearner"))
        self._set(**kwargs)

    def setParams(self, **kwargs) -> "BoostingRegressor":
        if "baseLearner" in kwargs:
            self.set(self.baseLearner, kwargs.pop("baseLearner"))
        self._set(**kwargs)
        return self

    def setBaseLearner(self, v) -> "BoostingRegressor":
        return self.setParams(baseLearner=v)

    def setNumBaseLearners(self, v: int) -> "BoostingRegressor":
        return self.setParams(numBaseLearners=v)

    def setLossType(self, v: str) -> "BoostingRegressor":
        return self.setParams(lossType=v)

    def setVotingStrategy(self, v: str) -> "BoostingRegressor":
        return self.setParams(votingStrategy=v)

    def setCheckpointInterval(self, v: int) -> "BoostingRegressor":
        return self.setParams(checkpointInterval=v)

    def setAggregationDepth(self, v: int) -> "BoostingRegressor":
        """Accepted for reference API parity; no-op under DataFrame aggs."""
        return self.setParams(aggregationDepth=v)

    def setWeightCol(self, v: str) -> "BoostingRegressor":
        return self.setParams(weightCol=v)

    def setLabelCol(self, v: str) -> "BoostingRegressor":
        return self.setParams(labelCol=v)

    def setFeaturesCol(self, v: str) -> "BoostingRegressor":
        return self.setParams(featuresCol=v)

    def _fit(self, df: DataFrame) -> "BoostingRegressionModel":
        self._validate_input(df, fitting=True)
        loss_type = self.getLossType()
        num_learners = self.getNumBaseLearners()

        instances = extract_instances(
            df, self.getLabelCol(), self.getFeaturesCol(), self._weight_col_or_none()
        ).withColumn("__bw", F.col("weight"))
        num_features = get_num_features(instances, "features")

        cache = DFIterationCache(self.getOrDefault(self.checkpointInterval))
        state = cache.update(instances)
        sum_weights = state.agg(F.sum("__bw")).first()[0] or 0.0

        instr = FitInstrumentation(self.uid, num_learners)
        models: List = []
        estimator_weights: List[float] = []
        stop_reason = "completed"
        try:
            i = 0
            while i < num_learners and sum_weights > 0:
                # Normalized per-round weights (reference :218-221).
                state = state.withColumn("__wnorm", F.col("__bw") / F.lit(sum_weights))
                model = fit_base_learner(
                    self.getBaseLearner(),
                    state,
                    "label",
                    "features",
                    "__pred",
                    weight_col="__wnorm",
                )
                scored = model.transform(
                    state, {model.getParam("predictionCol"): "__pred"}
                ).withColumn("__err", F.abs(F.col("label") - F.col("__pred")))
                scored = cache.update(scored)

                max_error = scored.agg(F.max("__err")).first()[0]
                if max_error == 0:
                    # Perfect fit: loss(0) = 0 → estimatorError 0 → beta 0 →
                    # weight 1.0, then stop (reference :236-239,253-254).
                    models.append(model)
                    estimator_weights.append(1.0)
                    instr.iteration(i, estimator_error=0.0, estimator_weight=1.0)
                    stop_reason = "perfect fit"
                    break

                scored = scored.withColumn(
                    "__loss", _loss_expr(loss_type, F.col("__err") / F.lit(max_error))
                )
                estimator_error = (
                    scored.agg(F.sum(F.col("__wnorm") * F.col("__loss"))).first()[0]
                    or 0.0
                )

                beta = (
                    estimator_error / (1 - estimator_error)
                    if estimator_error < 1.0
                    else 1e18  # degenerate: all-wrong round; weight → large negative
                )
                estimator_weight = 1.0 if beta == 0.0 else math.log(1.0 / beta)
                models.append(model)
                estimator_weights.append(estimator_weight)
                instr.iteration(
                    i,
                    estimator_error=estimator_error,
                    estimator_weight=estimator_weight,
                    sum_weights=sum_weights,
                )

                if estimator_error >= 0.5:
                    # Keep the model (matching the reference's net behavior at
                    # :251-269) but stop boosting.
                    stop_reason = "estimator_error >= 0.5"
                    break

                state = scored.withColumn(
                    "__bw",
                    F.col("__wnorm") * F.pow(F.lit(beta), 1 - F.col("__loss")),
                ).select("label", "weight", "features", "__bw")
                state = cache.update(state)
                sum_weights = state.agg(F.sum("__bw")).first()[0] or 0.0
                i += 1
        finally:
            cache.close()
        instr.done(len(models), stop_reason)

        model = BoostingRegressionModel(
            weights=estimator_weights, models=models, num_features=num_features
        )
        model._resetUid(self.uid + "_model")
        self._copyValues(model)
        return model

    def _save_impl(self, path: str) -> None:
        save_metadata(self, path)
        save_instance(self.getBaseLearner(), f"{path}/learner")

    @classmethod
    def _load_impl(cls, path: str) -> "BoostingRegressor":
        meta = load_metadata(path)
        inst = cls()
        set_params_from_metadata(inst, meta)
        inst.set(inst.baseLearner, load_instance(f"{path}/learner"))
        return inst


class BoostingRegressionModel(
    EnsembleRegressionModel, _BoostingRegressorParams, EnsembleReadWrite
):
    def __init__(
        self,
        weights: Optional[Sequence[float]] = None,
        models: Optional[Sequence] = None,
        num_features: int = 0,
    ) -> None:
        super().__init__()
        self.weights = [float(w) for w in (weights or [])]
        self.models = list(models or [])
        self.numFeatures = int(num_features)

    @property
    def numModels(self) -> int:
        return len(self.models)

    def _prediction_setup(self, df: DataFrame):
        df, outs, tmp = score_base_models(
            df,
            self.getFeaturesCol(),
            self.models,
            None,
            self.numFeatures,
            prefix="__boost_",
        )
        pred_cols = [o["prediction"] for o in outs]
        if self.getVotingStrategy() == "median":
            pred = weighted_median(pred_cols, self.weights)
        else:
            pred = weighted_mean(pred_cols, self.weights)
        return df, pred, tmp

    def copy(self, extra=None) -> "BoostingRegressionModel":
        copied = BoostingRegressionModel(self.weights, self.models, self.numFeatures)
        copied._resetUid(self.uid)
        return self._copyValues(copied, extra)

    def _save_impl(self, path: str) -> None:
        save_ensemble(
            self,
            path,
            self.models,
            {"weights": self.weights, "numFeatures": self.numFeatures},
        )

    @classmethod
    def _load_impl(cls, path: str) -> "BoostingRegressionModel":
        metadata, data, models = load_ensemble(path)
        inst = cls(data["weights"], models, data["numFeatures"])
        inst._resetUid(metadata["uid"])
        set_params_from_metadata(inst, metadata)
        return inst
