"""BoostingClassifier — multi-class AdaBoost: SAMME (discrete) and SAMME.R (real).

Semantic parity with
``/root/reference/core/src/main/scala/org/apache/spark/ml/classification/BoostingClassifier.scala:105-382``:

* real (SAMME.R): per-round weight update
  ``w ← w · exp(−(K−1)/K · Σ_c code_c · log(max(p_c, ε)))`` with
  ``code_c = 1`` if c is the label else ``−1/(K−1)``; every round weight 1.0;
  decision = Σ over models of ``(K−1)(log p_c − mean_c log p)``.
* discrete (SAMME): ``β = err/((1−err)(K−1))``, model weight ``ln(1/β)``,
  ``w ← w · (1/β)^error``; a round with error ≥ 1 − 1/K is discarded and
  boosting stops; decision = Σ wᵢ (one-hot ± 1/(K−1)).
* probability = softmax(raw / (K−1)).

All per-row math is array-column expressions over the base models'
probability/prediction columns; the evolving weight lives in a ``__bw``
column, persisted/truncated via :class:`DFIterationCache`.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

from pyspark.ml.base import Estimator
from pyspark.ml.functions import vector_to_array
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import (
    HasAggregationDepth,
    HasCheckpointInterval,
    HasSeed,
)
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_ensemble_spark.core.base import (
    ClassifierParams,
    EnsembleClassificationModel,
    score_base_models,
)
from spark_ensemble_spark.core.instances import (
    extract_instances,
    get_num_classes,
    get_num_features,
)
from spark_ensemble_spark.core.instrumentation import FitInstrumentation
from spark_ensemble_spark.core.params import HasBaseLearner, HasNumBaseLearners
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
    EPSILON,
    fit_base_learner,
    scale_array,
    softmax_array,
    sum_arrays,
)

_ALGORITHMS = ("real", "discrete")


class _BoostingClassifierParams(
    ClassifierParams,
    HasBaseLearner,
    HasNumBaseLearners,
    HasCheckpointInterval,
    HasSeed,
    # Reference API parity (BoostingParams.scala treeAggregate depth); no-op
    # under DataFrame aggregation (SURVEY.md §2.4).
    HasAggregationDepth,
):
    algorithm: Param = Param(
        Params._dummy(),
        "algorithm",
        f"boosting algorithm, one of {_ALGORITHMS} (SAMME.R / SAMME)",
        typeConverter=TypeConverters.toString,
    )

    def __init__(self) -> None:
        super().__init__()
        self._setDefault(algorithm="real", checkpointInterval=10, seed=17)

    def getAlgorithm(self) -> str:
        v = self.getOrDefault(self.algorithm).lower()
        if v not in _ALGORITHMS:
            raise ValueError(f"algorithm must be one of {_ALGORITHMS}, got {v}")
        return v


def _samme_r_loss_expr(prob_arr: Column, label: Column, num_classes: int) -> Column:
    """Σ_c code_c · log(max(p_c, ε)) with code_c = 1 / −1/(K−1)."""
    k = num_classes
    idx = F.sequence(F.lit(0), F.lit(k - 1))
    return F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, c: acc
        + F.when(label == c.cast("double"), F.lit(1.0)).otherwise(
            F.lit(-1.0 / (k - 1))
        )
        * F.log(F.greatest(F.element_at(prob_arr, c + 1), F.lit(EPSILON))),
    )


class BoostingClassifier(Estimator, _BoostingClassifierParams, EnsembleReadWrite):
    def __init__(self, **kwargs) -> None:
        super().__init__()
        if "baseLearner" in kwargs:
            self.set(self.baseLearner, kwargs.pop("baseLearner"))
        self._set(**kwargs)

    def setParams(self, **kwargs) -> "BoostingClassifier":
        if "baseLearner" in kwargs:
            self.set(self.baseLearner, kwargs.pop("baseLearner"))
        self._set(**kwargs)
        return self

    def setBaseLearner(self, v) -> "BoostingClassifier":
        return self.setParams(baseLearner=v)

    def setNumBaseLearners(self, v: int) -> "BoostingClassifier":
        return self.setParams(numBaseLearners=v)

    def setAlgorithm(self, v: str) -> "BoostingClassifier":
        return self.setParams(algorithm=v)

    def setCheckpointInterval(self, v: int) -> "BoostingClassifier":
        return self.setParams(checkpointInterval=v)

    def setAggregationDepth(self, v: int) -> "BoostingClassifier":
        """Accepted for reference API parity; no-op under DataFrame aggs."""
        return self.setParams(aggregationDepth=v)

    def setWeightCol(self, v: str) -> "BoostingClassifier":
        return self.setParams(weightCol=v)

    def setLabelCol(self, v: str) -> "BoostingClassifier":
        return self.setParams(labelCol=v)

    def setFeaturesCol(self, v: str) -> "BoostingClassifier":
        return self.setParams(featuresCol=v)

    def _fit(self, df: DataFrame) -> "BoostingClassificationModel":
        self._validate_input(df, fitting=True)
        algorithm = self.getAlgorithm()
        num_learners = self.getNumBaseLearners()
        num_classes = get_num_classes(df, self.getLabelCol())
        k = num_classes

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
        try:
            i = 0
            done = False
            while i < num_learners and not done and sum_weights > 0:
                state = state.withColumn("__wnorm", F.col("__bw") / F.lit(sum_weights))
                model = fit_base_learner(
                    self.getBaseLearner(),
                    state,
                    "label",
                    "features",
                    "__pred",
                    weight_col="__wnorm",
                    raw_prediction_col="__raw",
                    probability_col="__prob",
                )

                if algorithm == "real":
                    if not model.hasParam("probabilityCol"):
                        raise ValueError(
                            "algorithm='real' requires a probabilistic base learner"
                        )
                    scored = model.transform(state).withColumn(
                        "__prob_arr", vector_to_array(F.col("__prob"))
                    )
                    scored = cache.update(scored)
                    estimator_error = (
                        scored.agg(
                            F.sum(
                                F.col("__wnorm")
                                * F.when(
                                    F.col("__pred") != F.col("label"), 1.0
                                ).otherwise(0.0)
                            )
                        ).first()[0]
                        or 0.0
                    )
                    models.append(model)
                    estimator_weights.append(1.0)
                    if estimator_error <= 0:
                        done = True
                    loss = _samme_r_loss_expr(
                        F.col("__prob_arr"), F.col("label"), k
                    )
                    state = scored.withColumn(
                        "__bw",
                        F.col("__wnorm") * F.exp(F.lit(-(k - 1.0) / k) * loss),
                    ).select("label", "weight", "features", "__bw")
                else:
                    scored = model.transform(state).withColumn(
                        "__err",
                        F.when(F.col("__pred") != F.col("label"), 1.0).otherwise(0.0),
                    )
                    scored = cache.update(scored)
                    estimator_error = (
                        scored.agg(F.sum(F.col("__wnorm") * F.col("__err"))).first()[0]
                        or 0.0
                    )
                    if estimator_error <= 0:
                        done = True
                    beta = (
                        estimator_error / ((1 - estimator_error) * (k - 1))
                        if estimator_error < 1.0
                        else 1e18
                    )
                    if estimator_error >= 1.0 - 1.0 / k:
                        # Worse than chance: discard this round and stop
                        # (reference :252-255 net behavior).
                        break
                    estimator_weight = 1.0 if beta == 0.0 else math.log(1.0 / beta)
                    models.append(model)
                    estimator_weights.append(estimator_weight)
                    inv_beta = 1.0 / beta if beta > 0 else 1.0
                    state = scored.withColumn(
                        "__bw",
                        F.col("__wnorm") * F.pow(F.lit(inv_beta), F.col("__err")),
                    ).select("label", "weight", "features", "__bw")

                state = cache.update(state)
                sum_weights = state.agg(F.sum("__bw")).first()[0] or 0.0
                instr.iteration(
                    i,
                    estimator_error=estimator_error,
                    estimator_weight=estimator_weights[-1] if estimator_weights else None,
                    sum_weights=sum_weights,
                )
                i += 1
        finally:
            cache.close()
        instr.done(len(models))

        model = BoostingClassificationModel(
            num_classes=num_classes,
            weights=estimator_weights,
            models=models,
            num_features=num_features,
        )
        model._resetUid(self.uid + "_model")
        self._copyValues(model)
        return model

    def _save_impl(self, path: str) -> None:
        save_metadata(self, path)
        save_instance(self.getBaseLearner(), f"{path}/learner")

    @classmethod
    def _load_impl(cls, path: str) -> "BoostingClassifier":
        meta = load_metadata(path)
        inst = cls()
        set_params_from_metadata(inst, meta)
        inst.set(inst.baseLearner, load_instance(f"{path}/learner"))
        return inst


class BoostingClassificationModel(
    EnsembleClassificationModel, _BoostingClassifierParams, EnsembleReadWrite
):
    def __init__(
        self,
        num_classes: int = 2,
        weights: Optional[Sequence[float]] = None,
        models: Optional[Sequence] = None,
        num_features: int = 0,
    ) -> None:
        super().__init__()
        self.numClasses = int(num_classes)
        self.weights = [float(w) for w in (weights or [])]
        self.models = list(models or [])
        self.numFeatures = int(num_features)

    @property
    def numModels(self) -> int:
        return len(self.models)

    def _raw_array_setup(self, df: DataFrame):
        algorithm = self.getAlgorithm()
        k = self.numClasses
        df, outs, tmp = score_base_models(
            df,
            self.getFeaturesCol(),
            self.models,
            None,
            self.numFeatures,
            prefix="__boost_",
            want_probability=(algorithm == "real"),
        )
        contribs = []
        for o, w in zip(outs, self.weights):
            if algorithm == "real":
                # (K−1)(log p_c − mean_c log p)  (reference :348-364)
                logs = F.transform(
                    vector_to_array(F.col(o["probability"])),
                    lambda p: F.log(F.greatest(p, F.lit(EPSILON))),
                )
                mean_log = (
                    F.aggregate(logs, F.lit(0.0), lambda a, x: a + x) / F.lit(float(k))
                )
                contribs.append(
                    F.transform(logs, lambda lp: F.lit(k - 1.0) * (lp - mean_log))
                )
            else:
                pred = F.col(o["prediction"])
                classes = F.sequence(F.lit(0), F.lit(k - 1))
                contribs.append(
                    F.transform(
                        classes,
                        lambda c: F.when(pred == c.cast("double"), F.lit(w)).otherwise(
                            F.lit(-w / (k - 1.0))
                        ),
                    )
                )
        return df, sum_arrays(contribs), tmp

    def _probability_from_raw(self, raw: Column) -> Column:
        # softmax(raw / (K−1))  (reference :341-346)
        return softmax_array(scale_array(raw, F.lit(1.0 / (self.numClasses - 1.0))))

    def copy(self, extra=None) -> "BoostingClassificationModel":
        copied = BoostingClassificationModel(
            self.numClasses, self.weights, self.models, self.numFeatures
        )
        copied._resetUid(self.uid)
        return self._copyValues(copied, extra)

    def _save_impl(self, path: str) -> None:
        save_ensemble(
            self,
            path,
            self.models,
            {
                "weights": self.weights,
                "numClasses": self.numClasses,
                "numFeatures": self.numFeatures,
            },
        )

    @classmethod
    def _load_impl(cls, path: str) -> "BoostingClassificationModel":
        metadata, data, models = load_ensemble(path)
        inst = cls(data["numClasses"], data["weights"], models, data["numFeatures"])
        inst._resetUid(metadata["uid"])
        set_params_from_metadata(inst, metadata)
        return inst
