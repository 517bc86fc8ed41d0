"""BaggingRegressor — bootstrap-aggregated regression.

Semantic parity with
``/root/reference/core/src/main/scala/org/apache/spark/ml/regression/BaggingRegressor.scala:77-237``:
N base learners fitted in parallel threads on independent SubBags (row
bootstrap × feature subspace); prediction is the unweighted mean of base
predictions on the per-model sliced features.

PySpark-first execution: the bags are ``df.sample`` (partition-local, no
shuffle), slicing is ``VectorSlicer`` (JVM), scoring is a chain of N JVM
``transform``s combined with one column expression — at 100 TB the only data
movement is whatever the base learner itself shuffles.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.ml.base import Estimator
from pyspark.ml.param.shared import HasParallelism, HasSeed
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from spark_ensemble_spark.core.base import EnsembleRegressionModel, PredictorParams, score_base_models
from spark_ensemble_spark.core.instances import extract_instances, get_num_features
from spark_ensemble_spark.core.params import HasBaseLearner, HasNumBaseLearners, HasSubBag
from spark_ensemble_spark.core.persistence import (
    EnsembleReadWrite,
    load_ensemble,
    load_instance,
    save_ensemble,
    set_params_from_metadata,
)
from spark_ensemble_spark.core.subbag import fit_bagged_models
from spark_ensemble_spark.core.utils import array_mean


class _BaggingRegressorParams(
    PredictorParams, HasBaseLearner, HasNumBaseLearners, HasSubBag, HasSeed, HasParallelism
):
    def __init__(self) -> None:
        super().__init__()
        self._setDefault(seed=17, parallelism=1)


class BaggingRegressor(Estimator, _BaggingRegressorParams, EnsembleReadWrite):
    def __init__(self, **kwargs) -> None:
        super().__init__()
        if "baseLearner" in kwargs:
            self.set(self.baseLearner, kwargs.pop("baseLearner"))
        self._set(**kwargs)

    def setParams(self, **kwargs) -> "BaggingRegressor":
        if "baseLearner" in kwargs:
            self.set(self.baseLearner, kwargs.pop("baseLearner"))
        self._set(**kwargs)
        return self

    def setBaseLearner(self, v) -> "BaggingRegressor":
        return self.setParams(baseLearner=v)

    def setNumBaseLearners(self, v: int) -> "BaggingRegressor":
        return self.setParams(numBaseLearners=v)

    def setReplacement(self, v: bool) -> "BaggingRegressor":
        return self.setParams(replacement=v)

    def setSubsampleRatio(self, v: float) -> "BaggingRegressor":
        return self.setParams(subsampleRatio=v)

    def setSubspaceRatio(self, v: float) -> "BaggingRegressor":
        return self.setParams(subspaceRatio=v)

    def setSeed(self, v: int) -> "BaggingRegressor":
        return self.setParams(seed=v)

    def setParallelism(self, v: int) -> "BaggingRegressor":
        return self.setParams(parallelism=v)

    def setWeightCol(self, v: str) -> "BaggingRegressor":
        return self.setParams(weightCol=v)

    def setLabelCol(self, v: str) -> "BaggingRegressor":
        return self.setParams(labelCol=v)

    def setFeaturesCol(self, v: str) -> "BaggingRegressor":
        return self.setParams(featuresCol=v)

    def _fit(self, df: DataFrame) -> "BaggingRegressionModel":
        self._validate_input(df, fitting=True)
        instances = extract_instances(
            df, self.getLabelCol(), self.getFeaturesCol(), self._weight_col_or_none()
        )
        instances.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            instances.count()
            num_features = get_num_features(instances, "features")
            subspaces, models = fit_bagged_models(
                instances,
                num_features,
                self.getBaseLearner(),
                self.getNumBaseLearners(),
                self.getReplacement(),
                self.getSubsampleRatio(),
                self.getSubspaceRatio(),
                self.getOrDefault(self.seed),
                self.getOrDefault(self.parallelism),
            )
        finally:
            instances.unpersist()
        model = BaggingRegressionModel(
            subspaces=subspaces, models=models, num_features=num_features
        )
        model._resetUid(self.uid + "_model")
        self._copyValues(model)
        return model

    def _save_impl(self, path: str) -> None:
        from spark_ensemble_spark.core.persistence import save_instance, save_metadata

        save_metadata(self, path)
        save_instance(self.getBaseLearner(), f"{path}/learner")

    @classmethod
    def _load_impl(cls, path: str) -> "BaggingRegressor":
        from spark_ensemble_spark.core.persistence import load_metadata

        meta = load_metadata(path)
        inst = cls()
        set_params_from_metadata(inst, meta)
        inst.set(inst.baseLearner, load_instance(f"{path}/learner"))
        return inst


class BaggingRegressionModel(EnsembleRegressionModel, _BaggingRegressorParams, EnsembleReadWrite):
    def __init__(
        self,
        subspaces: Optional[List[List[int]]] = None,
        models: Optional[Sequence] = None,
        num_features: int = 0,
    ) -> None:
        super().__init__()
        self.subspaces = [list(s) for s in (subspaces or [])]
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
            self.subspaces,
            self.numFeatures,
            prefix="__bag_",
        )
        pred = array_mean([o["prediction"] for o in outs])
        return df, pred, tmp

    def copy(self, extra=None) -> "BaggingRegressionModel":
        copied = BaggingRegressionModel(self.subspaces, self.models, self.numFeatures)
        copied._resetUid(self.uid)
        return self._copyValues(copied, extra)

    def _save_impl(self, path: str) -> None:
        save_ensemble(
            self,
            path,
            self.models,
            {"subspaces": self.subspaces, "numFeatures": self.numFeatures},
        )

    @classmethod
    def _load_impl(cls, path: str) -> "BaggingRegressionModel":
        metadata, data, models = load_ensemble(path)
        inst = cls(data["subspaces"], models, data["numFeatures"])
        inst._resetUid(metadata["uid"])
        set_params_from_metadata(inst, metadata)
        return inst
