"""BaggingClassifier — bootstrap-aggregated classification with hard/soft voting.

Semantic parity with
``/root/reference/core/src/main/scala/org/apache/spark/ml/classification/BaggingClassifier.scala:106-297``:
hard vote = sum of one-hot predicted classes; soft vote = sum of base
``probability`` vectors; probability = raw / numModels; prediction = argmax.

Votes are combined as array-column expressions (one K-vector per model via
``F.transform`` over a class-index sequence, summed with ``zip_with``) — all
JVM-side, no per-row Python.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.ml.base import Estimator
from pyspark.ml.functions import vector_to_array
from pyspark.ml.param.shared import HasParallelism, HasSeed
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

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
from spark_ensemble_spark.core.params import (
    HasBaseLearner,
    HasNumBaseLearners,
    HasSubBag,
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
from spark_ensemble_spark.core.subbag import fit_bagged_models
from spark_ensemble_spark.core.utils import scale_array, sum_arrays

_VOTING = ("hard", "soft")


class _BaggingClassifierParams(
    ClassifierParams,
    HasBaseLearner,
    HasNumBaseLearners,
    HasSubBag,
    HasVotingStrategy,
    HasSeed,
    HasParallelism,
):
    def __init__(self) -> None:
        super().__init__()
        self._setDefault(seed=17, parallelism=1, votingStrategy="hard")

    def getVotingStrategy(self) -> str:
        v = self.getOrDefault(self.votingStrategy).lower()
        if v not in _VOTING:
            raise ValueError(f"votingStrategy must be one of {_VOTING}, got {v}")
        return v


class BaggingClassifier(Estimator, _BaggingClassifierParams, EnsembleReadWrite):
    def __init__(self, **kwargs) -> None:
        super().__init__()
        if "baseLearner" in kwargs:
            self.set(self.baseLearner, kwargs.pop("baseLearner"))
        self._set(**kwargs)

    def setParams(self, **kwargs) -> "BaggingClassifier":
        if "baseLearner" in kwargs:
            self.set(self.baseLearner, kwargs.pop("baseLearner"))
        self._set(**kwargs)
        return self

    def setBaseLearner(self, v) -> "BaggingClassifier":
        return self.setParams(baseLearner=v)

    def setNumBaseLearners(self, v: int) -> "BaggingClassifier":
        return self.setParams(numBaseLearners=v)

    def setReplacement(self, v: bool) -> "BaggingClassifier":
        return self.setParams(replacement=v)

    def setSubsampleRatio(self, v: float) -> "BaggingClassifier":
        return self.setParams(subsampleRatio=v)

    def setSubspaceRatio(self, v: float) -> "BaggingClassifier":
        return self.setParams(subspaceRatio=v)

    def setVotingStrategy(self, v: str) -> "BaggingClassifier":
        return self.setParams(votingStrategy=v)

    def setSeed(self, v: int) -> "BaggingClassifier":
        return self.setParams(seed=v)

    def setParallelism(self, v: int) -> "BaggingClassifier":
        return self.setParams(parallelism=v)

    def setWeightCol(self, v: str) -> "BaggingClassifier":
        return self.setParams(weightCol=v)

    def setLabelCol(self, v: str) -> "BaggingClassifier":
        return self.setParams(labelCol=v)

    def setFeaturesCol(self, v: str) -> "BaggingClassifier":
        return self.setParams(featuresCol=v)

    def _fit(self, df: DataFrame) -> "BaggingClassificationModel":
        self._validate_input(df, fitting=True)
        num_classes = get_num_classes(df, self.getLabelCol())
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
        model = BaggingClassificationModel(
            num_classes=num_classes,
            subspaces=subspaces,
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
    def _load_impl(cls, path: str) -> "BaggingClassifier":
        meta = load_metadata(path)
        inst = cls()
        set_params_from_metadata(inst, meta)
        inst.set(inst.baseLearner, load_instance(f"{path}/learner"))
        return inst


class BaggingClassificationModel(
    EnsembleClassificationModel, _BaggingClassifierParams, EnsembleReadWrite
):
    def __init__(
        self,
        num_classes: int = 2,
        subspaces: Optional[List[List[int]]] = None,
        models: Optional[Sequence] = None,
        num_features: int = 0,
    ) -> None:
        super().__init__()
        self.numClasses = int(num_classes)
        self.subspaces = [list(s) for s in (subspaces or [])]
        self.models = list(models or [])
        self.numFeatures = int(num_features)

    @property
    def numModels(self) -> int:
        return len(self.models)

    def _raw_array_setup(self, df: DataFrame):
        voting = self.getVotingStrategy()
        want_probability = voting == "soft"
        df, outs, tmp = score_base_models(
            df,
            self.getFeaturesCol(),
            self.models,
            self.subspaces,
            self.numFeatures,
            prefix="__bag_",
            want_probability=want_probability,
        )
        votes = []
        for o in outs:
            if voting == "soft":
                if "probability" not in o:
                    raise ValueError(
                        "votingStrategy='soft' requires probabilistic base learners"
                    )
                votes.append(vector_to_array(F.col(o["probability"])))
            else:
                pred = F.col(o["prediction"])
                classes = F.sequence(F.lit(0), F.lit(self.numClasses - 1))
                votes.append(
                    F.transform(
                        classes,
                        lambda c: F.when(pred == c.cast("double"), 1.0).otherwise(0.0),
                    )
                )
        return df, sum_arrays(votes), tmp

    def _probability_from_raw(self, raw: Column) -> Column:
        return scale_array(raw, F.lit(1.0 / self.numModels))

    def copy(self, extra=None) -> "BaggingClassificationModel":
        copied = BaggingClassificationModel(
            self.numClasses, self.subspaces, self.models, self.numFeatures
        )
        copied._resetUid(self.uid)
        return self._copyValues(copied, extra)

    def _save_impl(self, path: str) -> None:
        save_ensemble(
            self,
            path,
            self.models,
            {
                "subspaces": self.subspaces,
                "numFeatures": self.numFeatures,
                "numClasses": self.numClasses,
            },
        )

    @classmethod
    def _load_impl(cls, path: str) -> "BaggingClassificationModel":
        metadata, data, models = load_ensemble(path)
        inst = cls(data["numClasses"], data["subspaces"], models, data["numFeatures"])
        inst._resetUid(metadata["uid"])
        set_params_from_metadata(inst, metadata)
        return inst
