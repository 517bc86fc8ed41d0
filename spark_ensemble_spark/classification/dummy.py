"""DummyClassifier — constant-distribution baseline.

Semantic parity with
``/root/reference/core/src/main/scala/org/apache/spark/ml/classification/DummyClassifier.scala:73-173``:
strategy ∈ {uniform, prior, constant}; prior = class frequencies via
``groupBy(label).count()`` (raw = log prior); the fitted model predicts the
same raw/probability vector for every row.
"""

from __future__ import annotations

import math
from typing import List

from pyspark.ml.base import Estimator
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_ensemble_spark.core.base import ClassifierParams, EnsembleClassificationModel
from spark_ensemble_spark.core.instances import get_num_classes
from spark_ensemble_spark.core.persistence import (
    EnsembleReadWrite,
    load_json,
    load_metadata,
    save_json,
    save_metadata,
    set_params_from_metadata,
)

_STRATEGIES = ("uniform", "prior", "constant")


class _DummyClassifierParams(ClassifierParams):
    strategy: Param = Param(
        Params._dummy(),
        "strategy",
        f"constant-distribution strategy, one of {_STRATEGIES}",
        typeConverter=TypeConverters.toString,
    )
    constant: Param = Param(
        Params._dummy(),
        "constant",
        "class label predicted by strategy=constant",
        typeConverter=TypeConverters.toFloat,
    )

    def __init__(self) -> None:
        super().__init__()
        self._setDefault(strategy="prior", constant=0.0)

    def getStrategy(self) -> str:
        s = self.getOrDefault(self.strategy).lower()
        if s not in _STRATEGIES:
            raise ValueError(f"strategy must be one of {_STRATEGIES}, got {s}")
        return s

    def getConstant(self) -> float:
        return self.getOrDefault(self.constant)


class DummyClassifier(Estimator, _DummyClassifierParams, EnsembleReadWrite):
    def __init__(self, **kwargs) -> None:
        super().__init__()
        self._set(**kwargs)

    def setParams(self, **kwargs) -> "DummyClassifier":
        self._set(**kwargs)
        return self

    def setStrategy(self, v: str) -> "DummyClassifier":
        return self.setParams(strategy=v)

    def setConstant(self, v: float) -> "DummyClassifier":
        return self.setParams(constant=v)

    def setLabelCol(self, v: str) -> "DummyClassifier":
        return self.setParams(labelCol=v)

    def setFeaturesCol(self, v: str) -> "DummyClassifier":
        return self.setParams(featuresCol=v)

    def _fit(self, df: DataFrame) -> "DummyClassificationModel":
        self._validate_input(df, fitting=True)
        label = F.col(self.getLabelCol()).cast("double")
        num_classes = get_num_classes(df, self.getLabelCol())
        strategy = self.getStrategy()
        if strategy == "uniform":
            raw = [0.0] * num_classes
            probability = [1.0 / num_classes] * num_classes
        elif strategy == "prior":
            counts = {
                int(r[0]): r[1]
                for r in df.groupBy(label.alias("__l")).count().collect()
            }
            total = float(sum(counts.values()))
            probability = [counts.get(c, 0) / total for c in range(num_classes)]
            raw = [math.log(p) if p > 0 else float("-inf") for p in probability]
        else:
            c = int(self.getConstant())
            if not (0 <= c < num_classes):
                raise ValueError(f"constant {c} outside [0, {num_classes})")
            raw = [0.0] * num_classes
            raw[c] = 1.0
            probability = list(raw)
        model = DummyClassificationModel(
            num_classes=num_classes, raw_prediction=raw, probability=probability
        )
        model._resetUid(self.uid + "_model")
        self._copyValues(model)
        return model

    def _save_impl(self, path: str) -> None:
        save_metadata(self, path)

    @classmethod
    def _load_impl(cls, path: str) -> "DummyClassifier":
        meta = load_metadata(path)
        inst = cls()
        set_params_from_metadata(inst, meta)
        return inst


class DummyClassificationModel(
    EnsembleClassificationModel, _DummyClassifierParams, EnsembleReadWrite
):
    def __init__(
        self,
        num_classes: int = 2,
        raw_prediction: List[float] = None,
        probability: List[float] = None,
    ) -> None:
        super().__init__()
        self.numClasses = int(num_classes)
        self.rawPrediction = list(raw_prediction or [0.0] * num_classes)
        self.probability = list(probability or [1.0 / num_classes] * num_classes)

    def _raw_array_setup(self, df: DataFrame):
        raw = F.array(*[F.lit(v) for v in self.rawPrediction])
        return df, raw, []

    def _probability_from_raw(self, raw: Column) -> Column:
        return F.array(*[F.lit(v) for v in self.probability])

    def predict(self, features=None) -> float:
        return float(max(range(self.numClasses), key=lambda i: self.probability[i]))

    def copy(self, extra=None) -> "DummyClassificationModel":
        copied = DummyClassificationModel(
            self.numClasses, self.rawPrediction, self.probability
        )
        copied._resetUid(self.uid)
        return self._copyValues(copied, extra)

    def _save_impl(self, path: str) -> None:
        save_metadata(self, path)
        save_json(
            path + "/data",
            {
                "numClasses": self.numClasses,
                "rawPrediction": self.rawPrediction,
                "probability": self.probability,
            },
        )

    @classmethod
    def _load_impl(cls, path: str) -> "DummyClassificationModel":
        meta = load_metadata(path)
        data = load_json(path + "/data")
        inst = cls(data["numClasses"], data["rawPrediction"], data["probability"])
        inst._resetUid(meta["uid"])
        set_params_from_metadata(inst, meta)
        return inst
