"""DummyRegressor — constant-prediction baseline.

Semantic parity with
``/root/reference/core/src/main/scala/org/apache/spark/ml/regression/DummyRegressor.scala:88-172``:
strategy ∈ {mean, median, quantile, constant}; mean via a global aggregate,
median/quantile via Greenwald-Khanna ``approxQuantile`` with relative error
``tol`` (exact at tol=0, as the reference tests use —
``DummyRegressorSuite.scala:96``).
"""

from __future__ import annotations

from typing import Optional

from pyspark.ml.base import Estimator
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_ensemble_spark.core.base import EnsembleRegressionModel, PredictorParams
from spark_ensemble_spark.core.persistence import (
    EnsembleReadWrite,
    load_json,
    load_metadata,
    save_json,
    save_metadata,
    set_params_from_metadata,
)

_STRATEGIES = ("mean", "median", "quantile", "constant")


class _DummyRegressorParams(PredictorParams):
    strategy: Param = Param(
        Params._dummy(),
        "strategy",
        f"constant-prediction strategy, one of {_STRATEGIES}",
        typeConverter=TypeConverters.toString,
    )
    constant: Param = Param(
        Params._dummy(),
        "constant",
        "constant used by strategy=constant",
        typeConverter=TypeConverters.toFloat,
    )
    quantile: Param = Param(
        Params._dummy(),
        "quantile",
        "quantile in [0,1] used by strategy=quantile",
        typeConverter=TypeConverters.toFloat,
    )
    tol: Param = Param(
        Params._dummy(),
        "tol",
        "relative error for approximate quantiles (0 = exact)",
        typeConverter=TypeConverters.toFloat,
    )

    def __init__(self) -> None:
        super().__init__()
        self._setDefault(strategy="mean", constant=0.0, quantile=0.5, tol=1e-2)

    def getStrategy(self) -> str:
        s = self.getOrDefault(self.strategy).lower()
        if s not in _STRATEGIES:
            raise ValueError(f"strategy must be one of {_STRATEGIES}, got {s}")
        return s

    def getConstant(self) -> float:
        return self.getOrDefault(self.constant)

    def getQuantile(self) -> float:
        return self.getOrDefault(self.quantile)

    def getTol(self) -> float:
        return self.getOrDefault(self.tol)


class DummyRegressor(Estimator, _DummyRegressorParams, EnsembleReadWrite):
    def __init__(self, **kwargs) -> None:
        super().__init__()
        self._set(**kwargs)

    def setParams(self, **kwargs) -> "DummyRegressor":
        self._set(**kwargs)
        return self

    def setStrategy(self, v: str) -> "DummyRegressor":
        return self.setParams(strategy=v)

    def setConstant(self, v: float) -> "DummyRegressor":
        return self.setParams(constant=v)

    def setQuantile(self, v: float) -> "DummyRegressor":
        return self.setParams(quantile=v)

    def setTol(self, v: float) -> "DummyRegressor":
        return self.setParams(tol=v)

    def setLabelCol(self, v: str) -> "DummyRegressor":
        return self.setParams(labelCol=v)

    def setFeaturesCol(self, v: str) -> "DummyRegressor":
        return self.setParams(featuresCol=v)

    def setPredictionCol(self, v: str) -> "DummyRegressor":
        return self.setParams(predictionCol=v)

    def _fit(self, df: DataFrame) -> "DummyRegressionModel":
        self._validate_input(df, fitting=True)
        label = F.col(self.getLabelCol()).cast("double")
        strategy = self.getStrategy()
        if strategy == "mean":
            prediction = df.select(F.mean(label)).first()[0]
        elif strategy in ("median", "quantile"):
            q = 0.5 if strategy == "median" else self.getQuantile()
            prediction = df.select(label.alias("__l")).stat.approxQuantile(
                "__l", [q], self.getTol()
            )[0]
        else:
            prediction = self.getConstant()
        model = DummyRegressionModel(prediction=float(prediction))
        model._resetUid(self.uid + "_model")
        self._copyValues(model)
        return model

    def _save_impl(self, path: str) -> None:
        save_metadata(self, path)

    @classmethod
    def _load_impl(cls, path: str) -> "DummyRegressor":
        meta = load_metadata(path)
        inst = cls()
        set_params_from_metadata(inst, meta)
        return inst


class DummyRegressionModel(EnsembleRegressionModel, _DummyRegressorParams, EnsembleReadWrite):
    def __init__(self, prediction: float = 0.0) -> None:
        super().__init__()
        self.prediction = float(prediction)

    def _prediction_setup(self, df: DataFrame):
        return df, F.lit(self.prediction), []

    # predict() mirrors the reference model's pure function for driver-side use.
    def predict(self, features) -> float:
        return self.prediction

    def copy(self, extra=None) -> "DummyRegressionModel":
        copied = DummyRegressionModel(self.prediction)
        copied._resetUid(self.uid)
        return self._copyValues(copied, extra)

    def _save_impl(self, path: str) -> None:
        save_metadata(self, path)
        save_json(path + "/data", {"prediction": self.prediction})

    @classmethod
    def _load_impl(cls, path: str) -> "DummyRegressionModel":
        meta = load_metadata(path)
        data = load_json(path + "/data")
        inst = cls(prediction=data["prediction"])
        inst._resetUid(meta["uid"])
        set_params_from_metadata(inst, meta)
        return inst
