"""StackingClassifier — heterogeneous classifiers + a meta-learner.

Semantic parity with
``/root/reference/core/src/main/scala/org/apache/spark/ml/classification/StackingClassifier.scala:112-283``:
``stackMethod`` picks the meta-features — predicted ``class`` (one double per
model), ``raw`` scores, or ``proba`` vectors (flat-mapped). Like the
reference's model (which extends plain ``PredictionModel``), the fitted model
outputs only a prediction column.

``VectorAssembler`` natively concatenates vector columns, so raw/proba
flattening is JVM-side with metadata intact.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.ml.base import Estimator, Model
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import HasParallelism
from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from spark_ensemble_spark.core.base import (
    PredictorParams,
    _ModelParamsMixin,
    score_base_models,
)
from spark_ensemble_spark.core.instances import extract_instances
from spark_ensemble_spark.core.params import HasBaseLearners, HasStacker
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
from spark_ensemble_spark.core.utils import fit_base_learner, run_parallel

_STACK_METHODS = ("class", "raw", "proba")


class _StackingClassifierParams(PredictorParams, HasBaseLearners, HasStacker, HasParallelism):
    stackMethod: Param = Param(
        Params._dummy(),
        "stackMethod",
        f"meta-feature choice, one of {_STACK_METHODS}",
        typeConverter=TypeConverters.toString,
    )

    def __init__(self) -> None:
        super().__init__()
        self._setDefault(parallelism=1, stackMethod="class")

    def getStackMethod(self) -> str:
        v = self.getOrDefault(self.stackMethod).lower()
        if v not in _STACK_METHODS:
            raise ValueError(f"stackMethod must be one of {_STACK_METHODS}, got {v}")
        return v


def _meta_feature_cols(outs: List[dict], method: str) -> List[str]:
    key = {"class": "prediction", "raw": "rawPrediction", "proba": "probability"}[method]
    cols = []
    for o in outs:
        if key not in o:
            raise ValueError(
                f"stackMethod='{method}' requires base learners exposing '{key}'"
            )
        cols.append(o[key])
    return cols


class StackingClassifier(Estimator, _StackingClassifierParams, EnsembleReadWrite):
    def __init__(self, **kwargs) -> None:
        super().__init__()
        for est_param in ("baseLearners", "stacker"):
            if est_param in kwargs:
                self.set(self.getParam(est_param), kwargs.pop(est_param))
        self._set(**kwargs)

    def setParams(self, **kwargs) -> "StackingClassifier":
        for est_param in ("baseLearners", "stacker"):
            if est_param in kwargs:
                self.set(self.getParam(est_param), kwargs.pop(est_param))
        self._set(**kwargs)
        return self

    def setBaseLearners(self, v) -> "StackingClassifier":
        return self.setParams(baseLearners=v)

    def setStacker(self, v) -> "StackingClassifier":
        return self.setParams(stacker=v)

    def setStackMethod(self, v: str) -> "StackingClassifier":
        return self.setParams(stackMethod=v)

    def setParallelism(self, v: int) -> "StackingClassifier":
        return self.setParams(parallelism=v)

    def setWeightCol(self, v: str) -> "StackingClassifier":
        return self.setParams(weightCol=v)

    def setLabelCol(self, v: str) -> "StackingClassifier":
        return self.setParams(labelCol=v)

    def setFeaturesCol(self, v: str) -> "StackingClassifier":
        return self.setParams(featuresCol=v)

    def _fit(self, df: DataFrame) -> "StackingClassificationModel":
        self._validate_input(df, fitting=True)
        learners = list(self.getBaseLearners())
        method = self.getStackMethod()
        instances = extract_instances(
            df, self.getLabelCol(), self.getFeaturesCol(), self._weight_col_or_none()
        )
        instances.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            instances.count()
            models = run_parallel(
                [
                    lambda l=l: fit_base_learner(
                        l,
                        instances,
                        "label",
                        "features",
                        "__pred",
                        weight_col="weight",
                        raw_prediction_col="__raw",
                        probability_col="__prob",
                    )
                    for l in learners
                ],
                self.getOrDefault(self.parallelism),
            )
            meta, outs, _ = score_base_models(
                instances,
                "features",
                models,
                None,
                None,
                prefix="__stk_",
                want_probability=(method == "proba"),
                want_raw=(method == "raw"),
            )
            feature_cols = _meta_feature_cols(outs, method)
            assembler = VectorAssembler(inputCols=feature_cols, outputCol="__meta")
            # Materialize the assembled meta-features ONCE (projected to the
            # three columns the stacker reads): an iterative stacker (e.g.
            # LogisticRegression) re-executes its input plan every
            # treeAggregate pass, which here means re-running every base
            # model's transform + the assembly per iteration — r13,
            # guide §5 (cache when reused and recompute is expensive).
            meta = assembler.transform(meta).select("label", "weight", "__meta")
            meta.persist(StorageLevel.MEMORY_AND_DISK)
            try:
                stack = fit_base_learner(
                    self.getStacker(), meta, "label", "__meta", "__spred",
                    weight_col="weight",
                )
            finally:
                meta.unpersist()
        finally:
            instances.unpersist()
        model = StackingClassificationModel(models=models, stack=stack)
        model._resetUid(self.uid + "_model")
        self._copyValues(model)
        return model

    def _save_impl(self, path: str) -> None:
        save_metadata(self, path, extra={"numLearners": len(self.getBaseLearners())})
        for i, l in enumerate(self.getBaseLearners()):
            save_instance(l, f"{path}/learner-{i}")
        save_instance(self.getStacker(), f"{path}/stacker")

    @classmethod
    def _load_impl(cls, path: str) -> "StackingClassifier":
        meta = load_metadata(path)
        n = int(meta["numLearners"])
        inst = cls()
        set_params_from_metadata(inst, meta)
        inst.set(inst.baseLearners, [load_instance(f"{path}/learner-{i}") for i in range(n)])
        inst.set(inst.stacker, load_instance(f"{path}/stacker"))
        return inst


class StackingClassificationModel(
    Model, _StackingClassifierParams, _ModelParamsMixin, EnsembleReadWrite
):
    def __init__(self, models: Optional[Sequence] = None, stack=None) -> None:
        super().__init__()
        self.models = list(models or [])
        self.stack = stack

    @property
    def numModels(self) -> int:
        return len(self.models)

    def _transform(self, df: DataFrame) -> DataFrame:
        self._validate_input(df, fitting=False)
        method = self.getStackMethod()
        df, outs, tmp = score_base_models(
            df,
            self.getFeaturesCol(),
            self.models,
            None,
            None,
            prefix="__stk_",
            want_probability=(method == "proba"),
            want_raw=(method == "raw"),
        )
        feature_cols = _meta_feature_cols(outs, method)
        assembler = VectorAssembler(inputCols=feature_cols, outputCol="__meta")
        df = assembler.transform(df)
        tmp = tmp + ["__meta"]
        overrides = {
            self.stack.getParam("featuresCol"): "__meta",
            self.stack.getParam("predictionCol"): self.getPredictionCol(),
        }
        if self.stack.hasParam("rawPredictionCol"):
            overrides[self.stack.getParam("rawPredictionCol")] = "__stack_raw"
            tmp.append("__stack_raw")
        if self.stack.hasParam("probabilityCol"):
            overrides[self.stack.getParam("probabilityCol")] = "__stack_prob"
            tmp.append("__stack_prob")
        out = self.stack.transform(df, overrides)
        return out.drop(*tmp)

    def copy(self, extra=None) -> "StackingClassificationModel":
        copied = StackingClassificationModel(self.models, self.stack)
        copied._resetUid(self.uid)
        return self._copyValues(copied, extra)

    def _save_impl(self, path: str) -> None:
        save_ensemble(self, path, self.models, {})
        save_instance(self.stack, f"{path}/stack")

    @classmethod
    def _load_impl(cls, path: str) -> "StackingClassificationModel":
        metadata, data, models = load_ensemble(path)
        stack = load_instance(f"{path}/stack")
        inst = cls(models, stack)
        inst._resetUid(metadata["uid"])
        set_params_from_metadata(inst, metadata)
        return inst
