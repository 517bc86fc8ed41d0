"""StackingRegressor — heterogeneous base learners + a meta-learner.

Semantic parity with
``/root/reference/core/src/main/scala/org/apache/spark/ml/regression/StackingRegressor.scala:83-235``:
N different base learners are fitted in parallel on the FULL dataset (no
sampling); the stacker is then fitted on the vector of their predictions.

The reference materializes meta-features through an ``RDD[Instance]`` hop; we
chain the N JVM transforms and a ``VectorAssembler`` — one pipeline, no
per-row Python, and the meta-feature build is lazy until the stacker fit.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.ml.base import Estimator, Model
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.param.shared import HasParallelism
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from spark_ensemble_spark.core.base import PredictorParams, _ModelParamsMixin, score_base_models
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


class _StackingRegressorParams(PredictorParams, HasBaseLearners, HasStacker, HasParallelism):
    def __init__(self) -> None:
        super().__init__()
        self._setDefault(parallelism=1)


class StackingRegressor(Estimator, _StackingRegressorParams, EnsembleReadWrite):
    def __init__(self, **kwargs) -> None:
        super().__init__()
        for est_param in ("baseLearners", "stacker"):
            if est_param in kwargs:
                self.set(self.getParam(est_param), kwargs.pop(est_param))
        self._set(**kwargs)

    def setParams(self, **kwargs) -> "StackingRegressor":
        for est_param in ("baseLearners", "stacker"):
            if est_param in kwargs:
                self.set(self.getParam(est_param), kwargs.pop(est_param))
        self._set(**kwargs)
        return self

    def setBaseLearners(self, v) -> "StackingRegressor":
        return self.setParams(baseLearners=v)

    def setStacker(self, v) -> "StackingRegressor":
        return self.setParams(stacker=v)

    def setParallelism(self, v: int) -> "StackingRegressor":
        return self.setParams(parallelism=v)

    def setWeightCol(self, v: str) -> "StackingRegressor":
        return self.setParams(weightCol=v)

    def setLabelCol(self, v: str) -> "StackingRegressor":
        return self.setParams(labelCol=v)

    def setFeaturesCol(self, v: str) -> "StackingRegressor":
        return self.setParams(featuresCol=v)

    def _fit(self, df: DataFrame) -> "StackingRegressionModel":
        self._validate_input(df, fitting=True)
        learners = list(self.getBaseLearners())
        instances = extract_instances(
            df, self.getLabelCol(), self.getFeaturesCol(), self._weight_col_or_none()
        )
        instances.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            instances.count()
            models = run_parallel(
                [
                    lambda l=l: fit_base_learner(
                        l, instances, "label", "features", "__pred", weight_col="weight"
                    )
                    for l in learners
                ],
                self.getOrDefault(self.parallelism),
            )
            # Meta-features: chained transforms + assembler.
            meta = instances
            pred_cols = []
            for i, m in enumerate(models):
                meta = m.transform(meta, {m.getParam("predictionCol"): f"__mf{i}"})
                pred_cols.append(f"__mf{i}")
            assembler = VectorAssembler(inputCols=pred_cols, outputCol="__meta")
            # Materialize the assembled meta-features once — an iterative
            # stacker otherwise re-runs every base transform + assembly per
            # optimizer pass (r13, guide §5; classifier twin has the same).
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
        model = StackingRegressionModel(models=models, stack=stack)
        model._resetUid(self.uid + "_model")
        self._copyValues(model)
        return model

    def _save_impl(self, path: str) -> None:
        save_metadata(self, path, extra={"numLearners": len(self.getBaseLearners())})
        for i, l in enumerate(self.getBaseLearners()):
            save_instance(l, f"{path}/learner-{i}")
        save_instance(self.getStacker(), f"{path}/stacker")

    @classmethod
    def _load_impl(cls, path: str) -> "StackingRegressor":
        meta = load_metadata(path)
        n = int(meta["numLearners"])
        inst = cls()
        set_params_from_metadata(inst, meta)
        inst.set(inst.baseLearners, [load_instance(f"{path}/learner-{i}") for i in range(n)])
        inst.set(inst.stacker, load_instance(f"{path}/stacker"))
        return inst


class StackingRegressionModel(
    Model, _StackingRegressorParams, _ModelParamsMixin, EnsembleReadWrite
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
        df, outs, tmp = score_base_models(
            df, self.getFeaturesCol(), self.models, None, None, prefix="__stk_"
        )
        pred_cols = [o["prediction"] for o in outs]
        assembler = VectorAssembler(inputCols=pred_cols, outputCol="__meta")
        df = assembler.transform(df)
        tmp = tmp + ["__meta"]
        overrides = {
            self.stack.getParam("featuresCol"): "__meta",
            self.stack.getParam("predictionCol"): self.getPredictionCol(),
        }
        out = self.stack.transform(df, overrides)
        return out.drop(*tmp)

    def copy(self, extra=None) -> "StackingRegressionModel":
        copied = StackingRegressionModel(self.models, self.stack)
        copied._resetUid(self.uid)
        return self._copyValues(copied, extra)

    def _save_impl(self, path: str) -> None:
        save_ensemble(self, path, self.models, {})
        save_instance(self.stack, f"{path}/stack")

    @classmethod
    def _load_impl(cls, path: str) -> "StackingRegressionModel":
        metadata, data, models = load_ensemble(path)
        stack = load_instance(f"{path}/stack")
        inst = cls(models, stack)
        inst._resetUid(metadata["uid"])
        set_params_from_metadata(inst, metadata)
        return inst
