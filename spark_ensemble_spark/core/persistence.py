"""Ensemble persistence: the reference's directory layout, PySpark-native.

Layout (mirrors ``BaggingRegressor.scala:46-62,251-264`` /
``ensemble/ensembleParams.scala:85-105,168-193``):

    path/
      metadata/        params-minus-learners JSON (DefaultParamsWriter format)
      learner/         unfitted base learner (its own .save); learner-$i/ for lists
      stacker/         unfitted meta learner (stacking only)
      model-$i/        fitted sub-models (their own .save)
      data/            one JSON line of aux arrays (weights, subspaces, ...)

All I/O goes through the SparkContext (hadoop-FS safe — works on HDFS/S3/local
alike); nothing assumes a local filesystem.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Sequence

from pyspark.ml.util import (
    DefaultParamsReader,
    DefaultParamsWriter,
    MLReadable,
    MLReader,
    MLWritable,
    MLWriter,
)
from pyspark.sql import SparkSession


def _active_spark() -> SparkSession:
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("no active SparkSession")
    return spark


# Param names holding estimator objects — excluded from JSON metadata,
# persisted as sub-directories instead.
ESTIMATOR_PARAMS = ("baseLearner", "baseLearners", "stacker")


def json_param_map(instance) -> Dict[str, Any]:
    """Explicitly-set params as a JSON-encodable dict, skipping estimator-valued
    ones (same filter as ``BoostingRegressorParams.saveImpl``,
    ``BoostingRegressor.scala:114-121``)."""
    out: Dict[str, Any] = {}
    for p, v in instance._paramMap.items():
        if p.name in ESTIMATOR_PARAMS:
            continue
        out[p.name] = v
    return out


def save_metadata(instance, path: str, extra: Optional[Dict[str, Any]] = None) -> None:
    spark = _active_spark()
    DefaultParamsWriter.saveMetadata(
        instance, path, spark.sparkContext, extraMetadata=extra, paramMap=json_param_map(instance)
    )


def load_metadata(path: str) -> Dict[str, Any]:
    spark = _active_spark()
    return DefaultParamsReader.loadMetadata(path, spark.sparkContext)


def set_params_from_metadata(instance, metadata: Dict[str, Any]) -> None:
    DefaultParamsReader.getAndSetParams(instance, metadata)


def save_instance(obj, path: str) -> None:
    """Save a pyspark.ml estimator/model (Java- or Python-backed) under path."""
    obj.save(path)


def load_instance(path: str):
    """Load an estimator/model of unknown class (reference:
    ``DefaultParamsReader.loadParamsInstance``, ``BoostingRegressor.scala:399-402``)."""
    spark = _active_spark()
    return DefaultParamsReader.loadParamsInstance(path, spark.sparkContext)


def save_json(path: str, obj: Dict[str, Any]) -> None:
    spark = _active_spark()
    spark.sparkContext.parallelize([json.dumps(obj)], 1).saveAsTextFile(path)


def load_json(path: str) -> Dict[str, Any]:
    spark = _active_spark()
    return json.loads("".join(spark.sparkContext.textFile(path).collect()))


class _FnWriter(MLWriter):
    def __init__(self, instance):
        super().__init__()
        self._instance = instance

    def saveImpl(self, path: str) -> None:
        self._instance._save_impl(path)


class _FnReader(MLReader):
    def __init__(self, cls):
        super().__init__()
        self._cls = cls

    def load(self, path: str):
        return self._cls._load_impl(path)


class EnsembleReadWrite(MLWritable, MLReadable):
    """Mixin wiring ``save``/``load`` to a class's ``_save_impl``/``_load_impl``."""

    def write(self) -> MLWriter:
        return _FnWriter(self)

    @classmethod
    def read(cls) -> MLReader:
        return _FnReader(cls)


def save_ensemble(
    instance,
    path: str,
    models: Sequence,
    data: Dict[str, Any],
    learner=None,
    learners: Optional[Sequence] = None,
    stacker=None,
    extra_meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Reference directory layout for fitted ensembles (SURVEY.md §3.3)."""
    meta = dict(extra_meta or {})
    meta["numModels"] = len(models)
    data = dict(data, numModels=len(models))
    save_metadata(instance, path, extra=meta)
    if learner is not None:
        save_instance(learner, f"{path}/learner")
    if learners is not None:
        for i, l in enumerate(learners):
            save_instance(l, f"{path}/learner-{i}")
        data = dict(data, numLearners=len(learners))
    if stacker is not None:
        save_instance(stacker, f"{path}/stacker")
    for i, m in enumerate(models):
        save_instance(m, f"{path}/model-{i}")
    save_json(f"{path}/data", data)


def load_ensemble(path: str):
    """Returns (metadata, data, models). Learner/stacker loaded on demand via
    ``load_instance(f"{path}/learner")`` etc."""
    metadata = load_metadata(path)
    data = load_json(f"{path}/data")
    n = int(data["numModels"])
    models = [load_instance(f"{path}/model-{i}") for i in range(n)]
    return metadata, data, models
