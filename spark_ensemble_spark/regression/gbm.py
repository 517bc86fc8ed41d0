"""GBMRegressor — Friedman gradient-boosting machine over any Spark ML regressor.

Semantic parity with
``/root/reference/core/src/main/scala/org/apache/spark/ml/regression/GBMRegressor.scala:164-539``:

* init model: ``constant`` (Dummy mean/median/quantile(α) per loss), ``zero``,
  or ``base`` (fit the base learner on raw labels);
* per iteration: optional huber δ re-estimation (α-quantile of |residual|),
  SubBag draw, gradient or Newton (hessian-scaled label + hessian weight,
  floored at 1e-2) pseudo-residuals, base fit, optional Brent line-search of
  the step size in [0, 100], shrinkage by ``learningRate``, running-prediction
  update;
* early stopping on a validation split with tolerance ``validationTol`` and
  patience ``numRounds``; the final model keeps ``i − v`` members.

DataFrame-native: the running prediction is a ``__gpred`` column; each Brent
evaluation is ONE whole-stage-codegen'd ``agg`` over the cached bag (the
reference pays an ``RDDLossFunction`` pass per evaluation — same job count,
but our rows never leave Tungsten).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

from pyspark.ml.base import Estimator
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ensemble_spark.boosting.gbm_params import GBMParams
from spark_ensemble_spark.boosting.losses import GBMLoss, regression_loss
from spark_ensemble_spark.core.base import (
    EnsembleRegressionModel,
    PredictorParams,
    score_base_models,
)
from spark_ensemble_spark.core.instances import extract_instances, get_num_features
from spark_ensemble_spark.core.instrumentation import FitInstrumentation
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
from spark_ensemble_spark.core.optim import minimize_scalar_batched
from spark_ensemble_spark.core.subbag import draw_subspace, sample_bag, slice_features
from spark_ensemble_spark.core.utils import DFIterationCache, fit_base_learner

_LOSSES = ("squared", "absolute", "huber", "quantile", "logcosh", "scaledlogcosh")
_INIT = ("constant", "zero", "base")


class _GBMRegressorParams(PredictorParams, GBMParams):
    loss: Param = Param(
        Params._dummy(),
        "loss",
        f"GBM loss, one of {_LOSSES}",
        typeConverter=TypeConverters.toString,
    )

    def __init__(self) -> None:
        super().__init__()
        self._setDefault(loss="squared", initStrategy="constant", alpha=0.9)

    def getLoss(self) -> str:
        v = self.getOrDefault(self.loss).lower()
        if v not in _LOSSES:
            raise ValueError(f"loss must be one of {_LOSSES}, got {v}")
        return v


class GBMRegressor(Estimator, _GBMRegressorParams, EnsembleReadWrite):
    def __init__(self, **kwargs) -> None:
        super().__init__()
        if "baseLearner" in kwargs:
            self.set(self.baseLearner, kwargs.pop("baseLearner"))
        self._set(**kwargs)

    def setParams(self, **kwargs) -> "GBMRegressor":
        if "baseLearner" in kwargs:
            self.set(self.baseLearner, kwargs.pop("baseLearner"))
        self._set(**kwargs)
        return self

    def setBaseLearner(self, v) -> "GBMRegressor":
        return self.setParams(baseLearner=v)

    def setNumBaseLearners(self, v: int) -> "GBMRegressor":
        return self.setParams(numBaseLearners=v)

    def setLoss(self, v: str) -> "GBMRegressor":
        return self.setParams(loss=v)

    def setAlpha(self, v: float) -> "GBMRegressor":
        return self.setParams(alpha=v)

    def setInitStrategy(self, v: str) -> "GBMRegressor":
        return self.setParams(initStrategy=v)

    def setLearningRate(self, v: float) -> "GBMRegressor":
        return self.setParams(learningRate=v)

    def setOptimizedWeights(self, v: bool) -> "GBMRegressor":
        return self.setParams(optimizedWeights=v)

    def setUpdates(self, v: str) -> "GBMRegressor":
        return self.setParams(updates=v)

    def setMaxIter(self, v: int) -> "GBMRegressor":
        return self.setParams(maxIter=v)

    def setTol(self, v: float) -> "GBMRegressor":
        return self.setParams(tol=v)

    def setSubsampleRatio(self, v: float) -> "GBMRegressor":
        return self.setParams(subsampleRatio=v)

    def setSubspaceRatio(self, v: float) -> "GBMRegressor":
        return self.setParams(subspaceRatio=v)

    def setReplacement(self, v: bool) -> "GBMRegressor":
        return self.setParams(replacement=v)

    def setValidationIndicatorCol(self, v: str) -> "GBMRegressor":
        return self.setParams(validationIndicatorCol=v)

    def setValidationTol(self, v: float) -> "GBMRegressor":
        return self.setParams(validationTol=v)

    def setNumRounds(self, v: int) -> "GBMRegressor":
        return self.setParams(numRounds=v)

    def setCheckpointInterval(self, v: int) -> "GBMRegressor":
        return self.setParams(checkpointInterval=v)

    def setAggregationDepth(self, v: int) -> "GBMRegressor":
        """Accepted for reference API parity; no-op under DataFrame aggs."""
        return self.setParams(aggregationDepth=v)

    def setSeed(self, v: int) -> "GBMRegressor":
        return self.setParams(seed=v)

    def setWeightCol(self, v: str) -> "GBMRegressor":
        return self.setParams(weightCol=v)

    def setLabelCol(self, v: str) -> "GBMRegressor":
        return self.setParams(labelCol=v)

    def setFeaturesCol(self, v: str) -> "GBMRegressor":
        return self.setParams(featuresCol=v)

    # ------------------------------------------------------------------

    def _fit_init_model(self, train: DataFrame, loss_name: str):
        """Init strategies (``GBMRegressor.scala:287-303``)."""
        from spark_ensemble_spark.regression.dummy import DummyRegressor

        strategy = self.getInitStrategy()
        if strategy not in _INIT:
            raise ValueError(f"initStrategy must be one of {_INIT}")
        if strategy == "base":
            return fit_base_learner(
                self.getBaseLearner(), train, "label", "features", "__init_pred",
                weight_col="weight",
            )
        if strategy == "zero":
            dummy = DummyRegressor(strategy="constant", constant=0.0)
        else:
            if loss_name == "squared":
                dummy = DummyRegressor(strategy="mean")
            elif loss_name in ("absolute", "huber", "logcosh", "scaledlogcosh"):
                # logcosh behaves like a smoothed absolute loss; its sum is
                # minimized near the median, the same robust init the
                # absolute/huber branch uses
                dummy = DummyRegressor(strategy="median")
            else:
                dummy = DummyRegressor(strategy="quantile", quantile=self.getAlpha())
        return fit_base_learner(
            dummy, train, "label", "features", "__init_pred", weight_col="weight"
        )

    def _fit(self, df: DataFrame) -> "GBMRegressionModel":
        self._validate_input(df, fitting=True)
        loss_name = self.getLoss()
        alpha = self.getAlpha()
        tol = self.getOrDefault(self.tol)
        max_iter = self.getOrDefault(self.maxIter)
        num_learners = self.getNumBaseLearners()
        learning_rate = self.getLearningRate()
        newton = self.getUpdates() == "newton"
        seed = self.getOrDefault(self.seed)

        val_col = self._validation_col_or_none()
        base = df
        if val_col is not None:
            train_raw = base.filter(~F.col(val_col))
            val_raw = base.filter(F.col(val_col))
        else:
            train_raw, val_raw = base, None

        train = extract_instances(
            train_raw, self.getLabelCol(), self.getFeaturesCol(), self._weight_col_or_none()
        )
        num_features = get_num_features(train, "features")

        # δ for huber starts as the α-quantile of the label (reference :305-308)
        delta = None
        if loss_name == "huber":
            delta = train.select(F.col("label").alias("__l")).stat.approxQuantile(
                "__l", [alpha], tol
            )[0]

        def current_loss() -> GBMLoss:
            return regression_loss(loss_name, alpha, quantile_delta=delta)

        init = self._fit_init_model(train, loss_name)

        cache = DFIterationCache(self.getOrDefault(self.checkpointInterval))
        val_cache = DFIterationCache(self.getOrDefault(self.checkpointInterval))

        state = init.transform(
            train, {init.getParam("predictionCol"): "__gpred"}
        ).select("label", "weight", "features", "__gpred")
        state = cache.update(state)

        val_state = None
        best_val_error = 0.0
        if val_raw is not None:
            val = extract_instances(
                val_raw, self.getLabelCol(), self.getFeaturesCol(), self._weight_col_or_none()
            )
            val_state = init.transform(
                val, {init.getParam("predictionCol"): "__gpred"}
            ).select("label", "weight", "features", "__gpred")
            val_state = val_cache.update(val_state)
            gl = current_loss()
            best_val_error = (
                val_state.agg(
                    F.avg(gl.loss(F.col("label"), F.col("__gpred")))
                ).first()[0]
                or 0.0
            )

        instr = FitInstrumentation(self.uid, num_learners)
        models: List = []
        subspaces: List[List[int]] = []
        weights: List[float] = []

        try:
            i = 0
            v = 0
            while i < num_learners and v < self.getNumRounds():
                if loss_name == "huber":
                    delta = (
                        state.select(
                            F.abs(F.col("label") - F.col("__gpred")).alias("__r")
                        ).stat.approxQuantile("__r", [alpha], tol)[0]
                    )
                gl = current_loss()

                subspace = draw_subspace(self.getSubspaceRatio(), num_features, seed + i)
                bag = sample_bag(
                    state, self.getReplacement(), self.getSubsampleRatio(), seed + i
                )
                bag, fcol = slice_features(bag, "features", subspace, num_features, "__sf")

                neg_grad = gl.neg_gradient(F.col("label"), F.col("__gpred"))
                persisted_bag = None
                if newton and gl.has_hessian:
                    persisted_bag = bag.withColumn(
                        "__hess",
                        F.greatest(
                            gl.hessian(F.col("label"), F.col("__gpred")), F.lit(1e-2)
                        ),
                    ).persist()
                    sum_hess = persisted_bag.agg(F.sum("__hess")).first()[0]
                    bag = persisted_bag.withColumn(
                        "__target", neg_grad / F.col("__hess")
                    ).withColumn(
                        "__w",
                        0.5 * F.col("__hess") / F.lit(sum_hess) * F.col("weight"),
                    )
                else:
                    bag = bag.withColumn("__target", neg_grad).withColumn(
                        "__w", F.col("weight")
                    )

                model = fit_base_learner(
                    self.getBaseLearner(), bag, "__target", fcol, "__dir", weight_col="__w"
                )
                if persisted_bag is not None:
                    persisted_bag.unpersist()

                if self.getOptimizedWeights():
                    opt_df = model.transform(bag).select(
                        "label", "weight", "__gpred", F.col("__dir")
                    )
                    opt_df = opt_df.persist()
                    opt_df.count()

                    def objective_batch(xs):
                        # ONE agg evaluates every candidate step size — a grid
                        # of loss sums instead of Brent's sequential passes
                        # (each pass is a full scan of the bag at scale).
                        # DELIBERATE DEVIATION from the reference: the
                        # objective is the WEIGHTED mean loss Σ(w·loss)/Σw,
                        # while GBMLossAggregator accumulates loss unweighted
                        # and divides by weightSum — so step sizes differ from
                        # the reference when weightCol is set. Weighted is the
                        # consistent choice (the gradient the base learner
                        # fits is weighted the same way).
                        if gl.loss_sql("label", "__p") is not None:
                            # one selectExpr builds the whole grid in a single
                            # Py4J roundtrip (the Column form costs ~10
                            # roundtrips per operator per candidate — measured
                            # ~25% of the fit's wall clock); the SQL mirrors
                            # parse to the same expressions
                            exprs = ["sum(weight) AS sw"] + [
                                "sum(weight * ({})) AS l{}".format(
                                    gl.loss_sql(
                                        "label",
                                        "__gpred + CAST('{!r}' AS DOUBLE) * __dir".format(
                                            float(x)
                                        ),
                                    ),
                                    k,
                                )
                                for k, x in enumerate(xs)
                            ]
                            row = opt_df.selectExpr(*exprs).first()
                        else:
                            row = opt_df.agg(
                                F.sum("weight").alias("sw"),
                                *[
                                    F.sum(
                                        F.col("weight")
                                        * gl.loss(
                                            F.col("label"),
                                            F.col("__gpred")
                                            + F.lit(float(x)) * F.col("__dir"),
                                        )
                                    ).alias(f"l{k}")
                                    for k, x in enumerate(xs)
                                ],
                            ).first()
                        sw = row["sw"] or 1.0
                        return [(row[k + 1] or 0.0) / sw for k in range(len(xs))]

                    solution = minimize_scalar_batched(objective_batch, 0.0, 100.0)
                    opt_df.unpersist()
                else:
                    solution = 1.0
                weight = learning_rate * solution

                models.append(model)
                subspaces.append(list(subspace))
                weights.append(weight)

                # Update running predictions over the FULL training set.
                full, full_fcol = slice_features(
                    state, "features", subspace, num_features, "__sf"
                )
                scored = model.transform(
                    full, {model.getParam("featuresCol"): full_fcol,
                           model.getParam("predictionCol"): "__dir"}
                )
                state = scored.withColumn(
                    "__gpred", F.col("__gpred") + F.lit(weight) * F.col("__dir")
                ).select("label", "weight", "features", "__gpred")
                state = cache.update(state)

                if val_state is not None:
                    vfull, vfcol = slice_features(
                        val_state, "features", subspace, num_features, "__sf"
                    )
                    vscored = model.transform(
                        vfull, {model.getParam("featuresCol"): vfcol,
                                model.getParam("predictionCol"): "__dir"}
                    )
                    val_state = vscored.withColumn(
                        "__gpred", F.col("__gpred") + F.lit(weight) * F.col("__dir")
                    ).select("label", "weight", "features", "__gpred")
                    val_state = val_cache.update(val_state)
                    val_error = (
                        val_state.agg(
                            F.avg(gl.loss(F.col("label"), F.col("__gpred")))
                        ).first()[0]
                        or 0.0
                    )
                    # Early-stopping bookkeeping (reference :444-465).
                    if best_val_error - val_error < self.getValidationTol() * max(
                        val_error, 0.01
                    ):
                        v += 1
                    elif val_error < best_val_error:
                        best_val_error = val_error
                        v = 0
                    instr.iteration(
                        i, step=solution, weight=weight, val_error=val_error
                    )
                else:
                    instr.iteration(i, step=solution, weight=weight)

                i += 1
        finally:
            cache.close()
            val_cache.close()

        instr.done(i, f"kept {i - v if val_state is not None else i}")
        keep = i - v if val_state is not None else i
        model = GBMRegressionModel(
            weights=weights[:keep],
            subspaces=subspaces[:keep],
            models=models[:keep],
            init_model=init,
            num_features=num_features,
        )
        model._resetUid(self.uid + "_model")
        self._copyValues(model)
        return model

    def _save_impl(self, path: str) -> None:
        save_metadata(self, path)
        save_instance(self.getBaseLearner(), f"{path}/learner")

    @classmethod
    def _load_impl(cls, path: str) -> "GBMRegressor":
        meta = load_metadata(path)
        inst = cls()
        set_params_from_metadata(inst, meta)
        inst.set(inst.baseLearner, load_instance(f"{path}/learner"))
        return inst


class GBMRegressionModel(EnsembleRegressionModel, _GBMRegressorParams, EnsembleReadWrite):
    def __init__(
        self,
        weights: Optional[Sequence[float]] = None,
        subspaces: Optional[Sequence[Sequence[int]]] = None,
        models: Optional[Sequence] = None,
        init_model=None,
        num_features: int = 0,
    ) -> None:
        super().__init__()
        self.weights = [float(w) for w in (weights or [])]
        self.subspaces = [list(s) for s in (subspaces or [])]
        self.models = list(models or [])
        self.init = init_model
        self.numFeatures = int(num_features)

    @property
    def numModels(self) -> int:
        return len(self.models)

    def _prediction_setup(self, df: DataFrame):
        init_col = "__gbm_init"
        overrides = {self.init.getParam("predictionCol"): init_col}
        if self.init.hasParam("featuresCol"):
            overrides[self.init.getParam("featuresCol")] = self.getFeaturesCol()
        df = self.init.transform(df, overrides)
        tmp = [init_col]
        df, outs, tmp2 = score_base_models(
            df,
            self.getFeaturesCol(),
            self.models,
            self.subspaces,
            self.numFeatures,
            prefix="__gbm_",
        )
        pred = F.col(init_col)
        for o, w in zip(outs, self.weights):
            pred = pred + F.lit(w) * F.col(o["prediction"])
        return df, pred, tmp + tmp2

    def copy(self, extra=None) -> "GBMRegressionModel":
        copied = GBMRegressionModel(
            self.weights, self.subspaces, self.models, self.init, self.numFeatures
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
                "subspaces": self.subspaces,
                "numFeatures": self.numFeatures,
            },
        )
        save_instance(self.init, f"{path}/init")

    @classmethod
    def _load_impl(cls, path: str) -> "GBMRegressionModel":
        metadata, data, models = load_ensemble(path)
        init = load_instance(f"{path}/init")
        inst = cls(data["weights"], data["subspaces"], models, init, data["numFeatures"])
        inst._resetUid(metadata["uid"])
        set_params_from_metadata(inst, metadata)
        return inst
