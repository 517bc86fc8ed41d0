"""Shared Param mixins for the ensemble meta-estimators.

Re-expresses the reference's param traits
(``/root/reference/core/src/main/scala/org/apache/spark/ml/ensemble/ensembleParams.scala:17-193``,
``ensemble/HasSubBag.scala:27-86``, ``bagging/BaggingParams.scala``,
``boosting/BoostingParams.scala``, ``boosting/GBMParams.scala``,
``stacking/StackingParams.scala``) as idiomatic PySpark ``Params`` mixins.
"""

from __future__ import annotations

from pyspark.ml.param import Param, Params, TypeConverters


class HasBaseLearner(Params):
    """Param for the base estimator the meta-estimator fits copies of.

    Reference: ``ensemble/ensembleParams.scala:36-62`` (``HasBaseLearner``).
    """

    baseLearner: Param = Param(
        Params._dummy(),
        "baseLearner",
        "base estimator (a pyspark.ml Estimator producing a prediction column)",
    )

    def getBaseLearner(self):
        return self.getOrDefault(self.baseLearner)


class HasBaseLearners(Params):
    """Param for a heterogeneous list of base estimators (stacking).

    Reference: ``ensemble/ensembleParams.scala:107-146`` (``HasBaseLearners``).
    """

    baseLearners: Param = Param(
        Params._dummy(),
        "baseLearners",
        "list of base estimators fitted on the full dataset",
    )

    def getBaseLearners(self):
        return self.getOrDefault(self.baseLearners)


class HasStacker(Params):
    """Param for the meta-learner fitted on base-model predictions.

    Reference: ``ensemble/ensembleParams.scala:148-166`` (``HasStacker``).
    """

    stacker: Param = Param(
        Params._dummy(),
        "stacker",
        "meta estimator fitted on the vector of base-model predictions",
    )

    def getStacker(self):
        return self.getOrDefault(self.stacker)


class HasNumBaseLearners(Params):
    """Reference: ``ensemble/ensembleParams.scala:22-34``."""

    numBaseLearners: Param = Param(
        Params._dummy(),
        "numBaseLearners",
        "number of base learners (>=1)",
        typeConverter=TypeConverters.toInt,
    )

    def __init__(self) -> None:
        super().__init__()
        self._setDefault(numBaseLearners=10)

    def getNumBaseLearners(self) -> int:
        return self.getOrDefault(self.numBaseLearners)


class HasSubBag(Params):
    """Row-bootstrap × feature-subspace sampling params.

    Reference: ``ensemble/HasSubBag.scala:27-86``. The subspace draw itself
    lives in :mod:`spark_ensemble_spark.core.subbag`.
    """

    replacement: Param = Param(
        Params._dummy(),
        "replacement",
        "whether rows are sampled with replacement",
        typeConverter=TypeConverters.toBoolean,
    )

    subsampleRatio: Param = Param(
        Params._dummy(),
        "subsampleRatio",
        "ratio of rows sampled per base learner, in (0, 1]",
        typeConverter=TypeConverters.toFloat,
    )

    subspaceRatio: Param = Param(
        Params._dummy(),
        "subspaceRatio",
        "ratio of features drawn per base learner, in (0, 1]",
        typeConverter=TypeConverters.toFloat,
    )

    def __init__(self) -> None:
        super().__init__()
        self._setDefault(replacement=True, subsampleRatio=1.0, subspaceRatio=1.0)

    def getReplacement(self) -> bool:
        return self.getOrDefault(self.replacement)

    def getSubsampleRatio(self) -> float:
        return self.getOrDefault(self.subsampleRatio)

    def getSubspaceRatio(self) -> float:
        return self.getOrDefault(self.subspaceRatio)


class HasVotingStrategy(Params):
    """Voting strategy for prediction combination.

    Reference: ``classification/BaggingClassifier.scala:55-67`` (hard/soft) and
    ``regression/BoostingRegressor.scala:73-86`` (median/mean); validation of
    the allowed set is done by each estimator.
    """

    votingStrategy: Param = Param(
        Params._dummy(),
        "votingStrategy",
        "how base predictions are combined",
        typeConverter=TypeConverters.toString,
    )

    def getVotingStrategy(self) -> str:
        return self.getOrDefault(self.votingStrategy).lower()
