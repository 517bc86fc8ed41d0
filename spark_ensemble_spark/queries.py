"""Query/operator registry backing ``__spark_entry__.py``.

Every implemented operator gets a ``SPARK_QUERIES`` entry (PySpark DataFrame
program) and, where ANSI-SQL-expressible, an ``ORACLES`` entry (equivalent
DuckDB SQL). Column aliases and rounding are kept identical on both sides —
the driver hashes values after sorting columns by name.

Registry sections: relational (joins/aggs/windows), ML estimators (the SURVEY
§2 inventory — deterministic Dummy-based configs get true SQL oracles, the
stochastic tree-based configs are rows-only), text analysis, dedup,
similarity search, streaming.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ensemble_spark.sources.datasets import (
    binary_dataset,
    load_table,
    multiclass_dataset,
    regression_dataset,
)

SPARK_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}

REVENUE = F.col("l_extendedprice") * (1 - F.col("l_discount"))
REVENUE_SQL = "l_extendedprice * (1 - l_discount)"


def query(name: str, oracle: str | None = None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Relational core (scan → filter → join → agg → window → rollup).
# These exercise the dataflow vocabulary of SURVEY.md §2.4 at full scale:
# group-bys shuffle on their keys, small dims are broadcast, filters and
# column pruning reach the parquet scan.
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum({REVENUE_SQL}), 2) AS sum_disc_price,
           round(sum({REVENUE_SQL} * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(REVENUE), 2).alias("sum_disc_price"),
        F.round(F.sum(REVENUE * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q3_top_revenue_orders",
    f"""
    SELECT o_orderkey, round(sum({REVENUE_SQL}), 2) AS revenue, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderpriority
    ORDER BY sum({REVENUE_SQL}) DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(
        F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
        li.l_orderkey == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("o_orderkey", "o_orderpriority")
        .agg(F.sum(REVENUE).alias("__rev"))
        .orderBy(F.desc("__rev"), "o_orderkey")
        .limit(10)
        .select(
            "o_orderkey", F.round("__rev", 2).alias("revenue"), "o_orderpriority"
        )
    )


@query(
    "q5_nation_revenue",
    f"""
    SELECT n_name, round(sum({REVENUE_SQL}), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('EUROPE', 'ASIA')
    GROUP BY n_name
    """,
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("EUROPE", "ASIA")
    )
    joined = (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == supp.s_suppkey)
            & (F.col("c_nationkey") == supp.s_nationkey),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(F.round(F.sum(REVENUE), 2).alias("revenue"))


@query(
    "topk_orders_per_priority",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@query(
    "revenue_rollup",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_extendedprice), 2) AS sum_price,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
        "sum_price",
        "n",
    )


@query(
    "events_hourly",
    """
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# ML estimators (SURVEY.md §2.1). Deterministic Dummy-based configurations
# carry true SQL oracles that validate the fit/transform plumbing end-to-end;
# the stochastic tree-based configurations are registered as rows-only checks
# when they land.
# ---------------------------------------------------------------------------

_EXACT_QUANTILE_ORACLE = """
    SELECT round(label, 6) AS prediction
    FROM (
      SELECT label,
             row_number() OVER (ORDER BY label) AS rn,
             count(*) OVER () AS n
      FROM (SELECT {expr} AS label FROM lineitem)
    )
    WHERE rn = CAST(ceil({q} * n) AS BIGINT)
"""


@query(
    "dummy_mean_regressor",
    f"SELECT round(avg({REVENUE_SQL}), 6) AS prediction FROM lineitem",
)
def dummy_mean_regressor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_ensemble_spark import DummyRegressor

    ds = regression_dataset(spark, sf_dir)
    model = DummyRegressor(strategy="mean").fit(ds)
    return (
        model.transform(ds)
        .select(F.round("prediction", 6).alias("prediction"))
        .distinct()
    )


@query(
    "dummy_median_regressor",
    _EXACT_QUANTILE_ORACLE.format(expr=REVENUE_SQL, q=0.5),
)
def dummy_median_regressor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_ensemble_spark import DummyRegressor

    ds = regression_dataset(spark, sf_dir)
    model = DummyRegressor(strategy="median", tol=0.0).fit(ds)
    return (
        model.transform(ds)
        .select(F.round("prediction", 6).alias("prediction"))
        .distinct()
    )


@query(
    "dummy_quantile_regressor",
    _EXACT_QUANTILE_ORACLE.format(expr=REVENUE_SQL, q=0.9),
)
def dummy_quantile_regressor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_ensemble_spark import DummyRegressor

    ds = regression_dataset(spark, sf_dir)
    model = DummyRegressor(strategy="quantile", quantile=0.9, tol=0.0).fit(ds)
    return (
        model.transform(ds)
        .select(F.round("prediction", 6).alias("prediction"))
        .distinct()
    )


@query(
    "dummy_prior_classifier",
    """
    SELECT CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS DOUBLE) AS class,
           round(count(*) * 1.0 / (SELECT count(*) FROM lineitem), 6) AS prior
    FROM lineitem
    GROUP BY 1
    """,
)
def dummy_prior_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_ensemble_spark import DummyClassifier

    ds = binary_dataset(spark, sf_dir)
    model = DummyClassifier(strategy="prior").fit(ds)
    rows = [(float(c), round(p, 6)) for c, p in enumerate(model.probability)]
    return spark.createDataFrame(rows, "class double, prior double")


@query(
    "bagging_dummy_mean_regressor",
    f"SELECT round(avg({REVENUE_SQL}), 6) AS prediction FROM lineitem",
)
def bagging_dummy_mean_regressor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bagging config (no row/feature sampling, Dummy(mean) base):
    every base model predicts the label mean, so the bagged mean equals
    avg(label) — a true SQL oracle for the fit→sample→slice→combine plumbing."""
    from spark_ensemble_spark import DummyRegressor
    from spark_ensemble_spark.regression.bagging import BaggingRegressor

    ds = regression_dataset(spark, sf_dir)
    model = BaggingRegressor(
        baseLearner=DummyRegressor(strategy="mean"),
        numBaseLearners=3,
        replacement=False,
        subsampleRatio=1.0,
        subspaceRatio=1.0,
    ).fit(ds)
    return (
        model.transform(ds)
        .select(F.round("prediction", 6).alias("prediction"))
        .distinct()
    )


@query(
    "bagging_dummy_prior_classifier",
    """
    SELECT prediction FROM (
      SELECT CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS DOUBLE) AS prediction,
             count(*) AS c
      FROM lineitem GROUP BY 1 ORDER BY c DESC, prediction ASC LIMIT 1
    )
    """,
)
def bagging_dummy_prior_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-vote bagging over identical prior classifiers predicts the modal
    class (argmax ties break to the lowest label, like Vector.argmax)."""
    from spark_ensemble_spark import DummyClassifier
    from spark_ensemble_spark.classification.bagging import BaggingClassifier

    ds = binary_dataset(spark, sf_dir)
    model = BaggingClassifier(
        baseLearner=DummyClassifier(strategy="prior"),
        numBaseLearners=3,
        replacement=False,
        subsampleRatio=1.0,
        subspaceRatio=1.0,
        votingStrategy="hard",
    ).fit(ds)
    return model.transform(ds).select("prediction").distinct()


@query("bagging_tree_regressor")
def bagging_tree_regressor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic config (rows-only check): 10 depth-5 trees on SubBags."""
    from pyspark.ml.regression import DecisionTreeRegressor

    from spark_ensemble_spark.regression.bagging import BaggingRegressor

    train, test = regression_dataset(spark, sf_dir).randomSplit([0.8, 0.2], seed=0)
    model = BaggingRegressor(
        baseLearner=DecisionTreeRegressor(maxDepth=5),
        numBaseLearners=10,
        subsampleRatio=0.8,
        subspaceRatio=0.8,
        parallelism=4,
        seed=3,
    ).fit(train)
    out = model.transform(test)
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sqrt(F.avg((F.col("prediction") - F.col("label")) ** 2)), 2
        ).alias("rmse"),
    )


@query("bagging_tree_classifier")
def bagging_tree_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic config (rows-only check): soft-voted depth-5 trees."""
    from pyspark.ml.classification import DecisionTreeClassifier

    from spark_ensemble_spark.classification.bagging import BaggingClassifier

    train, test = multiclass_dataset(spark, sf_dir).randomSplit([0.8, 0.2], seed=0)
    model = BaggingClassifier(
        baseLearner=DecisionTreeClassifier(maxDepth=5),
        numBaseLearners=10,
        subsampleRatio=0.8,
        subspaceRatio=0.8,
        votingStrategy="soft",
        parallelism=4,
        seed=3,
    ).fit(train)
    out = model.transform(test)
    return out.groupBy("prediction").agg(F.count(F.lit(1)).alias("n"))


@query(
    "boosting_dummy_median_regressor",
    f"SELECT round(avg({REVENUE_SQL}), 6) AS prediction FROM lineitem",
)
def boosting_dummy_median_regressor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic AdaBoost.R2 config: every round's Dummy(mean) base model
    predicts avg(label), so the weighted median of identical values is
    avg(label) regardless of how many rounds run — a true SQL oracle for the
    sequential reweighting loop."""
    from spark_ensemble_spark import DummyRegressor
    from spark_ensemble_spark.regression.boosting import BoostingRegressor

    ds = regression_dataset(spark, sf_dir)
    model = BoostingRegressor(
        baseLearner=DummyRegressor(strategy="mean"), numBaseLearners=3
    ).fit(ds)
    return (
        model.transform(ds)
        .select(F.round("prediction", 6).alias("prediction"))
        .distinct()
    )


@query("boosting_tree_regressor")
def boosting_tree_regressor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic AdaBoost.R2 (rows-only check): depth-5 trees."""
    from pyspark.ml.regression import DecisionTreeRegressor

    from spark_ensemble_spark.regression.boosting import BoostingRegressor

    train, test = regression_dataset(spark, sf_dir).randomSplit([0.7, 0.3], seed=0)
    model = BoostingRegressor(
        baseLearner=DecisionTreeRegressor(maxDepth=5), numBaseLearners=5
    ).fit(train)
    return model.transform(test).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sqrt(F.avg((F.col("prediction") - F.col("label")) ** 2)), 2
        ).alias("rmse"),
    )


@query("boosting_tree_classifier")
def boosting_tree_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMME.R over depth-5 trees (rows-only check)."""
    from pyspark.ml.classification import DecisionTreeClassifier

    from spark_ensemble_spark.classification.boosting import BoostingClassifier

    train, test = multiclass_dataset(spark, sf_dir).randomSplit([0.7, 0.3], seed=0)
    model = BoostingClassifier(
        baseLearner=DecisionTreeClassifier(maxDepth=5),
        numBaseLearners=5,
        algorithm="real",
    ).fit(train)
    return model.transform(test).groupBy("prediction").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "gbm_dummy_mean_regressor",
    f"SELECT round(avg({REVENUE_SQL}), 6) AS prediction FROM lineitem",
)
def gbm_dummy_mean_regressor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GBM config: init=constant(mean) under squared loss, and a
    Dummy(mean) base learner fit on pseudo-residuals predicts the residual mean
    (0), so every boosting step is a no-op and the final prediction is exactly
    avg(label) — a true SQL oracle for the full GBM loop."""
    from spark_ensemble_spark import DummyRegressor
    from spark_ensemble_spark.regression.gbm import GBMRegressor

    ds = regression_dataset(spark, sf_dir)
    model = GBMRegressor(
        baseLearner=DummyRegressor(strategy="mean"),
        numBaseLearners=2,
        optimizedWeights=False,
    ).fit(ds)
    return (
        model.transform(ds)
        .select(F.round("prediction", 6).alias("prediction"))
        .distinct()
    )


@query("gbm_tree_regressor")
def gbm_tree_regressor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic GBM over depth-5 trees (rows-only check)."""
    from pyspark.ml.regression import DecisionTreeRegressor

    from spark_ensemble_spark.regression.gbm import GBMRegressor

    train, test = regression_dataset(spark, sf_dir).randomSplit([0.7, 0.3], seed=0)
    model = GBMRegressor(
        baseLearner=DecisionTreeRegressor(maxDepth=5),
        numBaseLearners=5,
        learningRate=0.3,
    ).fit(train)
    return model.transform(test).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sqrt(F.avg((F.col("prediction") - F.col("label")) ** 2)), 2
        ).alias("rmse"),
    )


@query("gbm_tree_classifier")
def gbm_tree_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass GBM (logloss, K regressors per round; rows-only check)."""
    from pyspark.ml.regression import DecisionTreeRegressor

    from spark_ensemble_spark.classification.gbm import GBMClassifier

    train, test = multiclass_dataset(spark, sf_dir).randomSplit([0.7, 0.3], seed=0)
    model = GBMClassifier(
        baseLearner=DecisionTreeRegressor(maxDepth=5),
        numBaseLearners=2,
        loss="logloss",
        parallelism=3,
        learningRate=0.5,
    ).fit(train)
    return model.transform(test).groupBy("prediction").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "stacking_dummy_regressor",
    f"SELECT round(avg({REVENUE_SQL}), 4) AS prediction FROM lineitem",
)
def stacking_dummy_regressor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stacking config: both Dummy bases emit constant columns;
    a linear-regression stacker over constant features reduces to its
    intercept = weighted label mean. Validates fit→meta-features→stacker
    plumbing against a SQL oracle."""
    from pyspark.ml.regression import LinearRegression

    from spark_ensemble_spark import DummyRegressor
    from spark_ensemble_spark.regression.stacking import StackingRegressor

    ds = regression_dataset(spark, sf_dir)
    model = StackingRegressor(
        baseLearners=[DummyRegressor(strategy="mean"), DummyRegressor(strategy="median")],
        stacker=LinearRegression(),
    ).fit(ds)
    return (
        model.transform(ds)
        .select(F.round("prediction", 4).alias("prediction"))
        .distinct()
    )


@query("stacking_tree_classifier")
def stacking_tree_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous stacking with probability meta-features (rows-only)."""
    from pyspark.ml.classification import DecisionTreeClassifier, LogisticRegression

    from spark_ensemble_spark.classification.stacking import StackingClassifier

    train, test = multiclass_dataset(spark, sf_dir).randomSplit([0.8, 0.2], seed=0)
    model = StackingClassifier(
        baseLearners=[
            DecisionTreeClassifier(maxDepth=5),
            DecisionTreeClassifier(maxDepth=10),
        ],
        stacker=LogisticRegression(maxIter=20),
        stackMethod="proba",
        parallelism=2,
    ).fit(train)
    return model.transform(test).groupBy("prediction").agg(
        F.count(F.lit(1)).alias("n")
    )
