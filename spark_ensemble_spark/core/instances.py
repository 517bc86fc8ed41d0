"""Instance extraction — the DataFrame-native replacement for the reference's
``extractInstances(dataset) -> RDD[Instance]`` hop (e.g.
``/root/reference/core/src/main/scala/org/apache/spark/ml/regression/BaggingRegressor.scala:136``).

We never leave the DataFrame API: instances are just the three columns
``(label double, weight double, features vector)``, with weight defaulting to
1.0 — Catalyst prunes everything else at the parquet scan.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LABEL = "label"
WEIGHT = "weight"
FEATURES = "features"


def extract_instances(
    df: DataFrame,
    label_col: str,
    features_col: str,
    weight_col: Optional[str] = None,
) -> DataFrame:
    """Project to canonical ``(label, weight, features)`` columns.

    Raises the same kind of error the reference's schema validation does when a
    column is missing (``PredictorParams.validateAndTransformSchema``; negative
    test ``BoostingRegressorSuite.scala:169-181``).
    """
    cols = set(df.columns)
    for c in (label_col, features_col) + ((weight_col,) if weight_col else ()):
        if c not in cols:
            raise ValueError(f"Column '{c}' does not exist in {sorted(cols)}")
    weight = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    return df.select(
        F.col(label_col).cast("double").alias(LABEL),
        weight.alias(WEIGHT),
        F.col(features_col).alias(FEATURES),  # metadata rides along with the column
    )


def get_num_features(df: DataFrame, features_col: str) -> int:
    """numFeatures from ``ml_attr`` column metadata, falling back to one row.

    Reference reads it from metadata via ``MetadataUtils.getNumFeatures``
    (``BaggingRegressor.scala:139``); ``VectorAssembler`` always writes it.
    """
    meta = df.schema[features_col].metadata or {}
    ml_attr = meta.get("ml_attr") or {}
    n = ml_attr.get("num_attrs")
    if n is not None and int(n) > 0:
        return int(n)
    row = df.select(features_col).head()
    if row is None:
        raise ValueError("empty dataset: cannot infer numFeatures")
    return len(row[0])


def get_num_classes(df: DataFrame, label_col: str, max_num_classes: int = 100) -> int:
    """numClasses from label metadata if nominal, else max(label)+1, validating
    that labels are integral doubles in ``[0, K)`` in the same single pass.

    Reference: Spark's ``Classifier.getNumClasses`` + ``validateNumClasses`` /
    ``validateLabel`` (used at ``classification/BoostingClassifier.scala:152-157``).
    """
    meta = (df.schema[label_col].metadata or {}).get("ml_attr") or {}
    if meta.get("type") == "nominal":
        vals = meta.get("vals")
        if vals:
            return len(vals)
        if meta.get("num_vals"):
            return int(meta["num_vals"])

    row = df.select(
        F.max(F.col(label_col).cast("double")).alias("mx"),
        F.min(F.col(label_col).cast("double")).alias("mn"),
        F.sum(
            F.when(
                F.isnan(F.col(label_col).cast("double"))
                | (
                    F.col(label_col).cast("double")
                    != F.floor(F.col(label_col).cast("double"))
                ),
                1,
            ).otherwise(0)
        ).alias("bad"),
    ).head()
    if row is None or row["mx"] is None:
        raise ValueError("empty dataset: cannot infer numClasses")
    if row["bad"]:
        raise ValueError(
            "classification labels must be integral (non-NaN) doubles 0..K-1"
        )
    if row["mn"] < 0:
        raise ValueError(f"negative label {row['mn']}: labels must be in [0, K)")
    num_classes = int(row["mx"]) + 1
    if num_classes < 2:
        num_classes = 2  # single-class degenerate set still means binary space
    if num_classes > max_num_classes:
        raise ValueError(
            f"inferred numClasses={num_classes} exceeds maxNumClasses={max_num_classes}"
        )
    return num_classes
