"""Skew-mitigation helpers for hot-key joins.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
:func:`spark_ensemble_spark.session.get_spark`) handles sort-merge skew at
runtime; explicit salting remains the tool when the small side must be
replicated deterministically (e.g. streaming joins, or pre-AQE engines).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``large`` has skewed keys: the large side gets a random
    salt in [0, salt), the small side is exploded ``salt`` times, and the join
    key becomes (key, salt) — one hot key now spreads across ``salt``
    reducers. The small side grows by ``salt``× (keep it broadcast-sized)."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join does not support how='{how}': the exploded small side "
            "would duplicate unmatched rows in right/full outer joins"
        )
    salted_large = large.withColumn(
        "__salt", (F.rand(seed=0) * salt).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_large.join(salted_small, on=[on, "__salt"], how=how)
    return out.drop("__salt")
