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


def hot_key_salt_plan(
    df: DataFrame,
    key_col: str,
    rows_per_task: int = 100_000,
    top_n: int = 20,
) -> dict:
    """Pre-flight salt plan from :func:`~spark_ensemble_spark.functions.\
stats.key_skew_profile`: ``{stringified key: salt_factor}`` for the heavy
    hitters whose row count exceeds ``rows_per_task`` (salt_factor > 1).
    Driver state is bounded by ``top_n`` — the heavy-hitter histogram, never
    the key domain. An empty dict means no key needs salting and callers
    should take the plain-join path.

    This is the TRIMMED pre-flight (one groupBy(count) with map-side
    partials + a heavy-hitter filter + TakeOrdered — a single job): the
    salt plan needs only per-key counts, not `key_skew_profile`'s
    share/rank/totals diagnostics, and iterative callers (``dup_clusters``
    pays this once per resolution) shouldn't fund the broadcast-totals
    pass they don't read."""
    counts = (
        df.groupBy(F.col(key_col).cast("string").alias("__k"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
        # NULL keys never survive an inner equi-join, and a None dict key
        # would be stringified to 'None' by salted_join_hot_keys — salting
        # unrelated literal-'None' keys while misreporting NULL-key skew
        # (ADVICE r8). AQE's skew split still covers NULL-heavy frames.
        .filter(F.col("__k").isNotNull() & (F.col("__cnt") > rows_per_task))
        .orderBy(F.desc("__cnt"), F.asc("__k"))
        .limit(top_n)
    )
    rpt = int(rows_per_task)
    return {
        r["__k"]: int((r["__cnt"] + rpt - 1) // rpt) for r in counts.collect()
    }


def salted_join_hot_keys(
    large: DataFrame,
    small: DataFrame,
    large_key: str,
    small_key: str,
    plan: dict,
) -> DataFrame:
    """Inner equi-join with TARGETED salting of the ``plan``'s hot keys only
    (the split-hot-keys strategy): hot ``large`` rows get a deterministic
    content-hash salt in ``[0, nsalt)``, hot ``small`` rows replicate
    ``nsalt``× with every salt value, cold keys join unsalted — so one hot
    key's rows spread across ``nsalt`` reducers while the rest of the join
    (and the small side's size) is untouched, unlike a uniform
    :func:`salted_join` which replicates the ENTIRE small side.

    ``plan`` maps STRINGIFIED key values (the
    :func:`hot_key_salt_plan` convention) to their salt factor. The salt is
    ``pmod(xxhash64(<all large columns>), nsalt)`` — a pure function of row
    content, so retries and repartitioning cannot move a row between salt
    buckets. Column names must be disjoint between the two sides (the
    result carries both sides' columns, like a plain ``join``)."""
    # contract check BEFORE the empty-plan fast path: the disjoint-column
    # requirement must not depend on whether the data happened to contain
    # hot keys (ADVICE r8 — a data-dependent raise is a landmine)
    if set(large.columns) & set(small.columns):
        raise ValueError(
            "salted_join_hot_keys needs disjoint column names, got overlap: "
            f"{sorted(set(large.columns) & set(small.columns))}"
        )
    if not plan:
        return large.join(
            small, F.col(large_key) == F.col(small_key), "inner"
        )
    spark = large.sparkSession
    from spark_ensemble_spark.sources.datasets import local_df

    pf = local_df(
        spark, [(str(k), int(n)) for k, n in plan.items()], "__hk string, __ns int"
    )
    lk, sk = F.col(large_key).cast("string"), F.col(small_key).cast("string")
    hot_l = (
        large.join(F.broadcast(pf), lk == F.col("__hk"))
        .withColumn(
            "__lsalt",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in large.columns]), F.col("__ns")
            ).cast("int"),
        )
        .drop("__hk", "__ns")
    )
    cold_l = large.join(F.broadcast(pf), lk == F.col("__hk"), "left_anti")
    hot_s = (
        small.join(F.broadcast(pf), sk == F.col("__hk"))
        .withColumn(
            "__ssalt", F.explode(F.sequence(F.lit(0), F.col("__ns") - 1))
        )
        .drop("__hk", "__ns")
    )
    joined_cold = cold_l.join(small, F.col(large_key) == F.col(small_key))
    joined_hot = (
        hot_l.join(
            hot_s,
            (F.col(large_key) == F.col(small_key))
            & (F.col("__lsalt") == F.col("__ssalt")),
        )
        .drop("__lsalt", "__ssalt")
    )
    return joined_cold.unionByName(joined_hot)


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
