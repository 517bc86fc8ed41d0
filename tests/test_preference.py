"""Bradley-Terry preference fitting (operators/preference.py).

Properties checked:
* a planted dominance hierarchy recovers the right strength ORDER;
* P(i beats j) implied by fitted strengths tracks observed win rates;
* zero-win items clamp at MIN_P (bounded support, never zero/negative);
* the fit is bit-identical under repartitioning (exact-integer contract);
* pair_documents is deterministic and never emits same-source matchups.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_ensemble_spark.operators.preference import (
    MIN_P,
    SCALE,
    bradley_terry,
    pair_documents,
)


def _comparisons(spark, rows):
    return spark.createDataFrame(rows, "winner string, loser string")


def test_dominance_order_recovered(spark):
    # a beats b 9:1, b beats c 9:1, a beats c 10:0 -> strengths a > b > c.
    rows = (
        [("a", "b")] * 9
        + [("b", "a")] * 1
        + [("b", "c")] * 9
        + [("c", "b")] * 1
        + [("a", "c")] * 10
    )
    got = {
        r["item"]: r
        for r in bradley_terry(_comparisons(spark, rows), n_iters=8).collect()
    }
    assert got["a"]["strength"] > got["b"]["strength"] > got["c"]["strength"]
    assert [got[x]["rank"] for x in ("a", "b", "c")] == [1, 2, 3]
    assert got["a"]["wins"] == 19 and got["c"]["wins"] == 1
    assert got["a"]["n_comparisons"] == 20


def test_implied_probability_tracks_win_rate(spark):
    # Two items, a beats b 3:1 -> P(a beats b) = pa/(pa+pb) should land
    # near 0.75 (exact MLE for the 2-item case).
    rows = [("a", "b")] * 30 + [("b", "a")] * 10
    got = {
        r["item"]: r["strength"]
        for r in bradley_terry(_comparisons(spark, rows), n_iters=10).collect()
    }
    p = got["a"] / (got["a"] + got["b"])
    assert abs(p - 0.75) < 0.01


def test_zero_win_item_clamps(spark):
    rows = [("a", "b")] * 5
    got = {
        r["item"]: r
        for r in bradley_terry(_comparisons(spark, rows), n_iters=4).collect()
    }
    assert got["b"]["wins"] == 0
    assert got["b"]["strength_scaled"] >= MIN_P
    assert got["a"]["strength_scaled"] > got["b"]["strength_scaled"]


def test_partition_invariance(spark):
    rows = [("a", "b")] * 7 + [("b", "c")] * 5 + [("c", "a")] * 3 + [("b", "a")] * 2
    base = _comparisons(spark, rows)
    one = {
        (r["item"], r["strength_scaled"])
        for r in bradley_terry(base.coalesce(1), n_iters=5).collect()
    }
    many = {
        (r["item"], r["strength_scaled"])
        for r in bradley_terry(base.repartition(7), n_iters=5).collect()
    }
    assert one == many


def test_strengths_normalized(spark):
    rows = [("a", "b")] * 4 + [("b", "c")] * 4 + [("c", "a")] * 4
    out = bradley_terry(_comparisons(spark, rows), n_iters=4)
    total = out.agg(F.sum("strength_scaled")).collect()[0][0]
    # normalisation targets K * SCALE; integer floors lose at most K ticks.
    assert abs(total - 3 * SCALE) <= 3 * SCALE * 1e-6


def test_pair_documents_deterministic_no_self_pairs(spark, sf_dir):
    from spark_ensemble_spark.sources.datasets import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = pair_documents(docs).collect()
    b = pair_documents(docs.repartition(5)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0
    assert all(r["winner"] != r["loser"] for r in a)


def test_streaming_stats_merge_equals_from_scratch(spark, tmp_path):
    """Two deliveries of comparisons written as separate pair-stats
    partials; the merged fit must equal fitting the concatenated log from
    scratch (exact integer sums -> identical trajectory)."""
    from spark_ensemble_spark.operators.preference import (
        fit_pair_stats,
        merge_pair_stats,
        pair_stats,
    )

    d1 = _comparisons(spark, [("a", "b")] * 3 + [("b", "c")] * 2)
    d2 = _comparisons(spark, [("b", "a")] * 2 + [("c", "a")] * 1 + [("a", "b")] * 1)
    pair_stats(d1).write.mode("overwrite").parquet(str(tmp_path / "s/batch_id=0"))
    pair_stats(d2).write.mode("overwrite").parquet(str(tmp_path / "s/batch_id=1"))
    merged = merge_pair_stats(spark.read.parquet(str(tmp_path / "s")))
    via_store = {
        (r["item"], r["strength_scaled"], r["wins"], r["n_comparisons"])
        for r in fit_pair_stats(merged, n_iters=5).collect()
    }
    scratch = {
        (r["item"], r["strength_scaled"], r["wins"], r["n_comparisons"])
        for r in bradley_terry(d1.unionByName(d2), n_iters=5).collect()
    }
    assert via_store == scratch


def test_local_fit_path_equals_distributed(spark, sf_dir, monkeypatch):
    """The driver-side MM fast path (r12) must be bit-identical to the
    distributed loop: same strengths, wins, comparison counts, ranks, and
    schema, on both a hand fixture and the sf0.001 document pairing."""
    from spark_ensemble_spark.operators.preference import pair_stats
    from spark_ensemble_spark.sources.datasets import load_table

    def rows(df):
        return sorted(map(tuple, df.collect()))

    fixtures = [
        _comparisons(
            spark,
            [("a", "b")] * 7 + [("b", "c")] * 2 + [("c", "a")] * 3 + [("b", "a")],
        ),
        pair_documents(load_table(spark, sf_dir, "documents")),
    ]
    for comp in fixtures:
        monkeypatch.setenv("SPARK_GRAFT_BT_LOCAL_PAIRS_MAX", "65536")
        local = bradley_terry(comp, n_iters=8)
        monkeypatch.setenv("SPARK_GRAFT_BT_LOCAL_PAIRS_MAX", "0")
        dist = bradley_terry(comp, n_iters=8)
        assert local.columns == dist.columns
        assert [f.dataType for f in local.schema.fields] == [
            f.dataType for f in dist.schema.fields
        ]
        assert rows(local) == rows(dist)


def test_local_fit_threshold_forces_distributed(spark, monkeypatch):
    """A pair table larger than the threshold must keep the distributed
    loop (the probe collects at most threshold+1 rows)."""
    monkeypatch.setenv("SPARK_GRAFT_BT_LOCAL_PAIRS_MAX", "1")
    comp = _comparisons(
        spark, [("a", "b")] * 2 + [("b", "c")] * 2 + [("c", "a")] * 2
    )
    out = bradley_terry(comp, n_iters=3)
    # 3 distinct pairs > threshold 1 -> distributed plan (iteration joins
    # present, not a pre-computed VALUES LocalRelation)
    assert "Join" in out._jdf.queryExecution().optimizedPlan().toString()
    assert out.count() == 3
