"""Plan-shape pins for the r12 gated driver fast paths (VERDICT r12 #8).

The CC / PageRank / Bradley-Terry / MMR / tokenizer fast paths replaced
tiny-frame distributed iteration with driver-side replay behind env-tunable
count gates. Value equality of the two paths is pinned elsewhere
(test_operators / test_preference / test_tokenizer_local); what was NOT
pinned is the PLAN SHAPE of each path — a regression that silently
re-enabled the distributed loop under the gate (losing the optimization),
or one that made the "distributed" branch collapse to a driver path
(hiding scale behavior from the scale smokes), would be invisible to every
measured artifact. These tests assert:

* gate ON  -> the result plan is a pure local relation (LocalTableScan,
  zero Exchange): the fast path actually fired;
* gate OFF -> the result plan contains at least one Exchange: the
  distributed branch actually executes distributed-shaped plans.
"""

import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_local(df):
    plan = _plan(df)
    assert "LocalTableScan" in plan, plan
    assert "Exchange" not in plan, plan
    assert not re.search(r"Scan ExistingRDD", plan), plan


def _assert_distributed(df):
    # Distributed-branch evidence: either a live shuffle in the final plan
    # or a localCheckpointed RDD scan (the iterative loops materialize each
    # round eagerly, so the final frame reads back checkpoint RDDs).
    plan = _plan(df)
    assert "Exchange" in plan or "Scan ExistingRDD" in plan, plan


def test_cc_gate_plan_shapes(spark, monkeypatch):
    from spark_ensemble_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 1)], "id_a long, id_b long"
    )
    monkeypatch.setenv("SPARK_GRAFT_CC_LOCAL_EDGES_MAX", "65536")
    _assert_local(dup_clusters(pairs))
    monkeypatch.setenv("SPARK_GRAFT_CC_LOCAL_EDGES_MAX", "0")
    _assert_distributed(dup_clusters(pairs))


def test_pagerank_gate_plan_shapes(spark, monkeypatch):
    from spark_ensemble_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 0)], "src long, dst long"
    )
    monkeypatch.setenv("SPARK_GRAFT_PR_LOCAL_EDGES_MAX", "65536")
    _assert_local(pagerank(edges, n_iters=3))
    monkeypatch.setenv("SPARK_GRAFT_PR_LOCAL_EDGES_MAX", "0")
    _assert_distributed(pagerank(edges, n_iters=3))


def test_bt_gate_plan_shapes(spark, monkeypatch):
    from spark_ensemble_spark.operators.preference import bradley_terry

    prefs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")],
        "winner string, loser string",
    )
    monkeypatch.setenv("SPARK_GRAFT_BT_LOCAL_PAIRS_MAX", "65536")
    _assert_local(bradley_terry(prefs, n_iters=4))
    monkeypatch.setenv("SPARK_GRAFT_BT_LOCAL_PAIRS_MAX", "0")
    _assert_distributed(bradley_terry(prefs, n_iters=4))


def test_mmr_gate_plan_shapes(spark, sf_dir, monkeypatch):
    from spark_ensemble_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )
    from spark_ensemble_spark.sources.datasets import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") < 3)
    sl = brute_force_topk(emb, qdf, k=8)
    monkeypatch.setenv("SPARK_GRAFT_MMR_LOCAL_CAND_MAX", "8192")
    _assert_local(mmr_rerank(emb, qdf, sl, k=3, lam=0.7))
    monkeypatch.setenv("SPARK_GRAFT_MMR_LOCAL_CAND_MAX", "0")
    _assert_distributed(mmr_rerank(emb, qdf, sl, k=3, lam=0.7))


def test_tokenizer_gate_plan_shapes(spark, monkeypatch):
    # Both paths end in a driver-built merges frame (the distributed
    # trainer collects one argmax row per round), so the final plan cannot
    # distinguish them — pin the JOB COUNT instead: the local path pays one
    # bounded vocab collect, the distributed path pays 2-3 jobs per merge
    # round.
    from spark_ensemble_spark.operators import tokenizer as T

    corpus = spark.createDataFrame(
        [(1, "en", "low lower lowest low low"), (2, "en", "new newer low")],
        "doc_id long, lang string, text string",
    )
    tracker = spark.sparkContext.statusTracker()

    def jobs_during(fn):
        before = len(tracker.getJobIdsForGroup(None))
        fn().collect()
        return len(tracker.getJobIdsForGroup(None)) - before

    monkeypatch.setenv("SPARK_GRAFT_TOKENIZER_LOCAL_VOCAB_MAX", "65536")
    n_local = jobs_during(lambda: T.bpe_train(corpus, num_merges=4, min_count=1))
    _assert_local(T.bpe_train(corpus, num_merges=4, min_count=1))
    monkeypatch.setenv("SPARK_GRAFT_TOKENIZER_LOCAL_VOCAB_MAX", "0")
    n_dist = jobs_during(lambda: T.bpe_train(corpus, num_merges=4, min_count=1))
    assert n_dist > n_local + 2, (n_local, n_dist)
