"""Local-vs-distributed trainer path equality (r12 optimization).

The tokenizer trainers take a size-gated driver-local fast path when the
distinct-word vocabulary fits under ``LOCAL_VOCAB_MAX`` (one bounded
collect instead of 2-3 Spark jobs per merge round).  These tests pin the
contract that made the fast path admissible: BOTH paths produce the same
rows AND the same schema, on a fixture that exercises ties, multi-round
merge interactions, per-group divergence, and non-ASCII symbols."""

import pytest
from pyspark.sql import functions as F

from spark_ensemble_spark.operators import tokenizer as T


@pytest.fixture()
def corpus(spark):
    rows = [
        # 'aaa' exercises the non-overlap fold (aa|a, never a|aa); the
        # repeated 'low lower lowest' family exercises merge chaining;
        # 'héllo' pins the non-ASCII code-point split; 'tt' vs 'ss' counts
        # tie on round 1 and must break lexicographically.
        (0, "en", "low low low lower lowest tt tt ss ss"),
        (1, "en", "aaa aaa banana low héllo héllo"),
        (2, "fr", "le le le la la banane banane héllo"),
        (3, "fr", "aaa tt le la lower"),
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def _both_paths(monkeypatch, fn):
    local = fn()
    monkeypatch.setenv("SPARK_GRAFT_TOKENIZER_LOCAL_VOCAB_MAX", "0")
    dist = fn()
    return local, dist


def test_bpe_train_paths_equal(spark, corpus, monkeypatch):
    local, dist = _both_paths(
        monkeypatch, lambda: T.bpe_train(corpus, num_merges=8, min_count=2)
    )
    assert local.schema == dist.schema
    assert _collect(local) == _collect(dist)
    assert len(_collect(local)) > 0


def test_wordpiece_train_paths_equal(spark, corpus, monkeypatch):
    local, dist = _both_paths(
        monkeypatch, lambda: T.wordpiece_train(corpus, num_merges=8)
    )
    assert local.schema == dist.schema
    assert _collect(local) == _collect(dist)
    assert len(_collect(local)) > 0


def test_bpe_train_grouped_paths_equal(spark, corpus, monkeypatch):
    local, dist = _both_paths(
        monkeypatch, lambda: T.bpe_train_grouped(corpus, "lang", num_merges=6)
    )
    assert [f.name for f in local.schema] == [f.name for f in dist.schema]
    assert [f.dataType for f in local.schema] == [f.dataType for f in dist.schema]
    assert _collect(local) == _collect(dist)
    # both languages must have trained independently
    assert {r[0] for r in _collect(local)} == {"en", "fr"}


def test_local_path_taken_for_small_vocab(spark, corpus):
    # the fast path must return a LocalRelation-backed plan: no exchange,
    # no scan of the corpus in the final merges frame
    plan = T.bpe_train(corpus, num_merges=3)._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan or "CommandResult" in plan


def test_dry_vocab_stops_early_both_paths(spark, monkeypatch):
    # single-letter words: zero adjacent pairs, trainers emit no merges
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    local, dist = _both_paths(monkeypatch, lambda: T.bpe_train(df, num_merges=4))
    assert _collect(local) == _collect(dist) == []
