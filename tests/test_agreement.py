"""Inter-annotator agreement (operators/agreement.py): hand-computed
kappa values, degenerate panels, and fixture sanity."""

from __future__ import annotations

import pytest

from spark_ensemble_spark.operators.agreement import (
    cohens_kappa_pairs,
    fleiss_kappa,
    rater_labels_fixture,
)


def _labels(spark, rows):
    return spark.createDataFrame(rows, "item_id long, rater string, label string")


def test_cohen_perfect_agreement(spark):
    rows = [(i, r, "keep" if i % 2 == 0 else "drop") for i in range(10) for r in ("a", "b")]
    got = cohens_kappa_pairs(_labels(spark, rows)).collect()[0]
    assert got["kappa"] == 1.0 and got["po"] == 1.0
    assert got["n_items"] == 10 and got["n_agree"] == 10


def test_cohen_worked_example(spark):
    """Classic 2x2 worked example: 50 items, a/b agree on 20 yes + 15 no,
    a-yes/b-no 10, a-no/b-yes 5. po=0.7, pe=(30*25 + 20*25)/2500=0.5,
    kappa=0.4."""
    rows = []
    i = 0
    for cnt, la, lb in ((20, "y", "y"), (15, "n", "n"), (10, "y", "n"), (5, "n", "y")):
        for _ in range(cnt):
            rows += [(i, "a", la), (i, "b", lb)]
            i += 1
    got = cohens_kappa_pairs(_labels(spark, rows)).collect()[0]
    assert got["po"] == pytest.approx(0.7)
    assert got["pe"] == pytest.approx(0.5)
    assert got["kappa"] == pytest.approx(0.4)


def test_cohen_chance_only_agreement(spark):
    """Rater b says 'keep' always; rater a splits 50/50 -> po equals pe
    exactly, kappa = 0."""
    rows = []
    for i in range(20):
        rows += [(i, "a", "keep" if i % 2 == 0 else "drop"), (i, "b", "keep")]
    got = cohens_kappa_pairs(_labels(spark, rows)).collect()[0]
    assert got["po"] == pytest.approx(0.5)
    assert got["pe"] == pytest.approx(0.5)
    assert got["kappa"] == 0.0


def test_cohen_every_pair_scored(spark):
    rows = [(i, r, "keep") for i in range(5) for r in ("a", "b", "c")]
    got = cohens_kappa_pairs(_labels(spark, rows)).collect()
    assert {(r["rater_a"], r["rater_b"]) for r in got} == {
        ("a", "b"), ("a", "c"), ("b", "c")
    }


def test_fleiss_perfect_and_split(spark):
    # perfect: all raters agree on every item
    rows = [(i, f"r{j}", "keep" if i < 3 else "drop") for i in range(6) for j in range(3)]
    got = fleiss_kappa(_labels(spark, rows)).collect()[0]
    assert got["kappa"] == 1.0 and got["n_raters"] == 3
    # maximal disagreement: every item gets 3 distinct labels
    rows = [(i, f"r{j}", f"l{j}") for i in range(6) for j in range(3)]
    got = fleiss_kappa(_labels(spark, rows)).collect()[0]
    assert got["p_bar"] == 0.0 and got["kappa"] < 0


def test_fixture_panel_properties(spark, sf_dir):
    from spark_ensemble_spark.sources.datasets import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    lab = rater_labels_fixture(docs)
    n_docs = docs.count()
    assert lab.count() == 3 * n_docs
    ck = cohens_kappa_pairs(lab).collect()
    assert len(ck) == 3
    for r in ck:
        assert r["n_items"] == n_docs
        assert -1.0 <= r["kappa"] < 1.0
    fk = fleiss_kappa(lab).collect()[0]
    assert fk["n_items"] == n_docs and fk["n_raters"] == 3
    assert -1.0 <= fk["kappa"] < 1.0
