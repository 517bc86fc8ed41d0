"""URL curation (operators/urls.py): normalization spec, blocklist
semantics, canonical pick, and fixture determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ensemble_spark.operators import urls as U


def _norm(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(U.normalize_url(F.col("url")).alias("n")).collect()[0]["n"]


def test_normalize_case_ports_fragment(spark):
    assert (
        _norm(spark, "HTTPS://WWW.Example.COM:443/Path/To/X#frag")
        == "https://www.example.com/Path/To/X"
    )
    # non-default port kept; path case preserved
    assert (
        _norm(spark, "http://Host.ORG:8080/A/B/")
        == "http://host.org:8080/A/B"
    )
    # default http port dropped
    assert _norm(spark, "http://h.org:80/x") == "http://h.org/x"
    # https on 80 is NOT default — kept
    assert _norm(spark, "https://h.org:80/x") == "https://h.org:80/x"


def test_normalize_query_params_sorted_tracking_dropped(spark):
    got = _norm(spark, "http://h.org/p?z=1&utm_source=a&a=2&gclid=xyz&ref=tw")
    assert got == "http://h.org/p?a=2&z=1"
    # all params tracking -> no query part at all
    assert _norm(spark, "http://h.org/p?utm_medium=m&fbclid=1") == "http://h.org/p"
    # empty query string
    assert _norm(spark, "http://h.org/p?") == "http://h.org/p"


def test_param_order_never_distinguishes(spark):
    a = _norm(spark, "http://h.org/p?a=1&b=2")
    b = _norm(spark, "http://h.org/p?b=2&a=1")
    assert a == b


def test_registered_domain_and_blocklist(spark):
    df = spark.createDataFrame(
        [
            (1, "http://a.b.blog.org/x"),
            (2, "http://blog.org/y"),
            (3, "http://goodblog.org/z"),  # suffix but NOT a subdomain
            (4, "http://ok.example.org/w"),
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r
        for r in U.url_features(df, blocklist=["blog.org"]).collect()
    }
    assert got[1]["registered_domain"] == "blog.org" and got[1]["blocked"]
    assert got[2]["blocked"]
    assert not got[3]["blocked"]  # 'goodblog.org' must not match '%.blog.org'
    assert not got[4]["blocked"]
    assert got[4]["registered_domain"] == "example.org"


def test_canonical_pick_smallest_id_skips_blocked(spark):
    df = spark.createDataFrame(
        [
            (5, "http://H.org/x/?utm_source=1"),
            (2, "http://h.org/x?utm_medium=2"),
            (9, "http://h.org/y"),
        ],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: r for r in U.canonicalize_urls(df).collect()}
    # 2 and 5 normalize identically; 2 wins
    assert got[2]["url_norm"] == got[5]["url_norm"] == "http://h.org/x"
    assert got[2]["is_canonical"] and not got[5]["is_canonical"]
    assert got[9]["is_canonical"]


def test_fixture_deterministic(spark, sf_dir):
    from spark_ensemble_spark.sources.datasets import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    mk = lambda d: d.select(
        "doc_id", U.url_fixture(F.col("doc_id"), F.col("source")).alias("url")
    )
    a = sorted(map(tuple, mk(docs).collect()))
    b = sorted(map(tuple, mk(docs.repartition(7)).collect()))
    assert a == b and len(a) > 0
