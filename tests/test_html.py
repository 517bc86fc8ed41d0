"""HTML -> text extraction (operators/html.py): fold-step semantics,
entity-decode ordering, link extraction, and the end-to-end crawl shape
(WARC containers -> records -> clean text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ensemble_spark.operators import html as H


def _clean(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(H.html_to_text(F.col("html")).alias("t")).collect()[0]["t"]


def test_script_style_comment_content_dropped(spark):
    got = _clean(
        spark,
        "<p>keep</p><script>var x = 1 < 2;</script>"
        "<style>p{display:none}</style><!-- secret -->done",
    )
    assert got == "keep done"
    assert "secret" not in got and "display" not in got and "var x" not in got


def test_block_tags_separate_words_inline_tags_dont(spark):
    assert _clean(spark, "<p>alpha</p><p>beta</p>") == "alpha beta"
    # inline tags drop without inserting space: words join
    assert _clean(spark, "ga<b>mm</b>a") == "gamma"


def test_entity_decode_order_no_double_decode(spark):
    # &amp;lt; must decode to the LITERAL '&lt;', never to '<'
    assert _clean(spark, "<p>&amp;lt;</p>") == "&lt;"
    assert _clean(spark, "<p>a &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>") == (
        "a <tag> \"q\" 's'"
    )
    assert _clean(spark, "<p>a&nbsp;b</p>") == "a b"


def test_whitespace_collapse_and_trim(spark):
    assert _clean(spark, "  <div>a\n\n   b\t c</div>  ") == "a b c"


def test_link_extraction(spark):
    df = spark.createDataFrame(
        [('<a href="/x">x</a> <a href="https://e.org/y">y</a> <a>none</a>',)],
        "html string",
    )
    row = H.clean_html(df).collect()[0]
    assert row["links"] == ["/x", "https://e.org/y"]
    assert row["n_links"] == 2


def test_fixture_replayable_and_boilerplate_stripped(spark, sf_dir):
    from spark_ensemble_spark.sources.datasets import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(20)
    raw = docs.select(
        "doc_id", H.html_fixture(F.col("doc_id"), F.col("text")).alias("html")
    )
    out = {r["doc_id"]: r for r in H.clean_html(raw).collect()}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, r in out.items():
        # the document's own words survive; head/script/style/comment don't
        assert src[did].split()[0] in r["text_clean"]
        assert "color" not in r["text_clean"]
        assert "generator" not in r["text_clean"]
        # nav boilerplate text DOES survive (boilerplate REMOVAL is
        # operators/corpus.strip_boilerplate's job, downstream)
        assert "Home" in r["text_clean"]
        assert r["n_links"] == 2  # /about + the per-doc ref link


def test_warc_to_clean_text_composition(spark, sf_dir):
    """The real crawl shape: HTML docs packed into .warc.gz containers,
    extracted through the Arrow seam, then cleaned — equals cleaning the
    HTML directly (container framing is transparent)."""
    from spark_ensemble_spark.sources.compressed import (
        synthetic_warc_gz_corpus,
        warc_extract,
    )
    from spark_ensemble_spark.sources.datasets import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(30)
    html_docs = docs.select(
        "doc_id", H.html_fixture(F.col("doc_id"), F.col("text")).alias("text")
    )
    containers = synthetic_warc_gz_corpus(html_docs, num_containers=5)
    records = warc_extract(containers)
    via_warc = sorted(
        (r["target_uri"], r["clean"])
        for r in records.select(
            "target_uri", H.html_to_text(F.col("text")).alias("clean")
        ).collect()
    )
    direct = sorted(
        (f"https://example.com/doc/{r['doc_id']}", r["clean"])
        for r in html_docs.select(
            "doc_id", H.html_to_text(F.col("text")).alias("clean")
        ).collect()
    )
    assert via_warc == direct and len(via_warc) == 30
