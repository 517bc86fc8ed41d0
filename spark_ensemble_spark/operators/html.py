"""HTML -> text extraction: the first transform after a web crawl.

Real pretraining corpora arrive as HTML inside WARC containers
(``sources/compressed.warc_extract``); before any quality scoring,
dedup, or tokenization the markup has to go. This module is the
C4-style extractor as a FIXED SEQUENTIAL FOLD of JVM regexp/replace
expressions — one narrow projection, zero UDFs, zero shuffles, the
``operators/pii.py`` posture — so it scales exactly as the scan does
and every step replays in DuckDB (Java-regex ∩ RE2 common dialect:
inline ``(?is)`` flags and non-greedy quantifiers only, no
backreferences, no lookaround).

Extraction spec (the fold order IS the spec):
  1. strip comments ``<!-- ... -->``;
  2. strip ``<script>`` and ``<style>`` blocks INCLUDING content
     (their text is code, not prose);
  3. block-level tags (p/div/br/h1-6/li/ul/ol/tr/table/section/
     article/header/footer/nav) become a space — words in different
     blocks must not concatenate;
  4. every remaining tag drops;
  5. entities decode: ``&lt; &gt; &quot; &#39; &nbsp;`` then ``&amp;``
     LAST (decoding ``&amp;`` first would double-decode ``&amp;lt;``);
  6. whitespace runs collapse to one space; ends trim.

``extract_links`` pulls ``href`` targets (``regexp_extract_all``) for
the URL-curation family (``operators/urls.py``) — crawl frontier and
link-graph building (``operators/graph.pagerank``) start here.

The testdata has no HTML column, so the registry row wraps document
text in a deterministic HTML fixture (title/nav boilerplate, script,
style, comment, entities, anchor links — replayable in SQL; the PII
fixture posture).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (kind, pattern-or-literal, replacement) applied in order. kind 're'
#: uses regexp_replace (all occurrences on both engines — DuckDB takes
#: the 'g' flag in the mirror), kind 'lit' uses plain replace().
HTML_STEPS: list[tuple[str, str, str]] = [
    ("re", r"(?s)<!--.*?-->", ""),
    ("re", r"(?is)<script[^>]*>.*?</script>", ""),
    ("re", r"(?is)<style[^>]*>.*?</style>", ""),
    (
        "re",
        r"(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|table|section|article|header|footer|nav)[^>]*>",
        " ",
    ),
    ("re", r"<[^>]+>", ""),
    ("lit", "&lt;", "<"),
    ("lit", "&gt;", ">"),
    ("lit", "&quot;", '"'),
    ("lit", "&#39;", "'"),
    ("lit", "&nbsp;", " "),
    ("lit", "&amp;", "&"),
    ("re", r"\s+", " "),
]

_HREF_RE = r'href="([^"]*)"'


def html_to_text(html: Column) -> Column:
    """The extraction fold above as one Catalyst expression chain."""
    out = html
    for kind, pat, rep in HTML_STEPS:
        if kind == "re":
            out = F.regexp_replace(out, pat, rep)
        else:
            out = F.replace(out, F.lit(pat), F.lit(rep))
    return F.trim(out)


def html_to_text_sql(html_expr: str) -> str:
    """DuckDB expression replaying :func:`html_to_text` bit-for-bit
    (``regexp_replace(..., 'g')`` = Spark's replace-all)."""
    out = html_expr
    # DuckDB string literals are backslash-literal (no escape processing),
    # so regex patterns embed verbatim; only single quotes double.
    q = lambda s: s.replace("'", "''")
    for kind, pat, rep in HTML_STEPS:
        if kind == "re":
            out = f"regexp_replace({out}, '{q(pat)}', '{q(rep)}', 'g')"
        else:
            out = f"replace({out}, '{q(pat)}', '{q(rep)}')"
    return f"trim({out})"


def extract_links(html: Column) -> Column:
    """All ``href="..."`` targets, document order."""
    return F.regexp_extract_all(html, F.lit(_HREF_RE), 1)


def extract_links_sql(html_expr: str) -> str:
    return f"regexp_extract_all({html_expr}, '{_HREF_RE}', 1)"


def clean_html(
    df: DataFrame, html_col: str = "html", out_col: str = "text_clean"
) -> DataFrame:
    """Append ``text_clean``, ``links``, and ``n_links``. Narrow."""
    h = F.col(html_col)
    links = extract_links(h)
    return (
        df.withColumn(out_col, html_to_text(h))
        .withColumn("links", links)
        .withColumn("n_links", F.size(links).cast("long"))
    )


# ---------------------------------------------------------------------------
# Deterministic HTML fixture (testdata has no HTML column).
# ---------------------------------------------------------------------------


def html_fixture(doc_id: Column, text: Column) -> Column:
    """Wrap a document's text in replayable HTML: head with title/style/
    script (strippable code), nav boilerplate, a comment, entity samples
    on a doc_id grid, the text in paragraph blocks, and anchor links."""
    did = doc_id.cast("string")
    entity = (
        F.when(doc_id % 3 == 0, F.lit("Q&amp;A &lt;section&gt; "))
        .when(doc_id % 3 == 1, F.lit("it&#39;s &quot;quoted&quot;&nbsp;here "))
        .otherwise(F.lit(""))
    )
    return F.concat(
        F.lit("<html><head><title>Doc "),
        did,
        F.lit("</title><style>p { color: #333; }</style>"),
        F.lit("<script>if (a < b && c > d) { x(); }</script></head>"),
        F.lit("<body><!-- generator: fixture --><nav><ul><li>Home</li>"),
        F.lit("<li><a href=\"/about\">About</a></li></ul></nav>"),
        F.lit("<h1>Doc "),
        did,
        F.lit("</h1><p>"),
        entity,
        text,
        F.lit("</p><div>See <a href=\"https://example.org/d/"),
        did,
        F.lit("\">ref</a>.</div></body></html>"),
    )


def html_fixture_sql(doc_id: str = "doc_id", text: str = "text") -> str:
    """DuckDB expression emitting the identical fixture HTML."""
    return f"""
      '<html><head><title>Doc ' || CAST({doc_id} AS VARCHAR)
      || '</title><style>p {{ color: #333; }}</style>'
      || '<script>if (a < b && c > d) {{ x(); }}</script></head>'
      || '<body><!-- generator: fixture --><nav><ul><li>Home</li>'
      || '<li><a href="/about">About</a></li></ul></nav>'
      || '<h1>Doc ' || CAST({doc_id} AS VARCHAR) || '</h1><p>'
      || (CASE WHEN {doc_id} % 3 = 0 THEN 'Q&amp;A &lt;section&gt; '
               WHEN {doc_id} % 3 = 1
                 THEN 'it&#39;s &quot;quoted&quot;&nbsp;here '
               ELSE '' END)
      || {text}
      || '</p><div>See <a href="https://example.org/d/'
      || CAST({doc_id} AS VARCHAR) || '">ref</a>.</div></body></html>'
    """
