"""Corpus-curation operators: DuckDB-oracle and property tests.

These operators live outside the 50-entry driver registry (the window is
full), so each one carries its own in-suite DuckDB oracle at the same rigor:
exact row/value comparison on deterministic inputs.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from spark_ensemble_spark.operators.corpus import (
    bloom_contamination,
    boilerplate_lines,
    contamination_overlap,
    gopher_quality_flags,
    line_stats,
    ngram_bloom_build,
    sample_by_rates,
    strip_boilerplate,
    top_ngram_fraction,
    top_ngrams,
)

NL = "\n"

CORPUS = [
    # (doc_id, text, source) — cookie banner + footer recur across docs
    (0, f"we use cookies{NL}alpha beta gamma{NL}site footer 2024", "web"),
    (1, f"we use cookies{NL}delta epsilon{NL}site footer 2024", "web"),
    (2, f"we use cookies{NL}unique middle line{NL}zeta eta", "web"),
    (3, f"totally original document{NL}with two lines", "books"),
    (4, f"repeat me{NL}repeat me{NL}repeat me{NL}once only", "books"),
    (5, "", "web"),  # empty doc must survive every operator
    (6, f"  we use cookies  {NL}{NL}  padded lines trim  ", "web"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text", "source"])


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE TABLE corpus AS SELECT * FROM (VALUES "
        + ", ".join(
            "(%d, '%s', '%s')" % (i, t.replace("\n", "' || chr(10) || '"), s)
            for i, t, s in CORPUS
        )
        + ") v(doc_id, text, source)"
    )
    return c


# DuckDB mirror of corpus._lines: trimmed, non-empty lines.
DUCK_LINES = (
    "list_filter(list_transform(string_split(coalesce(text, ''), chr(10)),"
    " l -> trim(l)), l -> l <> '')"
)


def test_line_stats_matches_duckdb(corpus, con):
    got = {
        r["doc_id"]: (r["n_lines"], r["n_distinct_lines"], r["dup_line_ratio"])
        for r in line_stats(corpus).collect()
    }
    want = {
        row[0]: (row[1], row[2], row[3])
        for row in con.execute(
            f"""
            WITH l AS (SELECT doc_id, {DUCK_LINES} AS lines FROM corpus)
            SELECT doc_id, len(lines) AS n,
                   len(list_distinct(lines)) AS nd,
                   CASE WHEN len(lines) > 0
                        THEN (len(lines) - len(list_distinct(lines))) / len(lines)::DOUBLE
                        ELSE 0.0 END AS ratio
            FROM l
            """
        ).fetchall()
    }
    assert got == want


def test_boilerplate_lines_matches_duckdb(corpus, con):
    got = {
        (r["line"], r["n_docs"])
        for r in boilerplate_lines(corpus, min_docs=2, hash_fn="md5").collect()
    }
    want = set(
        con.execute(
            f"""
            WITH per_doc AS (
              SELECT doc_id, unnest(list_distinct({DUCK_LINES})) AS line FROM corpus
            )
            SELECT min(line), count(*) AS n_docs FROM per_doc
            GROUP BY ('0x' || substring(md5(line), 1, 15))::BIGINT
            HAVING count(*) >= 2
            """
        ).fetchall()
    )
    assert got == want
    # the two planted boilerplate lines, and nothing doc-unique
    assert {l for l, _ in got} == {"we use cookies", "site footer 2024"}


def test_strip_boilerplate_matches_duckdb(corpus, con):
    out = strip_boilerplate(corpus, min_docs=2)
    assert out.columns == corpus.columns  # schema and order preserved
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    want = {
        row[0]: row[1]
        for row in con.execute(
            f"""
            WITH bad AS (
              SELECT line FROM (
                SELECT min(line) AS line, count(*) AS n FROM (
                  SELECT doc_id, unnest(list_distinct({DUCK_LINES})) AS line
                  FROM corpus) GROUP BY line) WHERE n >= 2
            ), kept AS (
              SELECT doc_id, pos, line FROM (
                SELECT doc_id, unnest({DUCK_LINES}) AS line,
                       generate_subscripts({DUCK_LINES}, 1) AS pos
                FROM corpus)
              WHERE line NOT IN (SELECT line FROM bad)
            )
            SELECT c.doc_id,
                   coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), '')
            FROM corpus c LEFT JOIN kept k ON c.doc_id = k.doc_id
            GROUP BY c.doc_id
            """
        ).fetchall()
    }
    assert got == want
    assert got[0] == "alpha beta gamma"  # both boilerplate lines removed
    assert got[4] == f"repeat me{NL}repeat me{NL}repeat me{NL}once only"
    assert got[5] == ""  # empty doc survives as empty


def test_bloom_contamination_no_false_negatives(spark, corpus):
    """Bloom membership can only over-flag: per doc, n_flagged >= the exact
    join-based n_matched, with identical n_shingles; a doc fully inside the
    eval set flags every gram; the empty doc keeps its single empty shingle."""
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta"), (101, "benchmark only words here")],
        ["doc_id", "text"],
    )
    words = ngram_bloom_build(eval_df, shingle_size=3, num_bits=1 << 16)
    bloom = {
        r["doc_id"]: (r["n_shingles"], r["n_flagged"])
        for r in bloom_contamination(corpus, words, shingle_size=3).collect()
    }
    exact = {
        r["doc_id"]: (r["n_shingles"], r["n_matched"])
        for r in contamination_overlap(
            corpus, eval_df, shingle_size=3, hash_fn="md5"
        ).collect()
    }
    assert set(bloom) == set(exact)
    for doc_id, (n_sh, n_fl) in bloom.items():
        assert n_sh == exact[doc_id][0], doc_id
        assert n_fl >= exact[doc_id][1], doc_id
    # eval doc 100's grams are a superset of doc 0's middle line 3-grams
    assert bloom[0][1] >= 1
    assert 5 in bloom  # empty doc survives


def test_bloom_contamination_plan_is_join_free(spark, corpus):
    """The scale contract vs contamination_overlap: membership is tested
    against the mask LITERAL — no join operator of any kind in the plan, and
    the only exchange is the per-doc aggregation."""
    eval_df = corpus.filter(F.col("doc_id") == 0)
    words = ngram_bloom_build(eval_df, shingle_size=3, num_bits=1 << 12)
    df = bloom_contamination(corpus, words, shingle_size=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_contamination_overlap_matches_duckdb(spark, corpus, con):
    # eval set shares doc 0's middle line; k=3 word shingles
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta"), (101, "benchmark only words here")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_matched"], r["overlap_ratio"])
        for r in contamination_overlap(
            corpus, eval_df, shingle_size=3, hash_fn="md5"
        ).collect()
    }
    con.execute("DROP TABLE IF EXISTS eval_set")
    con.execute(
        "CREATE TABLE eval_set AS SELECT * FROM (VALUES "
        "(100, 'alpha beta gamma delta'), (101, 'benchmark only words here')"
        ") v(doc_id, text)"
    )
    shingles = """
        list_distinct(list_transform(
          range(1, greatest(len(t) - 3, 0) + 2),
          i -> ('0x' || substring(md5(concat_ws(' ', t[i+0], t[i+1], t[i+2])), 1, 15))::BIGINT))
    """
    toks = (
        "string_split(regexp_replace(lower(trim(replace(coalesce(text, ''),"
        " chr(10), ' '))), '\\s+', ' ', 'g'), ' ')"
    )
    want = {
        row[0]: (row[1], row[2], row[3])
        for row in con.execute(
            f"""
            WITH dsh AS (
              SELECT doc_id, unnest(sh) AS h FROM (
                SELECT doc_id, {shingles} AS sh FROM (
                  SELECT doc_id, {toks} AS t FROM corpus))
            ), esh AS (
              SELECT DISTINCT unnest(sh) AS h FROM (
                SELECT {shingles} AS sh FROM (
                  SELECT {toks} AS t FROM eval_set))
            )
            SELECT d.doc_id, count(*) AS n,
                   count(e.h) AS m,
                   count(e.h) / count(*)::DOUBLE AS ratio
            FROM dsh d LEFT JOIN esh e USING (h)
            GROUP BY d.doc_id
            """
        ).fetchall()
    }
    # Spark's _shingle_hashes normalizes \s+ (incl. newlines) to single spaces,
    # which the DuckDB mirror reproduces via replace(chr(10)) before the regex.
    assert got == want
    assert got[0][1] >= 1  # doc 0 contains "alpha beta gamma" → contaminated
    assert got[3][1] == 0  # books doc untouched by the eval set


def test_sample_by_rates_matches_duckdb_and_is_deterministic(spark, con):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "web")
        .when(F.col("id") % 3 == 1, "books")
        .otherwise("code")
        .alias("source"),
    )
    rates = {"web": 0.25, "books": 1.0}
    out = sample_by_rates(docs, rates, seed=42)
    got = sorted(r["doc_id"] for r in out.collect())
    want = [
        row[0]
        for row in con.execute(
            """
            WITH docs AS (
              SELECT range AS doc_id,
                     CASE WHEN range % 3 = 0 THEN 'web'
                          WHEN range % 3 = 1 THEN 'books'
                          ELSE 'code' END AS source
              FROM range(0, 2000)
            )
            SELECT doc_id FROM docs
            WHERE ('0x' || substring(md5(doc_id::VARCHAR || ':42'), 1, 15))::BIGINT
                  % 1000000
                  < CASE WHEN source = 'web' THEN 250000
                         WHEN source = 'books' THEN 1000000 ELSE 0 END
            ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert got == want
    # all books kept, no code kept, web ≈ 25%
    assert sum(1 for d in got if d % 3 == 1) == 667
    assert not any(d % 3 == 2 for d in got)
    n_web = sum(1 for d in got if d % 3 == 0)
    assert 0.18 < n_web / 667 < 0.32
    # deterministic: a second run is identical
    assert sorted(r["doc_id"] for r in out.collect()) == got


def test_sample_by_rates_rejects_bad_rate(spark):
    docs = spark.range(1).select(F.col("id").alias("doc_id"), F.lit("web").alias("source"))
    with pytest.raises(ValueError):
        sample_by_rates(docs, {"web": 1.5})


def test_top_ngrams_matches_duckdb(corpus, con):
    got = [(r["ngram"], r["n"]) for r in top_ngrams(corpus, n=2, k=5).collect()]
    want = con.execute(
        """
        WITH toks AS (
          SELECT string_split(regexp_replace(lower(trim(replace(coalesce(text, ''),
                 chr(10), ' '))), '\\s+', ' ', 'g'), ' ') AS t
          FROM corpus
        ), grams AS (
          SELECT unnest(CASE WHEN len(t) >= 2
                 THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                 ELSE [] END) AS ngram
          FROM toks
        )
        SELECT ngram, count(*) AS n FROM grams
        GROUP BY ngram ORDER BY n DESC, ngram ASC LIMIT 5
        """
    ).fetchall()
    assert got == [tuple(w) for w in want]
    assert got[0] == ("use cookies", 4)  # ties with "we use"; ngram asc wins


def test_corpus_ops_on_real_documents(spark, sf_dir):
    """Smoke the whole chain on the driver's documents table (no newlines
    there, so strip is an identity modulo trimming)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    stats = line_stats(docs)
    assert stats.filter(F.col("dup_line_ratio") > 0).count() == 0
    stripped = strip_boilerplate(docs, min_docs=2)
    assert stripped.count() == n
    # single-line docs: only a line that equals another doc's ENTIRE text
    # could be stripped; with sf0.001's generator texts that never happens
    assert stripped.filter(F.col("text") != F.trim(F.col("text"))).count() == 0
    eval_df = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    cont = contamination_overlap(docs, eval_df, shingle_size=8)
    assert cont.count() == n
    planted = {r["doc_id"] for r in cont.filter("overlap_ratio >= 0.999").collect()}
    assert {r["doc_id"] for r in eval_df.collect()} <= planted
    mixed = sample_by_rates(docs, {"src0": 0.5, "src1": 1.0}, seed=7)
    assert 0 < mixed.count() < n


# ---------------------------------------------------------------------------
# Gopher quality filters
# ---------------------------------------------------------------------------

GOPHER_DOCS = [
    # 60 distinct-ish words, >=2 stop words, alphabetic, moderate lengths
    (0, "the quick brown fox jumps over a lazy dog and then it runs to "
        "find some food because it must have energy for more jumping that "
        "keeps it healthy with friends near river banks where trees grow "
        "tall green leaves while birds sing songs about warm summer days "
        "gone past but not forgotten ever really truly again now"),
    (1, "short doc"),  # fails min_words
    (2, " ".join(["spam ham"] * 40)),  # repeated bigram dominates
    (3, " ".join(["###"] * 60)),  # symbols, no alpha, no stops
    (4, " ".join(["pneumonoultramicroscopics"] * 60)),  # mean word len > 10
    (5, ""),  # empty
    (6, None),  # NULL text
]


@pytest.fixture(scope="module")
def gopher(spark):
    return spark.createDataFrame(GOPHER_DOCS, "doc_id long, text string")


def _gopher_con():
    c = duckdb.connect()
    c.execute(
        "CREATE TABLE g AS SELECT * FROM (VALUES "
        + ", ".join(
            "(%d, %s)" % (i, "NULL" if t is None else "'%s'" % t)
            for i, t in GOPHER_DOCS
        )
        + ") v(doc_id, text)"
    )
    return c


def test_top_ngram_fraction_matches_duckdb(gopher):
    got = {
        r["doc_id"]: r["f"]
        for r in gopher.select(
            "doc_id", top_ngram_fraction(F.col("text"), 2).alias("f")
        ).collect()
    }
    con = _gopher_con()
    want = {
        d: f
        for d, f in con.execute(
            """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split(regexp_replace(lower(trim(
                       coalesce(text, ''))), '\\s+', ' ', 'g'), ' '),
                       t -> t <> '') AS t
              FROM g
            ), grams AS (
              SELECT doc_id, unnest(CASE WHEN len(t) >= 2
                     THEN list_transform(range(1, len(t)), i -> t[i] || t[i+1])
                     ELSE [] END) AS gm
              FROM toks
            ), cnt AS (
              SELECT doc_id, gm, count(*) AS n FROM grams GROUP BY 1, 2
            ), agg AS (
              SELECT doc_id, max(n)::DOUBLE / sum(n) AS f FROM cnt GROUP BY 1
            )
            SELECT doc_id, coalesce(agg.f, 0.0)
            FROM g LEFT JOIN agg USING (doc_id)
            """
        ).fetchall()
    }
    assert got == pytest.approx(want)
    assert got[2] == pytest.approx(40 / 79)  # "ham spam" x39, "spam ham" x40
    assert got[1] == 1.0 and got[5] == 0.0 and got[6] == 0.0


def test_gopher_quality_flags_signals(gopher):
    rows = {r["doc_id"]: r for r in gopher_quality_flags(gopher).collect()}
    assert rows[0]["gopher_keep"] is True
    # every other doc trips at least one published heuristic
    assert all(rows[d]["gopher_keep"] is False for d in (1, 2, 3, 4, 5, 6))
    r0 = rows[0]
    text0 = GOPHER_DOCS[0][1]
    toks0 = text0.split()
    assert r0["n_words"] == len(toks0)
    assert r0["mean_word_len"] == pytest.approx(
        sum(len(t) for t in toks0) / len(toks0)
    )
    assert r0["frac_alpha_words"] == 1.0
    assert r0["symbol_word_ratio"] == 0.0
    assert r0["n_gopher_stops"] >= 2
    # per-signal trip wires
    assert rows[1]["n_words"] == 2
    assert rows[2]["top_bigram_fraction"] > 0.2
    assert rows[3]["frac_alpha_words"] == 0.0 and rows[3]["symbol_word_ratio"] > 0.1
    assert rows[4]["mean_word_len"] > 10
    assert rows[5]["n_words"] == 0 and rows[6]["n_words"] == 0


def test_gopher_flags_on_real_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = gopher_quality_flags(docs)
    n = out.count()
    assert n == docs.count()
    # signals are defined (non-null) for every row
    assert out.filter(F.col("gopher_keep").isNull()).count() == 0
    kept = out.filter("gopher_keep").count()
    assert 0 <= kept <= n


def test_corpus_profile_exact_and_bounded(spark, sf_dir):
    """corpus_profile on the real documents table: exact columns (counts,
    sums, decimal mean) match DuckDB exactly; sketch columns (HLL distinct,
    KLL percentiles) land within their documented error bounds of the exact
    DuckDB answers."""
    import duckdb

    from spark_ensemble_spark.operators.corpus import corpus_profile
    from spark_ensemble_spark.sources.datasets import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = {r["stratum"]: r for r in corpus_profile(docs, rsd=0.05).collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    toks = (
        "len(list_filter(list_transform(string_split(regexp_replace(lower(trim("
        "coalesce(text,''))), '\\s+', ' ', 'g'), ' '), l -> trim(l)), l -> l <> ''))"
    )
    fp = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
    want = {
        row[0]: row
        for row in con.execute(
            f"""
            SELECT source, count(*) AS n_docs,
                   sum({toks}) AS total_tokens,
                   count(DISTINCT {fp}) AS exact_distinct,
                   quantile_disc({toks}, 0.5) AS p50,
                   quantile_disc({toks}, 0.9) AS p90,
                   quantile_disc({toks}, 0.99) AS p99
            FROM documents GROUP BY source
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for s, w in want.items():
        g = got[s]
        assert g["n_docs"] == w[1]
        assert g["total_tokens"] == w[2]
        # HLL at rsd=0.05: allow 3 sigma
        assert abs(g["approx_distinct_fp"] - w[3]) <= max(3 * 0.05 * w[3], 2), (s, g, w)
        # percentile_approx with accuracy 10k on ≤10k rows is rank-exact up to
        # duplicates; allow the neighboring exact quantile as slack
        for i, (lo_p, hi_p) in enumerate([(0.45, 0.55), (0.85, 0.95), (0.95, 1.0)]):
            lo = con.execute(
                f"SELECT quantile_disc({toks}, {lo_p}) FROM documents WHERE source = ?",
                [s],
            ).fetchone()[0]
            hi = con.execute(
                f"SELECT quantile_disc({toks}, {hi_p}) FROM documents WHERE source = ?",
                [s],
            ).fetchone()[0]
            assert lo <= g["token_percentiles"][i] <= hi, (s, i, g["token_percentiles"], lo, hi)
        assert 0.0 <= g["dup_estimate"] <= 1.0


def test_streaming_enrichment_matches_batch_join(spark, sf_dir):
    """Stream-static broadcast enrichment equals the batch inner join."""
    import duckdb

    from spark_ensemble_spark.streaming.events import streaming_enriched_purchases

    got = {
        (r["event_id"], r["user_id"], r["segment"], r["value"])
        for r in streaming_enriched_purchases(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{sf_dir}/customer.parquet')"
    )
    want = set(
        con.execute(
            """
            SELECT event_id, user_id, c_mktsegment,
                   round(CAST(value AS DECIMAL(38,6)), 4)::DOUBLE
            FROM events JOIN customer ON user_id = c_custkey
            WHERE event_type = 'purchase'
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_curation_with_metrics_observe(spark, sf_dir):
    """observe() metrics must equal the stage counts computed the expensive
    way (separate actions), while the pipeline itself runs ONE action."""
    from spark_ensemble_spark.operators.corpus import curation_with_metrics
    from spark_ensemble_spark.operators.text import quality_score, token_count
    from spark_ensemble_spark.sources.datasets import load_table

    docs = load_table(spark, sf_dir, "documents")
    result, obs = curation_with_metrics(docs)
    n_out = result.count()  # the single action that also fills the metrics

    m_in = obs["in"].get
    m_kept = obs["kept"].get
    assert m_in["rows_in"] == docs.count()
    expensive = docs.select(
        token_count(F.col("text")).alias("n"),
        F.round(quality_score(F.col("text")), 6).alias("q"),
    ).filter((F.col("q") >= 0.3) & (F.col("n") >= 20))
    assert m_kept["rows_kept"] == expensive.count()
    assert m_kept["tokens_kept"] == expensive.agg(F.sum("n")).first()[0]
    assert 0 < n_out <= m_kept["rows_kept"]


def test_repetition_signals_planted(spark):
    """Hand-computed repetition fractions on planted documents."""
    from spark_ensemble_spark.operators.corpus import repetition_signals

    docs = spark.createDataFrame(
        [
            # 1: "a b a b a b": tokens 6, distinct 2 -> dup_token 4/6
            #    trigrams: "a b a","b a b","a b a","b a b" -> all 4 duplicated
            #    bigrams: ab x3, ba x2 -> top 3/5
            (1, "a b a b a b"),
            # 2: all distinct, no repeated grams
            (2, "one two three four"),
            # 3: fewer than 3 words: trigram fraction 0, bigram "xy" 1/1
            (3, "x y"),
            # 4: empty-ish
            (4, "   "),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in repetition_signals(docs).collect()
    }
    r1 = rows[1]
    assert r1.dup_token_fraction == pytest.approx(4 / 6, abs=1e-6)
    assert r1.dup_3gram_char_fraction == pytest.approx(1.0, abs=1e-6)
    assert r1.top_bigram_fraction == pytest.approx(3 / 5, abs=1e-6)
    r2 = rows[2]
    assert r2.dup_token_fraction == 0.0
    assert r2.dup_3gram_char_fraction == 0.0
    assert r2.top_bigram_fraction == pytest.approx(1 / 3, abs=1e-6)
    r3 = rows[3]
    assert r3.dup_3gram_char_fraction == 0.0
    assert r3.top_bigram_fraction == 1.0
    r4 = rows[4]
    assert (
        r4.dup_token_fraction,
        r4.dup_3gram_char_fraction,
        r4.top_bigram_fraction,
    ) == (0.0, 0.0, 0.0)


def test_temperature_mixing_rates_math(spark):
    """tau=1 reproduces natural shares; tau->0 flattens toward uniform; the
    budget rate never exceeds 1.0 and hits the budget in expectation."""
    from spark_ensemble_spark.operators.corpus import temperature_mixing_rates

    df = spark.createDataFrame(
        [("a", 900), ("b", 90), ("c", 10)], "source string, n int"
    )
    nat = {
        r.stratum: r.weight
        for r in temperature_mixing_rates(df, "source", "n", tau=1.0).collect()
    }
    assert nat["a"] == pytest.approx(0.9, abs=1e-6)
    assert nat["c"] == pytest.approx(0.01, abs=1e-6)
    flat = {
        r.stratum: r.weight
        for r in temperature_mixing_rates(df, "source", "n", tau=0.01).collect()
    }
    assert all(abs(w - 1 / 3) < 0.02 for w in flat.values())
    budget = temperature_mixing_rates(
        df, "source", "n", tau=0.5, token_budget=500
    ).collect()
    rates = {r.stratum: r.rate for r in budget}
    assert all(0.0 <= r <= 1.0 for r in rates.values())
    # tau<1 up-weights the small stratum relative to its share
    w = {r.stratum: r.weight for r in budget}
    s = {r.stratum: r.share for r in budget}
    assert w["c"] > s["c"] and w["a"] < s["a"]
    with pytest.raises(ValueError):
        temperature_mixing_rates(df, "source", "n", tau=0.0)


def test_unigram_logprob_ordering(spark):
    """Docs made of common tokens must outscore docs of rare tokens; empty
    docs come back with NULL score, not dropped."""
    from spark_ensemble_spark.operators.corpus import unigram_logprob_score

    rows = [(1, "the the the the"), (2, "the the zzzqx the"), (3, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in unigram_logprob_score(df).collect()}
    assert out[1].avg_logprob > out[2].avg_logprob
    assert out[3].n_tokens == 0 and out[3].avg_logprob is None
    # corpus-model identity: a doc of ONLY the modal token scores ln(p_modal)
    import math

    p_the = 7 / 8  # 7 'the' among 8 tokens
    assert out[1].avg_logprob == pytest.approx(round(math.log(p_the), 6), abs=2e-6)


def test_snapshot_diff_statuses(spark):
    from spark_ensemble_spark.operators.corpus import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will be removed")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same   text"), (2, "has changed"), (4, "brand new")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    # whitespace-only re-encode is NOT a change
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_dsir_weights_favor_target_like_docs(spark):
    """DSIR sanity on a constructed corpus: docs made of target-corpus
    vocabulary must out-score docs made of off-target vocabulary, and the
    Gumbel-top-k then picks target-like docs overwhelmingly."""
    from spark_ensemble_spark.operators.corpus import (
        dsir_log_weights,
        dsir_select,
    )

    target_like = [(i, "alpha beta gamma alpha beta " * 4) for i in range(10)]
    off_target = [(i + 100, "zeta eta theta zeta eta " * 4) for i in range(10)]
    raw = spark.createDataFrame(target_like + off_target, ["doc_id", "text"])
    tgt = spark.createDataFrame(
        [(1000 + i, "alpha beta gamma delta " * 6) for i in range(5)],
        ["doc_id", "text"],
    )
    scores = dsir_log_weights(raw, tgt, "text", "doc_id", buckets=512)
    by_id = {r.doc_id: r.log_weight for r in scores.collect()}
    assert len(by_id) == 20
    worst_target_like = min(by_id[i] for i in range(10))
    best_off_target = max(by_id[i + 100] for i in range(10))
    assert worst_target_like > best_off_target
    picked = {r.doc_id for r in dsir_select(scores, k=10, seed=3).collect()}
    assert len(picked & set(range(10))) >= 8  # noise can flip a doc or two


def test_dsir_select_deterministic_and_empty_text(spark):
    """Selection is a pure function of (id, seed): same frame, same top-k
    twice; changing the seed changes the Gumbel keys. Empty/NULL docs score
    (the '' token is a feature) rather than crash or vanish."""
    from spark_ensemble_spark.operators.corpus import (
        dsir_log_weights,
        dsir_select,
    )

    raw = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, None), (4, "alpha zeta")],
        ["doc_id", "text"],
    )
    tgt = raw.filter(F.col("doc_id") == 1)
    scores = dsir_log_weights(raw, tgt, "text", "doc_id", buckets=64)
    assert scores.count() == 4  # nobody dropped
    a = [(r.doc_id, r.sample_key) for r in dsir_select(scores, 2, seed=3).collect()]
    b = [(r.doc_id, r.sample_key) for r in dsir_select(scores, 2, seed=3).collect()]
    assert a == b
    c = {r.doc_id: r.sample_key for r in dsir_select(scores, 4, seed=9).collect()}
    assert {k for k, _ in a} <= set(c)
    assert any(c[k] != dict(a).get(k, c[k]) for k in c)  # seed moved a key


def test_leakage_safe_splits_cluster_atomic(spark):
    """Every near-dup component must land in ONE split (the whole point);
    unpaired docs keep their own id as the group key and match plain
    split_by_hash; reserved output names fail loudly; discovering MORE
    pairs only merges groups (keys never split apart)."""
    import pytest

    from spark_ensemble_spark.operators.corpus import (
        leakage_safe_splits,
        split_by_hash,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], ["doc_id", "text"]
    )
    # two components: {0,1,2} (chain) and {10, 11}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], ["id_a", "id_b"]
    )
    w = {"train": 0.5, "val": 0.25, "test": 0.25}
    out = leakage_safe_splits(docs, pairs, w, seed=3).collect()
    by_id = {r.doc_id: (r.split_group, r.split) for r in out}
    assert len(by_id) == 40
    assert {by_id[i] for i in (0, 1, 2)} == {(0, by_id[0][1])}
    assert {by_id[i] for i in (10, 11)} == {(10, by_id[10][1])}
    # unpaired docs: group = own id, split = plain split_by_hash draw
    plain = {
        r.doc_id: r.split
        for r in split_by_hash(docs, "doc_id", w, seed=3).collect()
    }
    for i in range(40):
        if i not in (0, 1, 2, 10, 11):
            assert by_id[i] == (i, plain[i])
    # merge monotonicity: linking the two components drops every member's
    # key to the global min
    more = pairs.union(spark.createDataFrame([(2, 10)], ["id_a", "id_b"]))
    out2 = {
        r.doc_id: r.split_group
        for r in leakage_safe_splits(docs, more, w, seed=3).collect()
    }
    assert {out2[i] for i in (0, 1, 2, 10, 11)} == {0}
    with pytest.raises(ValueError, match="split"):
        leakage_safe_splits(docs.withColumn("split", F.lit("x")), pairs, w)
    # precomputed-clusters fast path: identical output, no CC recompute
    from spark_ensemble_spark.operators.dedup import dup_clusters

    pre = dup_clusters(pairs)
    out3 = {
        (r.doc_id, r.split_group, r.split)
        for r in leakage_safe_splits(
            docs, weights=w, seed=3, clusters=pre
        ).collect()
    }
    assert out3 == {(r.doc_id, *by_id[r.doc_id]) for r in out}

    # input validation (r6 ADVICE): neither/both pair inputs are errors, not
    # silent no-guard splits or a silently-ignored pairs frame
    with pytest.raises(ValueError, match="near-dup evidence"):
        leakage_safe_splits(docs, weights=w)
    with pytest.raises(ValueError, match="not both"):
        leakage_safe_splits(docs, pairs, w, clusters=pre)


def test_dsir_empty_target_never_nulls_scores(spark):
    """An empty target distribution (empty target_df, or a target_col that is
    never true) must yield well-defined add-1-smoothed UNIFORM-target scores
    — never silently NULL every log_weight (ADVICE r5, same empty-snapshot
    class PSI fixed). Both wiring modes are exercised."""
    from spark_ensemble_spark.operators.corpus import dsir_log_weights

    raw = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "zeta eta"), (3, "alpha zeta")],
        ["doc_id", "text"],
    )
    empty_tgt = raw.filter(F.col("doc_id") < 0)
    scores = dsir_log_weights(raw, empty_tgt, "text", "doc_id", buckets=64)
    rows = scores.collect()
    assert len(rows) == 3
    assert all(r.log_weight is not None for r in rows), rows

    scores2 = dsir_log_weights(
        raw.withColumn("__never", F.lit(False)),
        text_col="text",
        id_col="doc_id",
        buckets=64,
        target_col="__never",
    )
    rows2 = scores2.collect()
    assert len(rows2) == 3
    assert all(r.log_weight is not None for r in rows2), rows2


def test_bigram_logprob_sees_transitions_unigram_misses(spark):
    """A scrambled doc keeps the exact unigram bag (identical unigram score)
    but breaks the transitions — only the bigram score separates them."""
    from spark_ensemble_spark.operators.corpus import (
        bigram_logprob_score,
        unigram_logprob_score,
    )

    fluent = "the quick brown fox jumps over the lazy dog"
    scrambled = "fox the over quick dog brown the jumps lazy"
    rows = [(i, fluent) for i in range(10)] + [(100, fluent), (101, scrambled)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uni = {r.doc_id: r.avg_logprob for r in unigram_logprob_score(df).collect()}
    bi = {r.doc_id: r.avg_logprob for r in bigram_logprob_score(df).collect()}
    assert uni[100] == uni[101]  # same bag, unigram blind
    assert bi[100] > bi[101]  # transitions expose the scramble
    empty = bigram_logprob_score(
        spark.createDataFrame([(1, "word"), (2, None)], ["doc_id", "text"])
    ).collect()
    assert {(r.doc_id, r.n_bigrams, r.avg_logprob) for r in empty} == {
        (1, 0, None),
        (2, 0, None),
    }


def test_filter_by_score_quantile_semantics(spark):
    """Exact-rank threshold: bottom-q rows drop, ties at the threshold all
    survive, NULL scores never pass the gate."""
    from spark_ensemble_spark.operators.corpus import (
        filter_by_score_quantile,
        score_quantile_threshold,
    )

    rows = [(1, 1.0), (2, 2.0), (3, 2.0), (4, 3.0), (5, 4.0), (6, None)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    # ceil(0.4*5)=2nd of [1,2,2,3,4] -> threshold 2.0
    assert score_quantile_threshold(df, "score", 0.4) == 2.0
    kept = {r.doc_id for r in filter_by_score_quantile(df, "score", 0.4).collect()}
    assert kept == {2, 3, 4, 5}  # both ties survive; NULL row does not


def test_pack_token_windows(spark):
    """Concat-and-cut packing manifest: offsets are the exact per-bucket
    cumsum in id order, window ids follow floor division, straddling is
    exactly start//cap != (end-1)//cap, and total windows per bucket is
    ceil(bucket_tokens/cap)."""
    from spark_ensemble_spark.operators.corpus import pack_token_windows

    rows = [
        (i, " ".join(f"w{k}" for k in range(3 + (i * 7) % 11))) for i in range(40)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in pack_token_windows(
        docs, capacity=10, num_buckets=4
    ).collect()}
    assert len(out) == 40
    # replay in plain python
    streams = {}
    for i in range(40):
        n = 3 + (i * 7) % 11
        b = i % 4
        start = streams.get(b, 0)
        streams[b] = start + n
        r = out[i]
        assert (r.bucket, r.n_tokens, r.start_offset) == (b, n, start)
        assert r.first_window == start // 10
        assert r.last_window == (start + n - 1) // 10
    # bucket window counts close: last doc's last_window+1 == ceil(total/cap)
    for b, total in streams.items():
        last = max(out[i].last_window for i in range(40) if i % 4 == b)
        assert last + 1 == -(-total // 10)
    with pytest.raises(ValueError, match="capacity"):
        pack_token_windows(docs, capacity=0)


def test_shuffle_shards_deterministic_and_seed_sensitive(spark):
    """Same seed -> identical (shard, pos) across runs; different seed ->
    a different permutation; shards partition the id set; positions are
    1..shard_size within each shard."""
    from spark_ensemble_spark.operators.corpus import shuffle_shards

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = {r.doc_id: (r.shard, r.pos) for r in shuffle_shards(docs, seed=17).collect()}
    b = {r.doc_id: (r.shard, r.pos) for r in shuffle_shards(docs, seed=17).collect()}
    c = {r.doc_id: (r.shard, r.pos) for r in shuffle_shards(docs, seed=18).collect()}
    assert a == b
    assert a != c  # a different seed reshuffles
    assert set(a) == set(range(200))
    by_shard = {}
    for doc, (sh, pos) in a.items():
        assert 0 <= sh < 8
        by_shard.setdefault(sh, []).append(pos)
    for sh, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # the order is not the identity (it's a shuffle)
    order = [d for d, _ in sorted(a.items(), key=lambda kv: (kv[1][0], kv[1][1]))]
    assert order != sorted(order)


def test_kn_bigram_logprob_by_hand(spark):
    """Worked example 'a b a b a c': cb(a,b)=2, cb(b,a)=2, cb(a,c)=1;
    h(a)=3, h(b)=2; N1+(a.)=2, N1+(b.)=1; cont(a)=cont(b)=cont(c)=1;
    types=3, D=0.75 — per-position probabilities and the floor-rounded
    mean match the formula computed in plain Python."""
    import math

    from spark_ensemble_spark.operators.corpus import kn_bigram_logprob_score

    docs = spark.createDataFrame(
        [(1, "a b a b a c"), (2, "x")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in kn_bigram_logprob_score(docs).collect()}

    def fr(x):  # the repo's floor-half-up at 1e-6
        return math.floor(x * 1e6 + 0.5) / 1e6

    p_ab = max(2 - 0.75, 0.0) / 3 + 0.75 * 2 / 3 * (1 / 3)
    p_ba = max(2 - 0.75, 0.0) / 2 + 0.75 * 1 / 2 * (1 / 3)
    p_ac = max(1 - 0.75, 0.0) / 3 + 0.75 * 2 / 3 * (1 / 3)
    lps = {("a", "b"): fr(math.log(p_ab)), ("b", "a"): fr(math.log(p_ba)),
           ("a", "c"): fr(math.log(p_ac))}
    want = fr((lps[("a", "b")] * 2 + lps[("b", "a")] * 2 + lps[("a", "c")]) / 5)
    assert out[1].n_bigrams == 5
    assert out[1].avg_logprob == want
    # KN property: the continuation backoff is context-diversity, so the
    # versatile follower 'b' (follows a) beats the one-off 'c' per position
    assert p_ab > p_ac
    # single-token doc: no bigram positions, NULL score, never dropped
    assert out[2].n_bigrams == 0 and out[2].avg_logprob is None


def test_pack_window_spans_tile_exactly(spark):
    """Spans tile every window exactly: per (bucket, window), slice lengths
    sum to capacity for full windows and to the bucket-stream remainder for
    the last; offsets are consistent (a window's spans start at 0 and are
    contiguous); a document's spans cover [0, n_tokens) without overlap."""
    from spark_ensemble_spark.operators.corpus import (
        pack_token_windows,
        pack_window_spans,
    )

    texts = {
        0: "w " * 700,        # straddles two 512-windows in its bucket
        1: "x " * 100,
        8: "y " * 600,        # same bucket as doc 0 (id % 8)
        2: "",                # whitespace token_count counts this as 1
        3: "z " * 512,        # exactly one full window
    }
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in texts.items()], "doc_id long, text string"
    )
    manifest = pack_token_windows(docs, capacity=512, num_buckets=8)
    spans = pack_window_spans(manifest, capacity=512).collect()
    # a TRUE zero-token manifest row (custom counters produce them) emits
    # no spans; the whitespace token_count convention never does (empty
    # text splits to one '' token, matching the manifest oracle)
    from spark_ensemble_spark.operators.corpus import pack_window_spans as pws
    zero = spark.createDataFrame(
        [(9, 0, 0, 40, 0, 0)],
        "doc_id long, bucket int, n_tokens long, start_offset long,"
        " first_window long, last_window long",
    )
    assert pws(zero, capacity=512).count() == 0
    # per-document coverage: slices partition [0, n_tokens)
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append((r.doc_slice_start, r.slice_len))
    n_tok = {i: max(len(t.split()), 1) for i, t in texts.items()}
    for d, sl in by_doc.items():
        sl.sort()
        pos = 0
        for start, ln in sl:
            assert start == pos and ln > 0
            pos += ln
        assert pos == n_tok[d]
    # per-window tiling: contiguous from offset 0, full windows sum to 512
    by_win = {}
    for r in spans:
        by_win.setdefault((r.bucket, r.window_id), []).append(
            (r.window_offset, r.slice_len)
        )
    totals = {}
    for key, sl in by_win.items():
        sl.sort()
        pos = 0
        for off, ln in sl:
            assert off == pos, (key, sl)
            pos += ln
        totals[key] = pos
    # bucket of docs 0+8: stream is 700+600=1300 tokens -> windows of
    # 512, 512, 276
    b08 = sorted(v for (b, _), v in totals.items() if b == 0)
    assert b08 == [276, 512, 512]
