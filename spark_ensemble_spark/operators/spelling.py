"""Query spelling correction: SymSpell-style deletion-neighborhood lookup.

Search front ends correct typos BEFORE the index probe ("did you mean").
The classic scalable construction (Garbe's SymSpell; Norvig's spelling
corrector is the brute-force ancestor) pre-computes, for every vocabulary
term, all variants obtained by deleting up to ``max_edits`` characters;
a query term's own deletion variants then EQUI-JOIN the index, and an
exact Levenshtein check + frequency rank picks the correction. No
wildcard scans, no cross join: candidate generation is a hash join on
variant strings.

Recall contract (depth 1, the default here): the candidate set covers
every pair reachable by ≤1 deletion per side — ALL distance-1 pairs
(insert/delete/substitute-via-shared-deletion) and the distance-2 pairs
whose edits align as one deletion on each side (e.g. transpositions,
delete+insert). A distance-2 pair of two SUBSTITUTIONS at different
positions shares no single-deletion variant and is not generated; full
distance-2 recall needs a depth-2 index (every 2-deletion variant,
vocab × len² rows — the standard SymSpell trade, a drop-in change to
``_deletion_variants``).

Spark-first shape:

* the **deletion index** is one narrow projection + explode over the
  vocabulary — vocab-sized × (term length + 1) rows per edit (the
  SymSpell space/time trade), built once and persisted like any other
  serving index;
* **correction** explodes the (tiny) query side the same way, equi-joins
  the index on ``variant``, verifies with ``levenshtein`` (unit-cost
  edits — Spark and DuckDB agree exactly), and picks per query term the
  lexicographically best ``(distance, -freq, term)`` — fully
  deterministic, no floats anywhere.

At 100 TB the vocabulary (and hence the index) is dictionary-sized, the
query batch is broadcast, and the corpus is never touched — the same
posture as the BM25 query-vocab prune.

Reference parity: no spelling surface in the reference engine —
beyond-reference LLM/search-pipeline scope (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _deletion_variants(term: Column) -> Column:
    """All distinct strings obtained by deleting exactly ONE character,
    plus the term itself (distance-0 match path). Sorted for determinism
    of the array (the explode order never matters downstream)."""
    one_del = F.transform(
        F.sequence(F.lit(1), F.length(term)),
        lambda i: F.concat(
            F.substring(term, F.lit(1), i - 1),
            term.substr(i + 1, F.length(term)),
        ),
    )
    return F.array_sort(F.array_distinct(F.concat(F.array(term), one_del)))


def _deletion_variants_sql(term: str) -> str:
    return (
        f"list_sort(list_distinct(list_append("
        f"list_transform(range(1, len({term}) + 1),"
        f" i -> substr({term}, 1, i - 1) || substr({term}, i + 1)),"
        f" {term})))"
    )


def deletion_index(
    vocab: DataFrame, term_col: str = "term", freq_col: str = "freq"
) -> DataFrame:
    """``(variant, term, freq)`` — the persisted SymSpell index for
    ``max_edits=1``: every vocabulary term under its own spelling and
    each single-deletion variant."""
    return vocab.select(
        F.explode(_deletion_variants(F.col(term_col))).alias("variant"),
        F.col(term_col).alias("term"),
        F.col(freq_col).cast("long").alias("freq"),
    )


def correct_terms(
    query_terms: DataFrame,
    index: DataFrame,
    max_distance: int = 2,
    qterm_col: str = "qterm",
) -> DataFrame:
    """Best correction per query term.

    Candidates = index rows sharing a deletion variant with the query
    term (all distance-1 pairs and the distance-2 pairs that align as one
    deletion per side — see the module docstring's recall contract);
    verification = exact ``levenshtein`` ≤ ``max_distance``; choice =
    smallest ``(distance, -freq, term)``.
    Query terms with no candidate surface with NULL correction (rows are
    never dropped — the caller decides fallback policy). Returns
    ``qterm, correction, distance, freq, n_candidates``."""
    q0 = query_terms.select(F.col(qterm_col).alias("qterm"))
    q = q0.select(
        "qterm",
        F.explode(_deletion_variants(F.col("qterm"))).alias("variant"),
    )
    cand = (
        q.join(index, "variant")
        .select("qterm", "term", "freq")
        .distinct()
        .withColumn("distance", F.levenshtein("qterm", "term"))
        .filter(F.col("distance") <= max_distance)
    )
    w = Window.partitionBy("qterm").orderBy(
        F.col("distance"), F.col("freq").desc(), F.col("term")
    )
    best = (
        cand.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy("qterm"))
        )
        .filter(F.col("__rn") == 1)
        .select(
            "qterm",
            F.col("term").alias("correction"),
            F.col("distance").cast("long").alias("distance"),
            "freq",
            F.col("__n").cast("long").alias("n_candidates"),
        )
    )
    return (
        query_terms.select(F.col(qterm_col).alias("qterm"))
        .distinct()
        .join(best, "qterm", "left")
        .select(
            "qterm",
            "correction",
            "distance",
            F.col("freq").alias("freq"),
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
        )
    )


def correct_terms_sql(
    vocab_sql: str,
    query_terms_sql: str,
    max_distance: int = 2,
) -> str:
    """DuckDB replay: ``vocab_sql`` yields (term, freq), ``query_terms_sql``
    yields (qterm). Same deletion neighborhoods, same verification, same
    deterministic pick."""
    return f"""
    WITH vocab AS MATERIALIZED ({vocab_sql}),
    idx AS MATERIALIZED (
      SELECT unnest({_deletion_variants_sql('term')}) AS variant,
             term, CAST(freq AS BIGINT) AS freq
      FROM vocab
    ),
    qt AS MATERIALIZED (SELECT DISTINCT qterm FROM ({query_terms_sql})),
    qv AS (
      SELECT qterm, unnest({_deletion_variants_sql('qterm')}) AS variant
      FROM qt
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT qterm, term, freq FROM qv JOIN idx USING (variant)
    ),
    verified AS (
      SELECT * FROM (
        SELECT qterm, term, freq, levenshtein(qterm, term) AS distance
        FROM cand
      ) WHERE distance <= {max_distance}
    ),
    ranked AS (
      SELECT qterm, term, freq, distance,
             row_number() OVER (
               PARTITION BY qterm
               ORDER BY distance, freq DESC, term) AS rn,
             count(*) OVER (PARTITION BY qterm) AS n
      FROM verified
    )
    SELECT q.qterm,
           r.term AS correction,
           CAST(r.distance AS BIGINT) AS distance,
           r.freq AS freq,
           CAST(coalesce(r.n, 0) AS BIGINT) AS n_candidates
    FROM qt q LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
      ON r.qterm = q.qterm
    """


def prefix_suggest(
    vocab: DataFrame,
    min_len: int = 2,
    max_len: int = 4,
    topk: int = 3,
    term_col: str = "term",
    freq_col: str = "freq",
) -> DataFrame:
    """Search-suggest: the top-``topk`` completions per term prefix
    (lengths ``min_len..max_len``), ranked by ``(freq DESC, term)``.
    The prefix index is vocab-sized × (max_len − min_len + 1) — the same
    growth class as the deletion index — and serving is a point lookup.
    Returns ``(prefix, rank, term, freq)``."""
    pre = vocab.select(
        F.col(term_col).alias("term"),
        F.col(freq_col).cast("long").alias("freq"),
    ).filter(F.length("term") >= min_len)
    prefixes = pre.select(
        "term",
        "freq",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(min_len), F.least(F.length("term"), F.lit(max_len))
                ),
                lambda n: F.col("term").substr(F.lit(1), n),
            )
        ).alias("prefix"),
    )
    w = Window.partitionBy("prefix").orderBy(
        F.col("freq").desc(), F.col("term")
    )
    return (
        prefixes.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("prefix", F.col("rank").cast("long").alias("rank"), "term", "freq")
    )


def prefix_suggest_sql(
    vocab_sql: str, min_len: int = 2, max_len: int = 4, topk: int = 3
) -> str:
    return f"""
    WITH vocab AS MATERIALIZED ({vocab_sql}),
    pre AS (
      SELECT term, CAST(freq AS BIGINT) AS freq,
             unnest(list_transform(
               range({min_len}, least(len(term), {max_len}) + 1),
               n -> substr(term, 1, n))) AS prefix
      FROM vocab WHERE len(term) >= {min_len}
    ),
    ranked AS (
      SELECT prefix, term, freq,
             row_number() OVER (
               PARTITION BY prefix ORDER BY freq DESC, term) AS rank
      FROM pre
    )
    SELECT prefix, CAST(rank AS BIGINT) AS rank, term, freq
    FROM ranked WHERE rank <= {topk}
    """
