"""Late-interaction (MaxSim) reranking — the ColBERT serving pattern.

The third retrieval paradigm next to BM25 (one score per term, bag-of-words)
and dense ANN (one vector per document): every TOKEN carries a vector, and a
candidate's score is ``Σ_{q-token} max_{d-token} sim(qv, dv)`` (Khattab &
Zaharia 2020, "ColBERT: Efficient and Effective Passage Search via
Contextualized Late Interaction"). Production runs it exactly as staged
here — a cheap first stage (BM25 / ANN) recalls a shortlist, MaxSim reranks
it — because the token-pair interaction is too expensive for full-corpus
scans but trivially affordable on a shortlist.

Token vectors are an INPUT (``(id, token, vec)`` frames) — production
supplies learned embeddings (a contextualized encoder's output landed as a
table; per-token rows are exactly how a ColBERT index is stored).
:func:`hash_token_vectors` supplies the deterministic fixture: components
derived from md5 of (token, dim-index) on an exact ``k/1024`` grid, so the
DuckDB oracle replays the whole pipeline — vectors, cosines, max, sum,
ranks — bit-for-bit (the synthetic-codec posture of ``multimodal.py``: the
plumbing under test is real, the fixture is replayable).

Plan shape: the shortlist (k·|queries| rows) joins the query-token frame
and BROADCASTS against the doc-token frame — the corpus-token table is
probed, never shuffled; everything after the probe is
shortlist-token-pair-sized. Scores stay exact: cosines floor-round onto
the 1e-6 grid, the per-query-token maxima are exact grid points, and the
final sum is integer-scaled BIGINT (the LTR/BM25 summation idiom) — no
float in any sort key.

Reference parity: the reference engine has no retrieval surface — this is
beyond-reference LLM-pipeline scope (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spark_ensemble_spark.functions.rounding import (
    floor_round as _floor_round,
    floor_round_int as _floor_round_int,
)
from spark_ensemble_spark.operators.corpus import _words
from spark_ensemble_spark.operators.similarity import cosine, guarded_cosine_sql

# component grid: md5-derived residue in [-1024, 1024] / 1024 — a power-of-
# two denominator, so every component is an EXACT double on both engines
_MOD = 2049
_DEN = 1024.0


def _hash_component(token: Column, i: int) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(token, F.lit(f"#{i}"))), 1, 15), 16, 10
    ).cast("long")
    return (F.pmod(h, F.lit(_MOD)) - F.lit(1024)).cast("double") / F.lit(_DEN)


def hash_token_vectors(
    df: DataFrame, token_col: str = "token", dim: int = 8
) -> DataFrame:
    """Attach the deterministic fixture vector: ``vec[i] =
    ((md5_60bit(token ║ '#i') mod 2049) − 1024) / 1024`` — exact grid
    doubles, cross-engine replayable (the dedup md5 convention). Swap this
    frame for a learned token-embedding table and nothing downstream
    changes."""
    vec = F.array(*[_hash_component(F.col(token_col), i) for i in range(dim)])
    return df.withColumn("vec", vec)


def hash_token_vector_sql(token_expr: str, dim: int = 8) -> str:
    """DuckDB mirror of :func:`hash_token_vectors`' vector literal."""
    comps = []
    for i in range(dim):
        h = f"(('0x' || substring(md5({token_expr} || '#{i}'), 1, 15))::BIGINT)"
        comps.append(f"(({h} % {_MOD}) - 1024) / {_DEN!r}")
    return "[" + ", ".join(comps) + "]"


def distinct_token_vectors(
    df: DataFrame,
    text_col: str,
    id_col: str,
    out_id: str,
    dim: int = 8,
) -> DataFrame:
    """``(out_id, token, vec)`` for each DISTINCT token of each row's text —
    MaxSim's max over doc tokens depends only on the distinct token set, so
    deduping before the pair join cuts the interaction cost by each doc's
    repetition factor for free."""
    toks = df.select(
        F.col(id_col).alias(out_id),
        F.explode(_words(F.col(text_col))).alias("token"),
    ).dropDuplicates([out_id, "token"])
    return hash_token_vectors(toks, dim=dim)


def maxsim_rerank(
    doc_tokens: DataFrame,
    query_tokens: DataFrame,
    shortlist: DataFrame,
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Rerank a shortlist by MaxSim: per (query, candidate), each query
    token takes the max floor-rounded cosine over the candidate's tokens,
    and the per-token maxima sum as exact 1e-6-scaled BIGINTs. Returns
    ``(query_id, doc_id, maxsim, rank)``, rank by (score desc, doc asc) on
    the exact integer — tie-hazard-free by construction.

    ``doc_tokens``: ``(doc_id, token, vec)``; ``query_tokens``:
    ``(query_id, token, vec)``; ``shortlist``: any frame with
    ``(query_id, doc_id)``."""
    cand = shortlist.select("query_id", "doc_id").dropDuplicates(
        ["query_id", "doc_id"]
    )
    q = query_tokens.select(
        "query_id", F.col("token").alias("__qt"), F.col("vec").alias("__qv")
    )
    d = doc_tokens.select(
        "doc_id", F.col("token").alias("__dt"), F.col("vec").alias("__dv")
    )
    # (query, cand, q-token) is shortlist-sized × query length — broadcast it
    # into the doc-token probe so the corpus-token table never shuffles; the
    # query-token frame itself is |queries|·|q-tokens| rows, broadcast too
    # (without the hint Spark sort-merges two frames it has no stats for)
    probes = cand.join(F.broadcast(q), "query_id")
    pairs = d.join(F.broadcast(probes), "doc_id")
    sim = _floor_round(cosine(F.col("__qv"), F.col("__dv")), round_to)
    per_qt = pairs.groupBy("query_id", "doc_id", "__qt").agg(
        F.max(sim).alias("__m")
    )
    scored = per_qt.groupBy("query_id", "doc_id").agg(
        F.sum(_floor_round_int(F.col("__m"), round_to)).alias("__si")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__si"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            (F.col("__si").cast("double") / F.lit(float(10**round_to))).alias(
                "maxsim"
            ),
            "rank",
        )
    )


def maxsim_oracle_sql(
    shortlist_sql: str,
    queries_sql: str,
    k: int = 5,
    dim: int = 8,
    round_to: int = 6,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replay of the full fixture pipeline: distinct-token explode,
    md5-grid vectors, guarded sequential-fold cosines, floor-rounded max,
    integer-scaled sum, (score desc, id asc) rank. ``shortlist_sql`` emits
    at least ``(query_id, doc_id)``; ``queries_sql`` emits ``(query_id,
    query_text)``."""
    from spark_ensemble_spark.functions.rounding import (
        floor_round_int_sql,
        floor_round_sql,
    )

    scale = float(10**round_to)
    vec = hash_token_vector_sql("token", dim)
    cos = guarded_cosine_sql("dt.vec", "qt.vec")
    return f"""
    WITH sl AS (SELECT DISTINCT query_id, {id_col} AS doc_id FROM ({shortlist_sql})),
    qsrc AS ({queries_sql}),
    dtok AS (
      SELECT DISTINCT {id_col} AS doc_id, u.t AS token
      FROM {table},
           unnest(string_split(regexp_replace(lower(trim(coalesce({text_col}, ''))),
                               '\\s+', ' ', 'g'), ' ')) AS u(t)
      WHERE u.t != ''
    ),
    qtok AS (
      SELECT DISTINCT query_id, u.t AS token
      FROM qsrc,
           unnest(string_split(regexp_replace(lower(trim(coalesce(query_text, ''))),
                               '\\s+', ' ', 'g'), ' ')) AS u(t)
      WHERE u.t != ''
    ),
    dt AS (SELECT doc_id, token, {vec} AS vec FROM dtok),
    qt AS (SELECT query_id, token, {vec} AS vec FROM qtok),
    per_qt AS (
      SELECT sl.query_id, sl.doc_id, qt.token,
             max({floor_round_sql(cos, round_to)}) AS m
      FROM sl
      JOIN qt ON qt.query_id = sl.query_id
      JOIN dt ON dt.doc_id = sl.doc_id
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT query_id, doc_id,
             sum({floor_round_int_sql('m', round_to)}) AS si
      FROM per_qt GROUP BY 1, 2
    )
    SELECT query_id, doc_id,
           CAST(si AS DOUBLE) / {scale!r} AS maxsim,
           rank
    FROM (
      SELECT *, CAST(row_number() OVER (
                  PARTITION BY query_id ORDER BY si DESC, doc_id
                ) AS INT) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """
