"""Preference-data preparation: Bradley-Terry strength fitting.

RLHF / preference-tuning pipelines aggregate millions of pairwise
comparisons ("response A beat response B") into per-item strength scores —
for grading annotators, ranking data sources, filtering inconsistent
raters, and building Elo-style leaderboards over generation policies. The
canonical model is Bradley-Terry (1952): ``P(i beats j) = p_i/(p_i+p_j)``,
fit by Hunter's (2004) MM algorithm:

    p_i  <-  w_i / SUM_j n_ij / (p_i + p_j)

where ``w_i`` is item i's total wins and ``n_ij`` the number of
comparisons between i and j.

Exactness contract — the same discipline as ``operators/graph.pagerank``:
EXACT INTEGER arithmetic end to end, so the fitted strengths are
bit-deterministic under any partitioning and fully SQL-replayable:

* strengths live on a ``10^9`` integer grid (BIGINT ``p``), initialised
  at ``SCALE`` (strength 1.0),
* the per-pair denominator term is ``(n_ij * SCALE * QSCALE) DIV
  (p_i + p_j)`` — the multiply runs in DECIMAL(38,0) on Spark and HUGEINT
  in DuckDB (both exact 128-bit), and the single flooring division IS the
  spec, identical everywhere,
* the update is ``(w_i * SCALE * QSCALE) DIV T_i`` on the exact BIGINT
  sum ``T_i``; a normalisation step rescales so strengths sum to
  ``K * SCALE`` (the MM iteration is scale-invariant — without this the
  raw fixed point drifts),
* strengths clamp at ``MIN_P = SCALE DIV 10^6`` (items with zero wins
  have MLE 0; the clamp bounds the support like additive smoothing and
  keeps every denominator positive).

BIGINT headroom: with the clamp, a per-pair term is at most
``n_ij * SCALE * QSCALE / (2 * MIN_P) = n_ij * 5 * 10^11``, so an item's
denominator sum stays under 2^63 up to ~1.8 * 10^7 comparisons against
fully-collapsed opponents, and up to ~1.8 * 10^13 in the normal regime
(opponents near the grid) — comfortably past 100 TB comparison logs.

Scale shape: ``wins`` and ``pairs`` are one map-side-combined aggregation
each over the comparison log; afterwards every iteration touches only the
(item) and (item-pair) frames — model-sized, NOT data-sized — with two
equi-joins on the item key and one grouped sum. The comparison log is
read exactly once. Lineage is truncated through ``DFIterationCache``.

Reference parity: the reference engine has no preference surface — this
is beyond-reference LLM-pipeline scope (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**9  # strength grid
QSCALE = 10**6  # per-pair quotient grid
MIN_P = SCALE // 10**6  # clamp: minimum representable strength (1e-6)
_BIG = SCALE * QSCALE  # 10^15 — the exact-integer numerator scale


def pair_documents(
    docs: DataFrame,
    n_buckets: int = 50,
    seed: int = 0,
) -> DataFrame:
    """Deterministic document matchups for the BT demo/oracle: bucket every
    doc by its md5-60-bit hash (the repo's replay-safe draw — stable under
    retries/repartitioning, unlike ``rand()``), order each bucket by
    ``doc_id``, and compare CONSECUTIVE docs (a sliding window, so a doc
    can appear in up to two matchups). The longer text wins (``n_chars``),
    ties to the smaller ``doc_id``; same-source matchups are dropped
    (items here are sources — a source cannot beat itself).

    Output: ``(winner, loser)`` one row per comparison. One narrow
    projection + one window over md5 buckets — no join, no self-join."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("", F.col("doc_id").cast("string"), F.lit(f":{seed}"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    d = docs.select(
        "doc_id", "source", "n_chars", (h % F.lit(n_buckets)).alias("bucket")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("bucket").orderBy("doc_id")
    seq = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.lead("doc_id").over(w).alias("nid"),
        F.lead("source").over(w).alias("nsource"),
        F.lead("n_chars").over(w).alias("nchars2"),
    ).where(F.col("nid").isNotNull() & (F.col("source") != F.col("nsource")))
    left_wins = (F.col("n_chars") > F.col("nchars2")) | (
        (F.col("n_chars") == F.col("nchars2")) & (F.col("doc_id") < F.col("nid"))
    )
    return seq.select(
        F.when(left_wins, F.col("source")).otherwise(F.col("nsource")).alias("winner"),
        F.when(left_wins, F.col("nsource")).otherwise(F.col("source")).alias("loser"),
    )


def pair_documents_sql(n_buckets: int = 50, seed: int = 0) -> str:
    """DuckDB SQL emitting the identical ``(winner, loser)`` rows."""
    return f"""
    SELECT CASE WHEN n_chars > nchars2 OR (n_chars = nchars2 AND doc_id < nid)
                THEN source ELSE nsource END AS winner,
           CASE WHEN n_chars > nchars2 OR (n_chars = nchars2 AND doc_id < nid)
                THEN nsource ELSE source END AS loser
    FROM (
      SELECT doc_id, source, n_chars,
             lead(doc_id) OVER w AS nid,
             lead(source) OVER w AS nsource,
             lead(n_chars) OVER w AS nchars2
      FROM (
        SELECT doc_id, source, n_chars,
               ('0x' || substring(md5(doc_id::VARCHAR || ':{seed}'), 1, 15))::BIGINT
                 % {n_buckets} AS bucket
        FROM documents
      )
      WINDOW w AS (PARTITION BY bucket ORDER BY doc_id)
    )
    WHERE nid IS NOT NULL AND source <> nsource
    """


def pair_stats(
    comparisons: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> DataFrame:
    """Collapse a comparison log to its COMPLETE sufficient statistic:
    one row per unordered item pair ``(a, b, n, wins_a)`` with
    ``a < b``, ``n`` total comparisons, ``wins_a`` won by ``a``. Plain
    integer sums — MERGEABLE by re-aggregation (the rollup-store
    posture), which is what makes the streaming maintenance below exact:
    a union of per-batch partials re-summed equals the from-scratch
    aggregate bit-for-bit. This is the one data-sized shuffle in the
    whole fit."""
    comp = comparisons.select(
        F.col(winner_col).alias("winner"), F.col(loser_col).alias("loser")
    )
    return comp.groupBy(
        F.least("winner", "loser").alias("a"),
        F.greatest("winner", "loser").alias("b"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("winner") == F.least("winner", "loser"), 1).otherwise(0)
        ).alias("wins_a"),
    )


def merge_pair_stats(partials: DataFrame) -> DataFrame:
    """Re-aggregate a union of :func:`pair_stats` partials (exact integer
    sums — merge order free)."""
    return partials.groupBy("a", "b").agg(
        F.sum("n").alias("n"), F.sum("wins_a").alias("wins_a")
    )


def bradley_terry(
    comparisons: DataFrame,
    n_iters: int = 8,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> DataFrame:
    """Fit Bradley-Terry strengths over a ``(winner, loser)`` comparison
    log with ``n_iters`` exact-integer MM rounds. Returns one row per item:
    ``(item, strength_scaled BIGINT, strength DOUBLE, wins BIGINT,
    n_comparisons BIGINT, rank INT)`` with ``strength =
    strength_scaled / 10^9`` (one division of the same exact integer —
    identical on every engine) and ``rank`` 1-based by descending strength
    (item-name tie-break)."""
    return fit_pair_stats(
        pair_stats(comparisons, winner_col, loser_col), n_iters=n_iters
    )


def fit_pair_stats(stats: DataFrame, n_iters: int = 8) -> DataFrame:
    """The MM fit from a ``(a, b, n, wins_a)`` pair-stats frame (see
    :func:`pair_stats`); after the stats collapse, every round touches
    only item- and pair-sized frames — model-sized, never data-sized.

    When the collapsed pair table fits under ``SPARK_GRAFT_BT_LOCAL_PAIRS_MAX``
    (default 65536 — model-sized by construction: one row per unordered
    item pair), the MM rounds run DRIVER-SIDE on the collected statistic
    instead: the distributed loop pays 2 joins + a grouped sum + a
    windowed rescale of a K-row frame PER ROUND in pure scheduling latency
    (measured 12-16s for 8 rounds over the sf0.1 source vocabulary, r12 —
    the tokenizer-trainer finding: tiny-frame iteration is driver latency,
    not data work). Python integers replay the exact-integer contract
    above verbatim (arbitrary precision ≥ DECIMAL(38,0); flooring ``div``
    of non-negative operands == ``//``), so the fitted strengths are
    bit-identical — asserted path-vs-path by tests/test_preference.py.
    Larger pair tables keep the distributed loop unchanged."""
    import os

    local_max = int(os.environ.get("SPARK_GRAFT_BT_LOCAL_PAIRS_MAX", "65536"))
    if local_max > 0:
        probe = stats.select("a", "b", "n", "wins_a").limit(local_max + 1).collect()
        if len(probe) <= local_max:
            return _fit_pair_stats_local(
                stats.sparkSession,
                probe,
                n_iters,
                stats.schema["a"].dataType.simpleString(),
            )
    from spark_ensemble_spark.core.utils import DFIterationCache

    pairs = stats.select("a", "b", F.col("n").cast("long").alias("n"))
    wins = (
        stats.select(F.col("a").alias("item"), F.col("wins_a").alias("w"))
        .unionByName(
            stats.select(
                F.col("b").alias("item"), (F.col("n") - F.col("wins_a")).alias("w")
            )
        )
        .groupBy("item")
        .agg(F.sum("w").cast("long").alias("w"))
    )
    items = wins.select("item")

    k = items.count()  # scalar model order: bounded driver state
    # interval=2: the strength frame is referenced TWICE per round (pa/pb),
    # so the analyzed plan grows ~4x per un-truncated round; the frame is
    # model-sized (one row per item), so truncating every other round is
    # cheap and keeps analysis bounded.
    cache = DFIterationCache(interval=2)
    wins = cache.update(wins)
    pairs = cache.update(pairs)
    p = cache.update(items.withColumn("p", F.lit(SCALE).cast("long")))

    term = F.expr(f"CAST((CAST(n AS DECIMAL(38,0)) * {_BIG}) div (pa + pb) AS LONG)")
    for _ in range(n_iters):
        joined = (
            pairs.join(p.select(F.col("item").alias("a"), F.col("p").alias("pa")), "a")
            .join(p.select(F.col("item").alias("b"), F.col("p").alias("pb")), "b")
            .withColumn("t", term)
        )
        denom = (
            joined.select(F.col("a").alias("item"), "t")
            .unionByName(joined.select(F.col("b").alias("item"), "t"))
            .groupBy("item")
            .agg(F.sum("t").alias("T"))
        )
        unnorm = wins.join(denom, "item").select(
            "item",
            F.greatest(
                F.expr(f"CAST((CAST(w AS DECIMAL(38,0)) * {_BIG}) div T AS LONG)"),
                F.lit(MIN_P),
            ).alias("p"),
        )
        # normalisation total as an unpartitioned window — the frame is
        # model-sized (one row per item), so the single-partition window
        # is a K-row sort, never a data-sized funnel.
        from pyspark.sql.window import Window

        total = F.sum(F.col("p").cast("decimal(38,0)")).over(
            Window.partitionBy()
        )
        p = cache.update(
            unnorm.withColumn("total", total).select(
                "item",
                F.greatest(
                    F.expr(
                        f"CAST((CAST(p AS DECIMAL(38,0)) * {k * SCALE}) div total AS LONG)"
                    ),
                    F.lit(MIN_P),
                ).alias("p"),
            )
        )

    n_comps = (
        pairs.select(F.col("a").alias("item"), "n")
        .unionByName(pairs.select(F.col("b").alias("item"), "n"))
        .groupBy("item")
        .agg(F.sum("n").alias("n_comparisons"))
    )
    from pyspark.sql.window import Window

    out = (
        p.join(wins, "item")
        .join(n_comps, "item")
        .select(
            "item",
            F.col("p").alias("strength_scaled"),
            (F.col("p").cast("double") / F.lit(float(SCALE))).alias("strength"),
            F.col("w").alias("wins"),
            F.col("n_comparisons").cast("long").alias("n_comparisons"),
            F.row_number()
            .over(Window.orderBy(F.col("p").desc(), F.col("item")))
            .cast("int")
            .alias("rank"),
        )
    )
    cache.close()
    return out


def _fit_pair_stats_local(
    spark, rows, n_iters: int, item_type: str
) -> DataFrame:
    """Driver-side replay of the distributed MM loop over a collected
    pair-stats list — the same exact-integer iteration, term for term:
    ``t = (n·10¹⁵) // (p_a + p_b)`` per pair, ``p = max(w·10¹⁵ // T,
    MIN_P)``, then the normalise-and-clamp rescale ``p = max(p·K·10⁹ //
    Σp, MIN_P)``. Python ints are exact at any width (the Spark side runs
    the multiplies in DECIMAL(38,0)), and flooring division of
    non-negative operands is ``//`` on both engines, so every strength is
    bit-identical to the distributed fixed point. Returns the result as a
    pure-JVM VALUES frame with the distributed output schema."""
    from collections import defaultdict

    from spark_ensemble_spark.sources.datasets import local_df

    wins: dict = defaultdict(int)
    ncmp: dict = defaultdict(int)
    pairs = []
    for r in rows:
        a, b, n, wa = r["a"], r["b"], int(r["n"]), int(r["wins_a"])
        pairs.append((a, b, n))
        wins[a] += wa
        wins[b] += n - wa
        ncmp[a] += n
        ncmp[b] += n
    items = list(wins)
    k = len(items)
    p = {i: SCALE for i in items}
    for _ in range(n_iters):
        denom: dict = defaultdict(int)
        for a, b, n in pairs:
            t = (n * _BIG) // (p[a] + p[b])
            denom[a] += t
            denom[b] += t
        p = {i: max((wins[i] * _BIG) // denom[i], MIN_P) for i in items}
        total = sum(p.values())
        p = {i: max((p[i] * (k * SCALE)) // total, MIN_P) for i in items}
    order = sorted(items, key=lambda i: (-p[i], i))
    out_rows = [
        (i, p[i], p[i] / float(SCALE), wins[i], ncmp[i], r + 1)
        for r, i in enumerate(order)
    ]
    return local_df(
        spark,
        out_rows,
        f"item {item_type}, strength_scaled bigint, strength double, "
        "wins bigint, n_comparisons bigint, rank int",
    )


def bradley_terry_oracle_sql(comparisons_sql: str, n_iters: int = 8) -> str:
    """DuckDB replay of :func:`bradley_terry`: the MM rounds UNROLL as
    chained MATERIALIZED CTEs (two per step — denominator sums, then the
    normalised update) with identical integer arithmetic (HUGEINT
    multiply, ``//`` floor — DuckDB ``//`` == Spark ``div`` on
    non-negative operands). Unrolled rather than RECURSIVE for the same
    reason as the PageRank oracle: DuckDB 1.0.0 recursive CTEs
    mis-aggregate with correlated subterms. ``comparisons_sql`` emits
    ``(winner, loser)``."""
    steps = []
    for i in range(1, n_iters + 1):
        prev = f"p{i - 1}"
        steps.append(f"""
    t{i} AS MATERIALIZED (
      SELECT x.item, CAST(sum(x.t) AS BIGINT) AS T FROM (
        SELECT pr.a AS item,
               CAST((CAST(pr.n AS HUGEINT) * {_BIG}) // (pa.p + pb.p) AS BIGINT) AS t
        FROM pairs pr
        JOIN {prev} pa ON pa.item = pr.a
        JOIN {prev} pb ON pb.item = pr.b
        UNION ALL
        SELECT pr.b,
               CAST((CAST(pr.n AS HUGEINT) * {_BIG}) // (pa.p + pb.p) AS BIGINT)
        FROM pairs pr
        JOIN {prev} pa ON pa.item = pr.a
        JOIN {prev} pb ON pb.item = pr.b
      ) x GROUP BY x.item
    ),
    u{i} AS MATERIALIZED (
      SELECT w.item,
             greatest(CAST((CAST(w.w AS HUGEINT) * {_BIG}) // t.T AS BIGINT),
                      {MIN_P}) AS p
      FROM wins w JOIN t{i} t ON t.item = w.item
    ),
    p{i} AS MATERIALIZED (
      SELECT u.item,
             greatest(CAST((CAST(u.p AS HUGEINT)
                            * ((SELECT k FROM korder) * {SCALE}))
                           // (SELECT CAST(sum(CAST(p AS HUGEINT)) AS HUGEINT)
                               FROM u{i}) AS BIGINT),
                      {MIN_P}) AS p
      FROM u{i} u
    )""")
    chain = ",".join(steps)
    return f"""
    WITH comp AS MATERIALIZED ({comparisons_sql}),
    items AS MATERIALIZED (
      SELECT winner AS item FROM comp UNION SELECT loser FROM comp
    ),
    korder AS MATERIALIZED (SELECT count(*) AS k FROM items),
    wins AS MATERIALIZED (
      SELECT i.item, CAST(count(c.winner) AS BIGINT) AS w
      FROM items i LEFT JOIN comp c ON c.winner = i.item
      GROUP BY i.item
    ),
    pairs AS MATERIALIZED (
      SELECT least(winner, loser) AS a, greatest(winner, loser) AS b,
             CAST(count(*) AS BIGINT) AS n
      FROM comp GROUP BY 1, 2
    ),
    p0 AS MATERIALIZED (
      SELECT item, CAST({SCALE} AS BIGINT) AS p FROM items
    ),{chain},
    ncomp AS MATERIALIZED (
      SELECT x.item, CAST(sum(x.n) AS BIGINT) AS n_comparisons FROM (
        SELECT a AS item, n FROM pairs UNION ALL SELECT b, n FROM pairs
      ) x GROUP BY x.item
    )
    SELECT p.item,
           p.p AS strength_scaled,
           CAST(p.p AS DOUBLE) / {float(SCALE)!r} AS strength,
           w.w AS wins,
           n.n_comparisons,
           CAST(row_number() OVER (ORDER BY p.p DESC, p.item) AS INT) AS rank
    FROM p{n_iters} p
    JOIN wins w ON w.item = p.item
    JOIN ncomp n ON n.item = p.item
    """


# ---------------------------------------------------------------------------
# Stateless comparison fixture (for the streaming row: each document row IS
# one comparison, derivable without cross-row state).
# ---------------------------------------------------------------------------


def fixture_comparisons(docs: DataFrame) -> DataFrame:
    """One comparison per document, STATELESS (no window, no join — the
    projection composes with readStream as an append-mode map): the doc's
    source faces the deterministic opponent ``'src' || ((doc_id*7+3) %
    20)``; even ``n_chars`` means the source wins. The testdata assigns
    ``source = 'src' || (doc_id % 20)`` and ``(7d+3) % 20 ≠ d % 20`` for
    every d (6d ≡ 17 mod 20 has no solution — 6d is even), so every doc
    yields a real cross-source matchup; the self-matchup guard stays for
    arbitrary inputs. The honest-fixture posture: the operator under test
    is the mergeable stats maintenance + fit, the comparison log is
    replayable."""
    opp = F.concat(
        F.lit("src"), ((F.col("doc_id") * 7 + 3) % 20).cast("string")
    )
    even = F.col("n_chars") % 2 == 0
    return (
        docs.where(F.col("source") != opp)
        .select(
            F.when(even, F.col("source")).otherwise(opp).alias("winner"),
            F.when(even, opp).otherwise(F.col("source")).alias("loser"),
        )
    )


def fixture_comparisons_sql() -> str:
    """DuckDB SQL emitting the identical comparison rows."""
    return """
    SELECT CASE WHEN n_chars % 2 = 0 THEN source
                ELSE 'src' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) END AS winner,
           CASE WHEN n_chars % 2 = 0
                THEN 'src' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR)
                ELSE source END AS loser
    FROM documents
    WHERE source <> 'src' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR)
    """


# ---------------------------------------------------------------------------
# Streaming maintenance: per-batch pair-stats partials, merged at fit time.
# ---------------------------------------------------------------------------


def preference_stats_stream(
    comp_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
):
    """STREAMING preference-log maintenance: comparisons arrive on a
    stream; each micro-batch's :func:`pair_stats` lands as a
    ``batch_id=N``-scoped idempotent parquet overwrite (the
    ``bm25_index_stream`` / rollup-store posture). Partials are plain
    integer sums, so :func:`read_preference_stats_dir` re-aggregates them
    at fit time into EXACTLY the from-scratch statistic — replays and
    restarts cannot drift the fit. Driver state: none. Returns the
    started StreamingQuery."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        pair_stats(batch_df).write.mode("overwrite").parquet(
            f"{store_path}/pair_stats/batch_id={batch_id}"
        )

    return (
        comp_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_preference_stats_dir(spark, store_path: str) -> DataFrame:
    """Load a :func:`preference_stats_stream` store and merge the partials
    (exact integer sums — merge order free); feed to
    :func:`fit_pair_stats`."""
    return merge_pair_stats(spark.read.parquet(f"{store_path}/pair_stats"))
