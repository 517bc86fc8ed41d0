"""Unigram-LM tokenizer (SentencePiece-style; Kudo 2018, arXiv:1804.10959).

The second tokenizer family next to BPE (``operators/tokenizer.py``):
instead of greedy merges, a VOCABULARY of candidate pieces carries a
probability, every word segments by Viterbi (the max-log-probability
segmentation), and training is EM — re-estimate piece probabilities from
the segmentations, prune the least useful pieces, repeat.

Spark-first shapes (the BPE module's lessons, reused):

* The corpus collapses to the DISTINCT-WORD frame ``(w, cnt)`` before any
  per-word work — segmentation cost is vocabulary-sized, documents only
  pay the explode and a join-back on the word key.
* Viterbi is ONE pure-Catalyst ``aggregate`` fold per word (no UDF): the
  accumulator is the DP prefix array ``best[0..i]`` of
  ``struct(score, n_pieces, back)`` values; piece log-probs are embedded
  as a plan-literal map (the frozen-BM25-model / Bloom-mask posture —
  model state is vocabulary-sized driver data, never corpus-sized).
* Every M-step log-prob is floor-rounded onto a 10⁻⁶ grid
  (``functions/rounding.py``), so the whole EM trajectory — argmaxes,
  prunes, final vocabulary — is bit-deterministic and the exported model
  replays exactly on any IEEE engine.

Simplifications vs the reference algorithm, documented: the E-step is
HARD EM (Viterbi counts, not full forward-backward expectations) and
pruning drops the lowest-usage multi-char pieces (not the loss-delta
ranking); both keep the two-shuffle-per-iteration plan shape that matters
at corpus scale, and both are standard cheap variants in the literature.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_ensemble_spark.functions.rounding import floor_round_sql
from spark_ensemble_spark.operators.tokenizer import bpe_words, word_counts

__all__ = [
    "unigram_fixed_model",
    "unigram_seed_counts",
    "unigram_train",
    "unigram_segment_pieces",
    "unigram_doc_stats",
    "unigram_score_oracle_sql",
]

# log-prob for a character absent from the vocabulary (unseen at training
# time): large-negative, exactly representable, and far below any real
# piece so it only ever fills gaps no known piece can cover.
UNK_LOGP = -10000.0

# grid for M-step log-probs (see module docstring)
_LOGP_GRID = 6


def unigram_fixed_model() -> Dict[str, float]:
    """Deterministic, DATA-INDEPENDENT demo vocabulary: fixed counts over
    common English pieces plus weighted single letters, normalized onto the
    log-prob grid. Importable without a SparkSession, so DuckDB oracle
    builders embed the exact same literals (the ``ivf_fixed_centroids``
    posture) — this is what makes the encode/score path itself
    oracle-checkable, while the trained model (engine-specific trajectory)
    slots into the same ``{piece: logp}`` shape."""
    counts = {
        "the": 300, "ing": 250, "and": 200, "tion": 180, "ion": 150,
        "ent": 120, "her": 110, "for": 100, "ter": 95, "ere": 90,
        "er": 140, "re": 130, "in": 120, "on": 110, "at": 100,
        "en": 95, "ed": 90, "es": 85, "te": 80, "ti": 75,
        "st": 70, "ar": 65, "nd": 60, "nt": 55, "ha": 50,
        "ou": 45, "se": 40, "le": 38, "is": 36, "or": 34,
    }
    letters = "etaoinshrdlcumwfgypbvkjxqz"
    for rank, ch in enumerate(letters):
        counts[ch] = 30 - rank
    for ch in "0123456789":
        counts[ch] = 2
    total = float(sum(counts.values()))
    return {p: _grid_logp(c / total) for p, c in counts.items()}


def unigram_seed_counts(
    vocab: DataFrame, max_piece_len: int = 4, seed_size: int = 512
) -> List[Tuple[str, int]]:
    """Seed candidate pieces: every substring (length ≤ ``max_piece_len``)
    of every distinct word, occurrence-count-weighted, as the union of the
    top ``seed_size`` multi-char pieces (count desc, piece asc — the
    engine-stable argmax convention) and ALL single characters (coverage:
    any training word must stay segmentable after every prune).

    One explode + one grouped sum over the distinct-word frame; the
    returned list is model-sized driver state (the KMeans-centroid class).
    """
    spans = vocab.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("w")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(max_piece_len), F.length("w") - i + F.lit(1)
                            ),
                        ),
                        lambda n: F.col("w").substr(i, n),
                    ),
                )
            )
        ).alias("piece"),
        F.col("cnt"),
    )
    counts = spans.groupBy("piece").agg(F.sum("cnt").alias("pc"))
    singles = [
        (r["piece"], int(r["pc"]))
        for r in counts.filter(F.length("piece") == 1).collect()
    ]
    multi = [
        (r["piece"], int(r["pc"]))
        for r in counts.filter(F.length("piece") >= 2)
        .orderBy(F.desc("pc"), F.asc("piece"))
        .limit(seed_size)
        .collect()
    ]
    return sorted(singles + multi)


def _logp_map_expr(piece_logp: Dict[str, float]) -> Column:
    """The vocabulary as a plan-literal map column (piece → gridded logp)."""
    kv: List[Column] = []
    for piece in sorted(piece_logp):
        kv.append(F.lit(piece))
        kv.append(F.lit(float(piece_logp[piece])))
    return F.create_map(*kv)


def _viterbi_dp(word: Column, piece_logp: Dict[str, float], max_piece_len: int) -> Column:
    """The Viterbi DP prefix array for ``word`` as one fold:
    ``dp[i+1] = best over j ∈ [i−L, i−1] of dp[j] ⊕ piece w[j+1..i]`` with
    values ``struct(s: score, np: −n_pieces, back: −j)`` so ``array_max``'s
    lexicographic struct order IS the argmax rule: max score, then fewest
    pieces, then longest final piece — deterministic on every engine.

    Unknown single characters score :data:`UNK_LOGP`; unknown multi-char
    substrings are −∞ (filtered via NULL → skipped candidates are given
    ``-1/0``-free large negatives through coalesce on single chars only).
    """
    m = _logp_map_expr(piece_logp)
    L = int(max_piece_len)

    def step(acc: Column, i: Column) -> Column:
        cands = F.transform(
            F.sequence(F.greatest(F.lit(0), i - F.lit(L)), i - F.lit(1)),
            lambda j: F.struct(
                (
                    F.element_at(acc, j + F.lit(1))["s"]
                    # try_element_at: ANSI element_at THROWS on a missing
                    # map key; NULL here means "not a piece" and is filtered
                    + F.coalesce(
                        F.try_element_at(m, word.substr(j + F.lit(1), i - j)),
                        F.when(i - j == F.lit(1), F.lit(UNK_LOGP)),
                    )
                ).alias("s"),
                (F.element_at(acc, j + F.lit(1))["np"] - F.lit(1)).alias("np"),
                (-j).cast("int").alias("back"),
            ),
        )
        # unknown multi-char pieces produce NULL scores; drop them before
        # the max (array_max would rank NULL-score structs unpredictably)
        valid = F.filter(cands, lambda c: c["s"].isNotNull())
        return F.concat(acc, F.array(F.array_max(valid)))

    init = F.array(
        F.struct(
            F.lit(0.0).alias("s"), F.lit(0).alias("np"), F.lit(0).alias("back")
        )
    )
    return F.aggregate(F.sequence(F.lit(1), F.length(word)), init, step)


def _reconstruct_pieces(word: Column, dp: Column) -> Column:
    """Walk the backpointers of a materialized DP array into the piece
    array: a reverse fold carrying ``(boundary, pieces)`` — at position
    ``i == boundary`` the piece ``w[back+1..i]`` prepends and the boundary
    jumps to ``back``."""
    init = F.struct(
        F.length(word).alias("b"),
        F.array().cast("array<string>").alias("ps"),
    )
    out = F.aggregate(
        F.reverse(F.sequence(F.lit(1), F.length(word))),
        init,
        lambda acc, i: F.when(
            i == acc["b"],
            F.struct(
                (-F.element_at(dp, i + F.lit(1))["back"]).alias("b"),
                F.concat(
                    F.array(
                        word.substr(
                            -F.element_at(dp, i + F.lit(1))["back"] + F.lit(1),
                            i + F.element_at(dp, i + F.lit(1))["back"],
                        )
                    ),
                    acc["ps"],
                ).alias("ps"),
            ),
        ).otherwise(acc),
    )
    return out["ps"]


def unigram_segment_pieces(
    words: DataFrame,
    piece_logp: Dict[str, float],
    max_piece_len: int = 4,
    word_col: str = "w",
) -> DataFrame:
    """Per-word Viterbi segmentation: appends ``pieces array<string>``,
    ``n_pieces int`` and ``logp double`` (the best segmentation's total,
    already a sum of gridded literals). The DP array materializes ONCE per
    row behind a pushdown barrier (dedup's ``_eval_once_column`` — HOF
    folds are CodegenFallback, re-inlining one is paid in full per row),
    then stats and the reconstruction read the column."""
    from spark_ensemble_spark.operators.dedup import _eval_once_column

    w = F.col(word_col)
    with_dp = _eval_once_column(
        words.filter(F.length(word_col) >= 1),
        "__dp",
        _viterbi_dp(w, piece_logp, max_piece_len),
    )
    last = F.element_at(F.col("__dp"), -1)
    return with_dp.select(
        *[c for c in words.columns],
        _reconstruct_pieces(w, F.col("__dp")).alias("pieces"),
        (-last["np"]).cast("int").alias("n_pieces"),
        last["s"].alias("logp"),
    )


def unigram_train(
    df: Optional[DataFrame],
    text_col: str = "text",
    vocab_size: int = 256,
    max_piece_len: int = 4,
    seed_size: int = 512,
    num_iters: int = 3,
    prune_frac: float = 0.25,
    vocab: Optional[DataFrame] = None,
) -> Dict[str, float]:
    """Train the unigram tokenizer: seed → (hard-EM re-estimate → prune)
    × ``num_iters`` → final ``{piece: logp}`` model (gridded literals,
    JSON-persistable next to a model like BPE merges / PQ codebooks).

    Per iteration the cluster does exactly two shuffles over the
    vocabulary-sized distinct-word frame (segment-explode → piece-count
    groupBy); the collected piece table is model-sized. Single characters
    never prune (coverage); multi-char pieces below the usage cut drop
    until ``vocab_size`` remains."""
    if vocab is None:
        if df is None:
            raise ValueError("pass a corpus df or a precomputed vocab")
        vocab = word_counts(df, text_col)
    vocab = vocab.persist()
    try:
        seed = unigram_seed_counts(vocab, max_piece_len, seed_size)
        total = float(sum(c for _, c in seed)) or 1.0
        model = {
            p: _grid_logp(c / total) for p, c in seed
        }
        for _ in range(int(num_iters)):
            seg = unigram_segment_pieces(vocab, model, max_piece_len)
            usage = (
                seg.select(F.explode("pieces").alias("piece"), "cnt")
                .groupBy("piece")
                .agg(F.sum("cnt").alias("uc"))
                .collect()
            )
            counts = {r["piece"]: int(r["uc"]) for r in usage}
            # M-step over USED pieces plus always-kept single chars
            singles = {p for p in model if len(p) == 1}
            multi = sorted(
                ((p, c) for p, c in counts.items() if len(p) >= 2),
                key=lambda pc: (-pc[1], pc[0]),
            )
            n_keep = max(
                int(vocab_size) - len(singles),
                int(len(multi) * (1.0 - float(prune_frac))),
            )
            kept = dict(multi[: max(n_keep, 0)])
            for p in singles:
                kept[p] = counts.get(p, 0)
            tot = float(sum(kept.values())) or 1.0
            model = {
                p: _grid_logp((c + 1) / (tot + len(kept))) for p, c in kept.items()
            }
        # final size cut to vocab_size (singles always survive)
        singles = {p for p in model if len(p) == 1}
        multi = sorted(
            ((p, lp) for p, lp in model.items() if len(p) >= 2),
            key=lambda pl: (-pl[1], pl[0]),
        )
        room = max(int(vocab_size) - len(singles), 0)
        final = {p: lp for p, lp in multi[:room]}
        final.update({p: model[p] for p in singles})
        return final
    finally:
        vocab.unpersist()


def _grid_logp(p: float) -> float:
    """Driver-side mirror of the floor-round grid: the SAME arithmetic the
    Column/SQL forms execute, so literals exported from training equal what
    either engine would compute."""
    x = math.log(p)
    scale = float(10**_LOGP_GRID)
    return math.floor(x * scale + 0.5) / scale


def unigram_doc_stats(
    df: DataFrame,
    piece_logp: Dict[str, float],
    max_piece_len: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document unigram tokenization stats ``(id, n_words, n_pieces,
    total_logp)`` — the corpus pays one explode and a join back on the word
    key; every distinct word segments exactly once (the BPE
    ``bpe_token_counts`` shape). ``total_logp_micro`` is an exact BIGINT
    sum of micro-unit (10^-6) gridded per-word Viterbi scores, so
    partial-agg order cannot move it — and the output column is BIGINT,
    never DECIMAL (driver fetch-path hazard, VERDICT r11 #1)."""
    from spark_ensemble_spark.functions.rounding import floor_round_int

    doc_words = df.select(
        F.col(id_col), F.explode(bpe_words(F.col(text_col))).alias("w")
    ).filter(F.col("w") != "")
    distinct_words = doc_words.select("w").distinct()
    seg = unigram_segment_pieces(distinct_words, piece_logp, max_piece_len).select(
        "w",
        F.col("n_pieces").alias("__np"),
        floor_round_int(F.col("logp"), 6).alias("__lp"),
    )
    return (
        doc_words.join(seg, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("__np").cast("bigint").alias("n_pieces"),
            F.sum("__lp").cast("bigint").alias("total_logp_micro"),
        )
    )


def unigram_score_oracle_sql(
    piece_logp: Dict[str, float],
    max_piece_len: int = 4,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replay of :func:`unigram_doc_stats` — the Viterbi DP as a
    recursive CTE carrying the SAME ``(s, np)`` struct-prefix list, the
    same literal map, candidate order, lexicographic struct max
    (``list_sort(...)[-1]``), and the same exact-DECIMAL document sum.
    Backpointers are not replayed (the reconstruction is Spark-side
    training machinery); ``n_pieces`` rides in the DP value itself, so the
    full stats row is engine-checked."""
    from spark_ensemble_spark.functions.detmath import double_literal_sql

    keys = ", ".join(_sql_str(p) for p in sorted(piece_logp))
    # string->double spelling: a bare 6-dp literal would coerce the map
    # values to DECIMAL and pay the build-dependent decimal->double cast at
    # every lookup (functions/detmath.double_literal_sql)
    vals = ", ".join(
        double_literal_sql(float(piece_logp[p])) for p in sorted(piece_logp)
    )
    # DuckDB forbids subqueries inside lambdas — the vocabulary map embeds
    # directly in the lambda body (one literal occurrence, model-sized)
    pm = f"map([{keys}], [{vals}])"
    L = int(max_piece_len)
    return f"""
    WITH RECURSIVE words AS (
      SELECT DISTINCT u.w AS w
      FROM (
        SELECT unnest(string_split(regexp_replace(lower(trim(coalesce({text_col}, ''))),
                      '\\s+', ' ', 'g'), ' ')) AS w
        FROM {table}
      ) u WHERE u.w != ''
    ),
    dp AS (
      SELECT w, 1 AS i,
             [{{'s': CAST(0.0 AS DOUBLE), 'np': 0}}] AS best
      FROM words
      UNION ALL
      SELECT w, i + 1,
             list_append(best,
               list_sort(list_filter(list_transform(
                 generate_series(greatest(0, dp.i - {L}), dp.i - 1),
                 j -> {{'s': best[j + 1].s +
                            coalesce(map_extract({pm},
                                     substr(dp.w, j + 1, dp.i - j))[1],
                                     CASE WHEN dp.i - j = 1
                                          THEN {UNK_LOGP!r} END),
                       'np': best[j + 1].np - 1}}),
                 x -> x.s IS NOT NULL))[-1]
             )
      FROM dp WHERE i <= length(w)
    ),
    seg AS (
      SELECT w, best[-1].s AS lp, -best[-1].np AS np
      FROM dp WHERE i = length(w) + 1
    ),
    doc_words AS (
      SELECT {id_col} AS id, u.w AS w
      FROM {table},
           unnest(string_split(regexp_replace(lower(trim(coalesce({text_col}, ''))),
                  '\\s+', ' ', 'g'), ' ')) AS u(w)
      WHERE u.w != ''
    )
    SELECT id AS {id_col},
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(np) AS BIGINT) AS n_pieces,
           CAST(sum(CAST(floor(lp * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_logp_micro
    FROM doc_words JOIN seg USING (w)
    GROUP BY id
    """


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"
