"""Distributed BPE tokenizer training and application.

Byte-pair-encoding merge learning (Sennrich, Haddow & Birch, ACL 2016 —
"Neural Machine Translation of Rare Words with Subword Units") re-expressed
as the iterative DataFrame loop this engine already uses for boosting/GBM:

* the corpus collapses ONCE to a ``(word, count)`` vocabulary table — all
  subsequent per-merge work is proportional to the DISTINCT vocabulary, not
  the corpus (the insight that makes BPE training tractable at 100 TB: a
  trillion tokens is still only ~10^7-10^8 distinct pre-tokenized words);
* each merge round is one explode → groupBy(sum) over that vocab frame plus
  a single-ROW ``collect()`` of the argmax pair — the same bounded-driver-
  state discipline as the GBM line-search argmax (never data, one row per
  iteration);
* the winning pair is applied to every word via a pure-Catalyst
  ``aggregate`` fold (left-to-right non-overlapping merge — exactly the
  reference BPE semantics), and the evolving vocab frame goes through
  :class:`~spark_ensemble_spark.core.utils.DFIterationCache` so the
  per-round ``withColumn`` chain cannot grow the plan unboundedly.

Encoding a corpus with learned merges follows the same vocab-collapse shape:
tokenize each DISTINCT word once (M nested folds in one projection over the
vocab frame), then join token counts back to the exploded corpus — two
corpus-sized shuffles (explode + re-agg) and vocab-sized compute, never
per-occurrence re-tokenization.

Symbols are joined with the ASCII unit separator (``\\x1e`` — STRIPPED from
every word at the ingestion boundary by :func:`bpe_words`, since whitespace
tokenization alone keeps control characters), which gives the fold a
constant-time "last
symbol equals the merge LHS" test: ``SEP || acc`` ends with ``SEP || lhs``
iff the final symbol is exactly ``lhs`` (the separator cannot occur inside
a symbol, so the match cannot start mid-symbol). Merging then appends just
``rhs`` to the accumulator. The DuckDB oracles replay the identical fold as
per-iteration recursive CTEs (:func:`bpe_train_oracle_sql`), so the whole
training trajectory — pair counts, argmax tie-breaks, merge application —
is hash-checked end to end, not just the final token counts.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_ensemble_spark.core.utils import DFIterationCache
from spark_ensemble_spark.operators.text import tokens

SEP = "\x1e"

MERGES_SCHEMA = "merge_rank int, lhs string, rhs string, pair_count long"

# Small-vocabulary fast path (r12, guide §1.2 step 1): the per-round work of
# every trainer below is proportional to the DISTINCT word vocabulary, and
# each round is 2-3 tiny Spark jobs whose cost is pure scheduling latency
# once the vocab is small (measured: 10 BPE rounds over a 31-word sf0.1
# vocab = 5.8-7.8 s of ~0.3 s jobs).  When the vocabulary fits under this
# threshold, collect it ONCE (a single bounded job — at most limit+1 rows,
# the same driver-state class as the broadcast-join threshold) and run the
# IDENTICAL algorithm driver-side: same pair counts, same integer score
# grid, same (count DESC, lhs, rhs) tie-break — Python string comparison is
# code-point order, which equals the UTF-8 binary collation both engines
# sort by, and Python ints are exact.  Above the threshold the distributed
# loop below runs unchanged (the 100 TB path: a trillion-token corpus still
# has only ~10^7-10^8 distinct words, but that exceeds any sane driver).
# Equality of the two paths is asserted by tests/test_tokenizer_local.py;
# the DuckDB training-replay oracles hash-check the local path end to end.
def _local_vocab_max() -> int:
    # Read per call, not at import (ADVICE r12 low): every other r12 gate
    # (BT/CC/PR/MMR) honors the env var when set after module import; this
    # one now does too.
    return int(os.environ.get("SPARK_GRAFT_TOKENIZER_LOCAL_VOCAB_MAX", "65536"))


def _collect_small_vocab(vocab: DataFrame, cols: List[str]) -> Optional[list]:
    """The ``(…, w, cnt)`` vocabulary rows iff there are at most
    :func:`_local_vocab_max` of them — one bounded job (``limit+1`` rows
    max); ``None`` (caller stays distributed) when the vocab exceeds the
    threshold or the fast path is disabled (threshold <= 0)."""
    local_vocab_max = _local_vocab_max()
    if local_vocab_max <= 0:
        return None
    rows = vocab.select(*cols).limit(local_vocab_max + 1).collect()
    if len(rows) > local_vocab_max:
        return None
    # NULL group keys / NULL or empty words have join-semantics edge cases
    # the distributed fold defines (a NULL group never matches its winner's
    # broadcast join back, an empty word folds to one empty symbol) — the
    # fixtures never produce them (word_counts filters ''), but a caller's
    # precomputed vocab could: stay distributed rather than mirror them.
    if any(v is None or v == "" for r in rows for v in r):
        return None
    return rows


def _merge_syms(syms: List[str], lhs: str, rhs: str) -> List[str]:
    """Driver-side mirror of :func:`apply_merge`'s left-to-right
    non-overlapping fold: the accumulator's LAST symbol plays the role of
    the ``SEP || acc ends-with SEP || lhs`` test (a freshly merged symbol
    equals ``lhs || rhs`` != ``lhs``, so it is never consumed twice)."""
    out = [syms[0]]
    for x in syms[1:]:
        if out[-1] == lhs and x == rhs:
            out[-1] = lhs + rhs
        else:
            out.append(x)
    return out


def _local_bpe_merges(
    words: List[List], num_merges: int, min_count: int
) -> List[Tuple[int, str, str, int]]:
    """Driver-side replay of the distributed BPE rounds over a collected
    ``[[syms…], cnt]`` vocabulary — pair counts, argmax tie-break
    (count DESC, lhs ASC, rhs ASC), merge fold, and the ``min_count``
    early exit are bit-identical to the Spark loop and the DuckDB CTEs."""
    merges: List[Tuple[int, str, str, int]] = []
    for rank in range(int(num_merges)):
        counts: Dict[Tuple[str, str], int] = {}
        for syms, cnt in words:
            for j in range(len(syms) - 1):
                key = (syms[j], syms[j + 1])
                counts[key] = counts.get(key, 0) + cnt
        if not counts:
            break
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((rank, lhs, rhs, cnt))
        words = [[_merge_syms(s, lhs, rhs), c] for s, c in words]
    return merges


def _local_wordpiece_merges(
    words: List[List], num_merges: int
) -> List[Tuple[int, str, str, int, int]]:
    """Driver-side replay of the WordPiece rounds: same pair/symbol counts
    and merge fold as BPE, argmax on the exact integer likelihood grid
    ``pair_count * WP_SCORE_SCALE // (count(lhs) * count(rhs))`` with the
    (score DESC, pair_count DESC, lhs, rhs) tie-break — Python bigints
    reproduce the DECIMAL(38)/HUGEINT arithmetic exactly."""
    merges: List[Tuple[int, str, str, int, int]] = []
    for rank in range(int(num_merges)):
        pair_counts: Dict[Tuple[str, str], int] = {}
        sym_counts: Dict[str, int] = {}
        for syms, cnt in words:
            for s in syms:
                sym_counts[s] = sym_counts.get(s, 0) + cnt
            for j in range(len(syms) - 1):
                key = (syms[j], syms[j + 1])
                pair_counts[key] = pair_counts.get(key, 0) + cnt
        if not pair_counts:
            break
        best = min(
            (
                (
                    -(pc * WP_SCORE_SCALE // (sym_counts[l] * sym_counts[r])),
                    -pc,
                    l,
                    r,
                )
                for (l, r), pc in pair_counts.items()
            )
        )
        score, pc, lhs, rhs = -best[0], -best[1], best[2], best[3]
        merges.append((rank, lhs, rhs, pc, score))
        words = [[_merge_syms(s, lhs, rhs), c] for s, c in words]
    return merges


def bpe_words(text: Column) -> Column:
    """The tokenizer family's word array: whitespace tokens with any
    :data:`SEP` byte STRIPPED. Whitespace tokenization keeps control
    characters, so a word containing ``\\x1e`` would corrupt symbol
    boundaries and merge application (r7 ADVICE — both engines would
    replay the same wrong fold, so oracles can't catch it). Stripping at
    the ingestion boundary restores the "SEP never occurs inside a symbol"
    invariant everything downstream relies on; the DuckDB oracles'
    ``_TOKENIZE`` applies the identical ``replace(w, chr(30), '')``."""
    return F.transform(tokens(text), lambda w: F.translate(w, SEP, ""))


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Collapse a corpus to its ``(w, cnt)`` vocabulary — the one
    corpus-sized shuffle in BPE training."""
    return (
        df.select(F.explode(bpe_words(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def char_syms(word: Column) -> Column:
    """A word as its character symbols joined with :data:`SEP` (the initial
    BPE state; no end-of-word marker — words are already the merge units,
    GPT-2-style pre-tokenization)."""
    return F.array_join(F.split(word, ""), SEP)


def apply_merge(syms: Column, lhs: str, rhs: str) -> Column:
    """Left-to-right non-overlapping application of one merge to a
    SEP-joined symbol string, as a pure-Catalyst ``aggregate`` fold.

    The accumulator is itself a SEP-joined string: when its last symbol is
    exactly ``lhs`` (the ``SEP || acc ends-with SEP || lhs`` test) and the
    next symbol is ``rhs``, merging is just appending ``rhs``; a freshly
    merged symbol equals ``lhs || rhs`` ≠ ``lhs``, so it can never be
    consumed twice — the standard non-overlap guarantee (``aaa`` under
    ``(a,a)`` → ``aa a``, never ``a aa``)."""
    return F.aggregate(
        F.split(syms, SEP),
        F.lit(""),
        lambda acc, x: F.when(acc == F.lit(""), x)
        .when(
            F.concat(F.lit(SEP), acc).endswith(F.lit(SEP + lhs)) & (x == F.lit(rhs)),
            F.concat(acc, F.lit(rhs)),
        )
        .otherwise(F.concat(acc, F.lit(SEP), x)),
    )


def adjacent_pairs(syms: Column) -> Column:
    """All adjacent symbol pairs of a SEP-joined symbol string as
    ``array<struct<l,r>>`` (empty for single-symbol words — guarded, since
    ``sequence(1, 0)`` would otherwise count DOWN)."""
    lst = F.split(syms, SEP)
    return F.when(
        F.size(lst) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(lst) - 1),
            lambda i: F.struct(
                F.element_at(lst, i).alias("l"),
                F.element_at(lst, i + F.lit(1)).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def bpe_train(
    df: Optional[DataFrame],
    text_col: str = "text",
    num_merges: int = 10,
    min_count: int = 1,
    vocab: Optional[DataFrame] = None,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from a corpus (or a precomputed
    ``(w, cnt)`` ``vocab`` frame) and return them as a DataFrame
    ``(merge_rank, lhs, rhs, pair_count)``.

    Per round: pair counts are one explode + groupBy(sum) over the vocab
    frame; the argmax (count DESC, lhs ASC, rhs ASC — deterministic across
    engines) is a one-row collect; the merge applies as an
    :func:`apply_merge` fold and the frame is re-materialized through
    ``DFIterationCache``. Stops early when no pair reaches ``min_count``.
    """
    if vocab is None:
        if df is None:
            raise ValueError("pass a corpus df or a precomputed vocab")
        vocab = word_counts(df, text_col)
    spark = vocab.sparkSession
    from spark_ensemble_spark.sources.datasets import local_df

    small = _collect_small_vocab(vocab, ["w", "cnt"])
    if small is not None:
        local = _local_bpe_merges(
            [[list(r[0]), int(r[1])] for r in small], num_merges, min_count
        )
        return local_df(spark, local, MERGES_SCHEMA)
    words = vocab.select(char_syms(F.col("w")).alias("s"), F.col("cnt"))
    cache = DFIterationCache(interval=4, keep=2)
    words = cache.update(words)
    merges: List[Tuple[int, str, str, int]] = []
    try:
        for rank in range(int(num_merges)):
            best = (
                words.select(F.explode(adjacent_pairs(F.col("s"))).alias("pr"), "cnt")
                .groupBy(F.col("pr.l").alias("lhs"), F.col("pr.r").alias("rhs"))
                .agg(F.sum("cnt").alias("pair_count"))
                .orderBy(F.desc("pair_count"), "lhs", "rhs")
                .limit(1)
                .collect()
            )
            if not best or best[0].pair_count < min_count:
                break
            lhs, rhs, cnt = best[0].lhs, best[0].rhs, int(best[0].pair_count)
            merges.append((rank, lhs, rhs, cnt))
            words = cache.update(
                words.withColumn("s", apply_merge(F.col("s"), lhs, rhs))
            )
    finally:
        cache.close()
    from spark_ensemble_spark.sources.datasets import local_df

    return local_df(spark, merges, MERGES_SCHEMA)


def apply_merge_cols(syms: Column, lhs: Column, rhs: Column) -> Column:
    """:func:`apply_merge` with COLUMN-valued pair — the grouped-training
    fold, where each row's group carries its own winning pair. A NULL pair
    (group ran dry this round, or the left join found no winner) makes the
    merge condition NULL → false, so the fold is a clean no-op copy."""
    return F.aggregate(
        F.split(syms, SEP),
        F.lit(""),
        lambda acc, x: F.when(acc == F.lit(""), x)
        .when(
            F.concat(F.lit(SEP), acc).endswith(F.concat(F.lit(SEP), lhs))
            & (x == rhs),
            F.concat(acc, rhs),
        )
        .otherwise(F.concat(acc, F.lit(SEP), x)),
    )


def bpe_train_grouped(
    df: Optional[DataFrame],
    group_col: str,
    text_col: str = "text",
    num_merges: int = 10,
    vocab: Optional[DataFrame] = None,
) -> DataFrame:
    """Learn an independent BPE merge list PER GROUP (per language, per
    domain, per source) in one lockstep loop —
    ``(group_col, merge_rank, lhs, rhs, pair_count)``.

    Unlike the global trainer, this collects NOTHING: each round's
    per-group argmax is a ``row_number`` window over the (group, pair)
    count frame, the winners LEFT-broadcast-join back to the vocab on the
    group key, and the merge applies through the column-valued fold
    (:func:`apply_merge_cols` — groups that ran dry join NULL and no-op).
    Driver state is zero; the number of groups scales horizontally, which
    is the shape multi-domain tokenizer training needs at 100 TB — one
    pass trains every domain's tokenizer simultaneously. Groups whose
    vocabulary runs dry before ``num_merges`` simply stop contributing
    rows (their trajectory is shorter, same as running them alone)."""
    from pyspark.sql import Window

    if vocab is None:
        if df is None:
            raise ValueError("pass a corpus df or a precomputed grouped vocab")
        vocab = (
            df.select(
                F.col(group_col).alias("g"),
                F.explode(bpe_words(F.col(text_col))).alias("w"),
            )
            .filter(F.col("w") != "")
            .groupBy("g", "w")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    else:
        vocab = vocab.select(F.col(group_col).alias("g"), "w", "cnt")
    if dict(vocab.dtypes).get("g") == "string":
        small = _collect_small_vocab(vocab, ["g", "w", "cnt"])
        if small is not None:
            from spark_ensemble_spark.sources.datasets import local_df

            by_g: Dict[str, List[List]] = {}
            for r in small:
                by_g.setdefault(r[0], []).append([list(r[1]), int(r[2])])
            rows_out: List[Tuple[str, int, str, str, int]] = []
            for g in sorted(by_g):
                for rank, lhs, rhs, cnt in _local_bpe_merges(
                    by_g[g], num_merges, min_count=1
                ):
                    rows_out.append((g, rank, lhs, rhs, cnt))
            return local_df(
                vocab.sparkSession,
                rows_out,
                f"{group_col} string, merge_rank int, lhs string, rhs string,"
                " pair_count long",
            )
    words = vocab.select("g", char_syms(F.col("w")).alias("s"), F.col("cnt"))
    cache = DFIterationCache(interval=4, keep=2)
    words = cache.update(words)
    # Winners are the OUTPUT and tiny (one row per still-merging group):
    # eagerly checkpoint each round (interval=1) and keep them ALL, so the
    # final union reads materialized blocks instead of recomputing early
    # rounds — without this the executed plan re-scanned the corpus once
    # per round after the words rotation evicted their parents.
    out_cache = DFIterationCache(interval=1, keep=int(num_merges) + 1)
    win = Window.partitionBy("g").orderBy(
        F.desc("pair_count"), F.asc("lhs"), F.asc("rhs")
    )
    rounds: List[DataFrame] = []
    try:
        for rank in range(int(num_merges)):
            winners = (
                words.select(
                    "g", F.explode(adjacent_pairs(F.col("s"))).alias("pr"), "cnt"
                )
                .groupBy("g", F.col("pr.l").alias("lhs"), F.col("pr.r").alias("rhs"))
                .agg(F.sum("cnt").alias("pair_count"))
                .withColumn("__rn", F.row_number().over(win))
                .filter(F.col("__rn") == 1)
                .select("g", "lhs", "rhs", "pair_count")
            )
            winners = out_cache.update(winners)
            rounds.append(winners.withColumn("merge_rank", F.lit(rank)))
            words = cache.update(
                words.join(
                    F.broadcast(winners.select("g", "lhs", "rhs")), "g", "left"
                )
                .withColumn(
                    "s", apply_merge_cols(F.col("s"), F.col("lhs"), F.col("rhs"))
                )
                .select("g", "s", "cnt")
            )
    finally:
        # bpe_train's discipline (r7 ADVICE: this leaked up to two persisted
        # vocab-sized frames per call): winners are eagerly checkpointed
        # (interval=1), so the returned union no longer reads the rotation.
        cache.close()
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out.select(
        F.col("g").alias(group_col), "merge_rank", "lhs", "rhs", "pair_count"
    )


def segment_expr(word: Column, merges: List[Tuple[str, str]]) -> Column:
    """The SEP-joined BPE segmentation of ``word`` under ``merges`` (applied
    in rank order) as one nested-fold projection — each fold's input is
    evaluated exactly once per row, so cost is linear in the merge count."""
    s = char_syms(word)
    for lhs, rhs in merges:
        s = apply_merge(s, lhs, rhs)
    return s


def bpe_token_counts(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token counts under a learned merge list:
    ``(id_col, n_tokens)``.

    Tokenization cost is vocab-sized (each DISTINCT word segments once);
    the corpus pays only the explode and the join-back on the word key —
    documents with no words (empty text) drop, same as the SQL replay."""
    doc_words = df.select(
        F.col(id_col), F.explode(bpe_words(F.col(text_col))).alias("w")
    ).filter(F.col("w") != "")
    vocab_tok = (
        doc_words.select("w")
        .distinct()
        .select(
            "w",
            F.size(F.split(segment_expr(F.col("w"), merges), SEP)).alias("__w_tokens"),
        )
    )
    return (
        doc_words.join(vocab_tok, "w")
        .groupBy(id_col)
        .agg(F.sum("__w_tokens").alias("n_tokens"))
    )


def token_count_expr(text: Column, merges: List[Tuple[str, str]]) -> Column:
    """Per-ROW BPE token count under a frozen merge list, as one pure column
    expression — the INGEST path: no vocabulary state, no join, so it
    composes with ``readStream`` as a stateless append-mode projection (the
    Bloom-mask / frozen-BM25-model pattern). Cost is words × merges per row;
    the batch path (:func:`bpe_token_counts`) amortizes segmentation over
    distinct words instead and wins whenever the corpus is at rest.

    Whitespace-only text counts zero tokens (callers mirroring the batch
    path's drop-empty semantics filter ``> 0``).

    Segmentation amortizes over the row's DISTINCT words (r12, guide §4's
    "do less work per row": natural text repeats words — measured 54 words
    / 23 distinct per row at sf0.1, and the merge fold is the interpreted
    cost center) — ``Σ_w count(w)·tokens(w)`` is the same exact integer sum
    in first-occurrence order. The outer ``transform(array(words), ws ->
    …)[1]`` is a let-binding: every reference inside the lambda reads the
    bound ``ws``, so the word split itself still evaluates once per row
    (the r6 lambda re-evaluation hazard). Measured 14.6 → 4.1 s on the
    sf0.1 corpus projection, value-identical row for row."""
    words = F.filter(bpe_words(text), lambda w: w != F.lit(""))

    def _sum_over_distinct(ws: Column) -> Column:
        per_dw = F.transform(
            F.array_distinct(ws),
            lambda w: F.size(F.filter(ws, lambda x: x == w)).cast("long")
            * F.size(F.split(segment_expr(w, merges), SEP)).cast("long"),
        )
        return F.aggregate(per_dw, F.lit(0).cast("long"), lambda a, x: a + x)

    return F.element_at(F.transform(F.array(words), _sum_over_distinct), 1)


def bpe_vocab(
    df: Optional[DataFrame],
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    vocab: Optional[DataFrame] = None,
) -> DataFrame:
    """The final token vocabulary a trained BPE tokenizer ships:
    ``(token, freq, token_id)`` — every post-merge symbol with its corpus
    frequency, ids assigned by (freq DESC, token ASC) so the table is
    deterministic across engines and runs.

    Same vocab-collapse shape as encoding: distinct words segment once,
    tokens explode from the vocab frame weighted by word counts — the
    corpus is scanned exactly once (for the word counts). Pipelines that
    already hold the ``(w, cnt)`` frame (they trained on it via
    ``bpe_train(vocab=...)``) pass it as ``vocab`` and pay ZERO extra
    corpus scans here."""
    from pyspark.sql import Window

    wc = vocab if vocab is not None else word_counts(df, text_col)
    toks = wc.select(
        F.explode(F.split(segment_expr(F.col("w"), merges), SEP)).alias("token"),
        F.col("cnt"),
    )
    freqs = toks.groupBy("token").agg(F.sum("cnt").alias("freq"))
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    # token vocabularies are bounded (chars + one entry per merge at most
    # adds len(merges) symbols), so the global ranking window runs over a
    # frame that is small BY CONSTRUCTION — not a data-sized sort.
    return freqs.withColumn("token_id", F.row_number().over(w))


def bpe_vocab_oracle_sql(
    num_merges: int = 10, source: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB replay of :func:`bpe_vocab` under the merges that
    :func:`bpe_train` learns from the same corpus (reuses the unrolled
    training CTEs' final state ``w{M}``)."""
    return f"""{_train_ctes(num_merges, source, text_col)},
    toks AS (
      SELECT unnest(string_split(s, chr(30))) AS token, cnt
      FROM w{num_merges}
    ),
    freqs AS (
      SELECT token, CAST(sum(cnt) AS BIGINT) AS freq FROM toks GROUP BY token
    )
    SELECT token, freq,
           CAST(row_number() OVER (ORDER BY freq DESC, token) AS INT) AS token_id
    FROM freqs
    """


def bpe_encode_ids(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_ids: Optional[DataFrame] = None,
    unk_id: int = 0,
    vocab: Optional[DataFrame] = None,
    word_sep_id: Optional[int] = None,
    bos_id: Optional[int] = None,
    eos_id: Optional[int] = None,
) -> DataFrame:
    """The model input: each document as its token-ID sequence
    ``(id_col, n_tokens, token_ids array<int>)`` under the learned merges.

    ``word_sep_id`` (default off — the id stream is unchanged) interleaves a
    reserved separator id between consecutive WORDS' sub-sequences, which is
    what makes the encoding invertible: BPE symbols carry no end-of-word
    marker here (``char_syms`` is GPT-2-style pre-tokenization without the
    Ġ space prefix), so a flat id sequence alone cannot recover word
    boundaries. Pick an id outside both the vocabulary's ``row_number``
    range (≥ 1) and ``unk_id`` — ``-1`` is the conventional choice.
    ``n_tokens`` counts the separators too (they are real positions the
    model consumes). :func:`bpe_decode_ids` is the inverse.

    ``bos_id``/``eos_id`` wrap each document's sequence with reserved
    begin/end sentinel ids (the standard special-token convention — the
    trainer's attention-reset and generation-stop markers). Like the word
    separator, pick ids outside the vocab range (e.g. ``-2``/``-3``);
    :func:`bpe_decode_ids` renders unknown ids as ``unk_token`` (default
    ``''``), so a bos/eos-wrapped sequence still round-trips to the
    normalized text.

    With ``vocab_ids=None`` (self-encoding, the training-corpus path) ids
    come from :func:`bpe_vocab`'s deterministic (freq DESC, token ASC)
    assignment over THIS corpus — every token is in-vocabulary by
    construction. Passing an exported ``(token, token_id)`` frame instead
    applies a FROZEN tokenizer to UNSEEN text: post-merge symbols missing
    from the frozen vocabulary map to ``unk_id`` (the standard <unk>
    convention — a LEFT join + coalesce, so OOV never drops positions).

    Same vocab-collapse economics as counting: each DISTINCT word segments
    once and its id SUB-SEQUENCE is prebuilt on the vocab frame (a
    vocab-sized broadcast-class join with the token table), so the
    corpus-sized work is one posexplode and one ordered reassembly —
    ``sort_array`` on (position, ids) structs, never a window over the
    corpus."""
    doc_words = df.select(
        F.col(id_col), F.posexplode(bpe_words(F.col(text_col))).alias("__pos", "w")
    ).filter(F.col("w") != "")
    if vocab_ids is None:
        vocab_ids = bpe_vocab(df, merges, text_col, vocab=vocab).select(
            "token", "token_id"
        )
    else:
        vocab_ids = vocab_ids.select("token", "token_id")
    word_seq = (
        doc_words.select("w")
        .distinct()
        .select(
            "w",
            F.posexplode(F.split(segment_expr(F.col("w"), merges), SEP)).alias(
                "__tpos", "token"
            ),
        )
        .join(vocab_ids, "token", "left")
        .groupBy("w")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "__tpos",
                            F.coalesce(
                                F.col("token_id"), F.lit(unk_id).cast("int")
                            ).alias("token_id"),
                        )
                    )
                ),
                lambda s: s["token_id"],
            ).alias("__ids")
        )
    )
    if word_sep_id is None:
        per_word = lambda s: s["__ids"]  # noqa: E731
        reassemble = lambda arr: arr  # noqa: E731
    else:
        # append the separator to every word's ids, drop the trailing one
        sep = F.array(F.lit(int(word_sep_id)).cast("int"))
        per_word = lambda s: F.concat(s["__ids"], sep)  # noqa: E731
        reassemble = lambda arr: F.slice(arr, 1, F.size(arr) - 1)  # noqa: E731
    if bos_id is not None or eos_id is not None:
        inner = reassemble
        head = (
            [F.array(F.lit(int(bos_id)).cast("int"))] if bos_id is not None else []
        )
        tail = (
            [F.array(F.lit(int(eos_id)).cast("int"))] if eos_id is not None else []
        )
        reassemble = lambda arr: F.concat(*head, inner(arr), *tail)  # noqa: E731
    return (
        doc_words.join(word_seq, "w")
        .groupBy(id_col)
        .agg(
            reassemble(
                F.flatten(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("__pos", "__ids"))),
                        per_word,
                    )
                )
            ).alias("token_ids")
        )
        .select(
            id_col,
            F.size("token_ids").cast("long").alias("n_tokens"),
            "token_ids",
        )
    )


def bpe_encode_ids_oracle_sql(
    num_merges: int = 10,
    source: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB replay of :func:`bpe_encode_ids` (train CTEs → vocab ids →
    per-word id sub-sequences → ordered per-document concatenation)."""
    return f"""{_train_ctes(num_merges, source, text_col)},
    vt AS MATERIALIZED (
      SELECT token, CAST(row_number() OVER (ORDER BY freq DESC, token) AS INT) AS token_id
      FROM (
        SELECT token, CAST(sum(cnt) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(s, chr(30))) AS token, cnt FROM w{num_merges})
        GROUP BY token
      )
    ),
    wseq AS MATERIALIZED (
      SELECT w, list(token_id ORDER BY tpos) AS ids
      FROM (
        SELECT w, pr.token AS token, pr.tpos AS tpos
        FROM (
          SELECT w,
                 unnest(list_transform(range(1, len(toks) + 1),
                                       i -> {{'tpos': i, 'token': toks[i]}})) AS pr
          FROM (SELECT w, string_split(s, chr(30)) AS toks FROM w{num_merges})
        )
      )
      JOIN vt USING (token)
      GROUP BY w
    ),
    d AS (
      SELECT {id_col}, pr.w AS w, pr.pos AS pos
      FROM (
        SELECT {id_col},
               unnest(list_transform(range(1, len(ws) + 1),
                                     i -> {{'pos': i, 'w': ws[i]}})) AS pr
        FROM (SELECT {id_col}, {_TOKENIZE.format(text_col=text_col)} AS ws FROM {source})
      )
      WHERE pr.w <> ''
    )
    SELECT {id_col},
           CAST(sum(len(ids)) AS BIGINT) AS n_tokens,
           flatten(list(ids ORDER BY pos)) AS token_ids
    FROM d JOIN wseq USING (w)
    GROUP BY {id_col}
    """


def bpe_decode_ids(
    df: DataFrame,
    vocab_ids: DataFrame,
    ids_col: str = "token_ids",
    id_col: str = "doc_id",
    word_sep_id: int = -1,
    word_sep_token: str = " ",
    unk_token: str = "",
) -> DataFrame:
    """The detokenizer — inverse of :func:`bpe_encode_ids` with
    ``word_sep_id`` set: ``(id_col, text)`` where ``text`` is the
    concatenation of each id's token string, separator ids rendered as
    ``word_sep_token``. Round-trip contract (property-tested):
    ``decode(encode(docs, word_sep_id=-1))`` equals the NORMALIZED text —
    lowercased, trimmed, runs of whitespace collapsed to one space, SEP
    bytes stripped — because that normalization is exactly what the
    whitespace pre-tokenizer discards. Unknown ids (an ``unk_id`` from
    frozen-vocab OOV mapping, or any id outside the vocabulary) render as
    ``unk_token`` — OOV is lossy by construction; '' keeps positions
    without inventing text.

    Plan shape: one posexplode of the id sequences, a broadcast-class LEFT
    join against the (bounded, ``chars + merges``-sized) vocabulary on the
    id key, and the same ``sort_array``-struct ordered reassembly encode
    uses — never a window over the corpus. ``array_join`` with the empty
    separator then stitches the document back."""
    exploded = df.select(
        F.col(id_col), F.posexplode(F.col(ids_col)).alias("__pos", "__tid")
    )
    vt = vocab_ids.select(
        F.col("token_id").cast("int").alias("__tid"), F.col("token").alias("__tok")
    )
    rendered = exploded.join(F.broadcast(vt), "__tid", "left").select(
        id_col,
        "__pos",
        F.when(F.col("__tid") == F.lit(int(word_sep_id)), F.lit(word_sep_token))
        .otherwise(F.coalesce(F.col("__tok"), F.lit(unk_token)))
        .alias("__piece"),
    )
    return (
        rendered.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("__pos", "__piece"))),
                    lambda s: s["__piece"],
                ),
                "",
            ).alias("text")
        )
    )


def save_bpe_merges(spark, merges: List[Tuple[str, str]], path: str) -> None:
    """Persist a learned merge list as one JSON line (the tokenizer IS its
    merge list — query-vocabulary-class metadata, same single-line sink
    discipline as the PQ codebooks: a DataFrame text sink so overwrite is
    atomic-enough and a torn re-train can't leave two JSON lines)."""
    import json

    meta = json.dumps({"merges": [[l, r] for l, r in merges], "sep": SEP})
    spark.createDataFrame([(meta,)], "value string").coalesce(1).write.mode(
        "overwrite"
    ).text(path)


def load_bpe_merges(path: str) -> List[Tuple[str, str]]:
    """Load a :func:`save_bpe_merges` file → merge list in rank order, ready
    for :func:`bpe_token_counts` / :func:`token_count_expr` — train once,
    freeze, tokenize everywhere (batch and ingest) without retraining."""
    from spark_ensemble_spark.core.persistence import load_json

    return [tuple(m) for m in load_json(path)["merges"]]


# ---------------------------------------------------------------------------
# DuckDB oracle generators: the training loop unrolled as per-iteration
# recursive CTEs (pair counts -> argmax -> fold), byte-identical semantics.
# ---------------------------------------------------------------------------

_TOKENIZE = (
    r"list_transform(string_split_regex(lower(trim({text_col})), '\s+'),"
    r" w -> replace(w, chr(30), ''))"
)


def _iteration_ctes(i: int) -> str:
    """CTEs advancing the oracle's vocab state ``w{i}`` → ``w{i+1}``:
    pair counts ``p{i}``, argmax ``b{i}``, and the merge fold ``f{i}``
    (a recursive CTE walking each word's symbol list with the same
    string-accumulator semantics as :func:`apply_merge`)."""
    return f"""
    l{i} AS MATERIALIZED (SELECT w, string_split(s, chr(30)) AS lst, cnt FROM w{i}),
    p{i} AS MATERIALIZED (
      SELECT pr.l AS lhs, pr.r AS rhs, CAST(sum(cnt) AS BIGINT) AS pair_count
      FROM (
        SELECT cnt,
               unnest(list_transform(range(1, len(lst)),
                                     j -> {{'l': lst[j], 'r': lst[j + 1]}})) AS pr
        FROM l{i}
      )
      GROUP BY 1, 2
    ),
    b{i} AS MATERIALIZED (SELECT lhs, rhs, pair_count FROM p{i}
             ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
    f{i} AS (
      SELECT w, lst, cnt, 1 AS pos, lst[1] AS acc FROM l{i}
      UNION ALL
      SELECT f.w, f.lst, f.cnt, f.pos + 1,
             CASE WHEN right(chr(30) || f.acc, 1 + length(b.lhs)) = chr(30) || b.lhs
                       AND f.lst[f.pos + 1] = b.rhs
                  THEN f.acc || b.rhs
                  ELSE f.acc || chr(30) || f.lst[f.pos + 1] END
      FROM f{i} f, b{i} b WHERE f.pos < len(f.lst)
    ),
    w{i + 1} AS MATERIALIZED (SELECT w, acc AS s, cnt FROM f{i} WHERE pos = len(lst))"""


def _train_ctes(num_merges: int, source: str, text_col: str) -> str:
    head = f"""WITH RECURSIVE
    w0 AS (
      SELECT w,
             list_aggregate(list_transform(range(1, length(w) + 1), i -> w[i]),
                            'string_agg', chr(30)) AS s,
             CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest({_TOKENIZE.format(text_col=text_col)}) AS w FROM {source})
      WHERE w <> ''
      GROUP BY w
    )"""
    return head + ",".join([""] + [_iteration_ctes(i) for i in range(num_merges)])


def bpe_train_oracle_sql(
    num_merges: int = 10, source: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB replay of :func:`bpe_train` (``min_count=1``; the fixture's
    vocabulary never runs dry inside ``num_merges``, asserted by the row
    count the compare already checks)."""
    rows = "\n      UNION ALL ".join(
        f"SELECT {i} AS merge_rank, lhs, rhs, pair_count FROM b{i}"
        for i in range(num_merges)
    )
    return f"""{_train_ctes(num_merges, source, text_col)}
    SELECT merge_rank, lhs, rhs, pair_count FROM ({rows})
    ORDER BY merge_rank
    """


def _grouped_iteration_ctes(i: int) -> str:
    """Grouped analogue of :func:`_iteration_ctes`: per-group argmax via a
    window, fold joins the winner on the group key (LEFT — dry groups pass
    through unchanged; the NULL pair makes the CASE condition NULL)."""
    return f"""
    l{i} AS MATERIALIZED (SELECT g, w, string_split(s, chr(30)) AS lst, cnt FROM w{i}),
    b{i} AS MATERIALIZED (
      SELECT g, lhs, rhs, pair_count FROM (
        SELECT g, lhs, rhs, pair_count,
               row_number() OVER (PARTITION BY g ORDER BY pair_count DESC, lhs, rhs) AS rn
        FROM (
          SELECT g, pr.l AS lhs, pr.r AS rhs, CAST(sum(cnt) AS BIGINT) AS pair_count
          FROM (
            SELECT g, cnt,
                   unnest(list_transform(range(1, len(lst)),
                                         j -> {{'l': lst[j], 'r': lst[j + 1]}})) AS pr
            FROM l{i}
          )
          GROUP BY 1, 2, 3
        )
      ) WHERE rn = 1
    ),
    f{i} AS (
      SELECT g, w, lst, cnt, 1 AS pos, lst[1] AS acc FROM l{i}
      UNION ALL
      SELECT f.g, f.w, f.lst, f.cnt, f.pos + 1,
             CASE WHEN right(chr(30) || f.acc, 1 + length(b.lhs)) = chr(30) || b.lhs
                       AND f.lst[f.pos + 1] = b.rhs
                  THEN f.acc || b.rhs
                  ELSE f.acc || chr(30) || f.lst[f.pos + 1] END
      FROM f{i} f LEFT JOIN b{i} b ON f.g = b.g WHERE f.pos < len(f.lst)
    ),
    w{i + 1} AS MATERIALIZED (SELECT g, w, acc AS s, cnt FROM f{i} WHERE pos = len(lst))"""


def bpe_train_grouped_oracle_sql(
    group_col: str,
    num_merges: int = 10,
    source: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB replay of :func:`bpe_train_grouped`: the grouped trajectory
    unrolled — per-group pair counts, per-group argmax, LEFT-joined fold."""
    head = f"""WITH RECURSIVE
    w0 AS MATERIALIZED (
      SELECT g, w,
             list_aggregate(list_transform(range(1, length(w) + 1), i -> w[i]),
                            'string_agg', chr(30)) AS s,
             CAST(count(*) AS BIGINT) AS cnt
      FROM (
        SELECT {group_col} AS g, unnest({_TOKENIZE.format(text_col=text_col)}) AS w
        FROM {source}
      )
      WHERE w <> ''
      GROUP BY g, w
    )"""
    ctes = head + ",".join([""] + [_grouped_iteration_ctes(i) for i in range(num_merges)])
    rows = "\n      UNION ALL ".join(
        f"SELECT g, {i} AS merge_rank, lhs, rhs, pair_count FROM b{i}"
        for i in range(num_merges)
    )
    return f"""{ctes}
    SELECT g AS {group_col}, merge_rank, lhs, rhs, pair_count FROM ({rows})
    ORDER BY {group_col}, merge_rank
    """


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _frozen_fold_ctes(
    merges: List[Tuple[str, str]], source: str, text_col: str
) -> str:
    """CTE chain applying a LITERAL merge list (no training, no argmax) to
    the corpus's distinct-word vocabulary — the frozen-tokenizer replay:
    ``w0`` is the word table, each ``f{i}`` is the same recursive
    string-accumulator fold as :func:`_iteration_ctes` with the pair
    inlined as constants."""
    head = f"""WITH RECURSIVE
    w0 AS MATERIALIZED (
      SELECT w,
             list_aggregate(list_transform(range(1, length(w) + 1), i -> w[i]),
                            'string_agg', chr(30)) AS s
      FROM (SELECT DISTINCT unnest({_TOKENIZE.format(text_col=text_col)}) AS w
            FROM {source})
      WHERE w <> ''
    )"""
    parts = [head]
    for i, (lhs, rhs) in enumerate(merges):
        l, r = _sql_str(lhs), _sql_str(rhs)
        parts.append(f"""
    l{i} AS MATERIALIZED (SELECT w, string_split(s, chr(30)) AS lst FROM w{i}),
    f{i} AS (
      SELECT w, lst, 1 AS pos, lst[1] AS acc FROM l{i}
      UNION ALL
      SELECT f.w, f.lst, f.pos + 1,
             CASE WHEN right(chr(30) || f.acc, 1 + length({l})) = chr(30) || {l}
                       AND f.lst[f.pos + 1] = {r}
                  THEN f.acc || {r}
                  ELSE f.acc || chr(30) || f.lst[f.pos + 1] END
      FROM f{i} f WHERE f.pos < len(f.lst)
    ),
    w{i + 1} AS MATERIALIZED (SELECT w, acc AS s FROM f{i} WHERE pos = len(lst))""")
    return ",".join(parts)


def bpe_frozen_token_counts_oracle_sql(
    merges: List[Tuple[str, str]],
    source: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB replay of :func:`bpe_token_counts` under a FROZEN literal
    merge list — the production serving path (train once, ship the merge
    table, tokenize every delivery at explode+join cost with zero training
    rounds)."""
    n = len(merges)
    return f"""{_frozen_fold_ctes(merges, source, text_col)},
    d AS (
      SELECT {id_col}, unnest({_TOKENIZE.format(text_col=text_col)}) AS w
      FROM {source}
    ),
    v AS (SELECT w, len(string_split(s, chr(30))) AS w_tokens FROM w{n})
    SELECT d.{id_col}, CAST(sum(v.w_tokens) AS BIGINT) AS n_tokens
    FROM d JOIN v USING (w)
    WHERE d.w <> ''
    GROUP BY d.{id_col}
    """


def bpe_token_counts_oracle_sql(
    num_merges: int = 10,
    source: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB replay of train-then-encode: the final vocab state ``w{M}``
    provides per-word token counts; documents re-join on the word key."""
    return f"""{_train_ctes(num_merges, source, text_col)},
    d AS (
      SELECT {id_col}, unnest({_TOKENIZE.format(text_col=text_col)}) AS w
      FROM {source}
    ),
    v AS (SELECT w, len(string_split(s, chr(30))) AS w_tokens FROM w{num_merges})
    SELECT d.{id_col}, CAST(sum(v.w_tokens) AS BIGINT) AS n_tokens
    FROM d JOIN v USING (w)
    WHERE d.w <> ''
    GROUP BY d.{id_col}
    """


# ---------------------------------------------------------------------------
# WordPiece training (Schuster & Nakajima 2012; the BERT tokenizer family).
# Same vocabulary state and merge fold as BPE — the DIFFERENCE is the
# selection rule: instead of the raw pair-count argmax, WordPiece merges the
# pair maximizing the likelihood gain  count(lhs,rhs) / (count(lhs) *
# count(rhs))  — cohesion, not frequency, so rare-but-inseparable pairs
# (morphemes) win over ubiquitous-but-independent ones.
#
# Exactness contract: the score lives on a 10^12 integer grid —
# (pair_count * 10^12) DIV (lhs_total * rhs_total), the multiply exact in
# DECIMAL(38,0) / HUGEINT, one flooring division as the spec — so the argmax
# (score DESC, pair_count DESC, lhs, rhs) is bit-deterministic on both
# engines and the full training trajectory is hash-checkable like BPE's.
# Ties inside a tick tie-break by raw pair count, then lexicographically.
# Scale shape: identical to bpe_train plus one symbol-count aggregate and
# two vocab-sized joins per round; driver state stays one 1-row argmax.
# ---------------------------------------------------------------------------

WP_SCORE_SCALE = 10**12

WP_MERGES_SCHEMA = (
    "merge_rank int, lhs string, rhs string, pair_count long, score_scaled long"
)


def wordpiece_train(
    df: Optional[DataFrame],
    text_col: str = "text",
    num_merges: int = 10,
    vocab: Optional[DataFrame] = None,
) -> DataFrame:
    """Learn ``num_merges`` WordPiece merges; returns
    ``(merge_rank, lhs, rhs, pair_count, score_scaled)`` where
    ``score_scaled = (pair_count * 10^12) DIV (count(lhs) * count(rhs))``
    over the round's vocabulary state. The merge fold, word state, and
    iteration cache are shared with :func:`bpe_train` — only the argmax
    key differs."""
    if vocab is None:
        if df is None:
            raise ValueError("pass a corpus df or a precomputed vocab")
        vocab = word_counts(df, text_col)
    spark = vocab.sparkSession
    small = _collect_small_vocab(vocab, ["w", "cnt"])
    if small is not None:
        from spark_ensemble_spark.sources.datasets import local_df

        local = _local_wordpiece_merges(
            [[list(r[0]), int(r[1])] for r in small], num_merges
        )
        return local_df(spark, local, WP_MERGES_SCHEMA)
    words = vocab.select(char_syms(F.col("w")).alias("s"), F.col("cnt"))
    cache = DFIterationCache(interval=4, keep=2)
    words = cache.update(words)
    score = F.expr(
        f"CAST((CAST(pair_count AS DECIMAL(38,0)) * {WP_SCORE_SCALE})"
        " div (CAST(lc AS DECIMAL(38,0)) * CAST(rc AS DECIMAL(38,0))) AS LONG)"
    )
    merges: List[Tuple[int, str, str, int, int]] = []
    try:
        for rank in range(int(num_merges)):
            sym_counts = (
                words.select(F.explode(F.split("s", SEP)).alias("sym"), "cnt")
                .groupBy("sym")
                .agg(F.sum("cnt").alias("c"))
            )
            best = (
                words.select(F.explode(adjacent_pairs(F.col("s"))).alias("pr"), "cnt")
                .groupBy(F.col("pr.l").alias("lhs"), F.col("pr.r").alias("rhs"))
                .agg(F.sum("cnt").alias("pair_count"))
                .join(
                    sym_counts.select(F.col("sym").alias("lhs"), F.col("c").alias("lc")),
                    "lhs",
                )
                .join(
                    sym_counts.select(F.col("sym").alias("rhs"), F.col("c").alias("rc")),
                    "rhs",
                )
                .withColumn("score_scaled", score)
                .orderBy(
                    F.desc("score_scaled"), F.desc("pair_count"), "lhs", "rhs"
                )
                .limit(1)
                .collect()
            )
            if not best:
                break
            row = best[0]
            merges.append(
                (rank, row.lhs, row.rhs, int(row.pair_count), int(row.score_scaled))
            )
            words = cache.update(
                words.withColumn("s", apply_merge(F.col("s"), row.lhs, row.rhs))
            )
    finally:
        cache.close()
    from spark_ensemble_spark.sources.datasets import local_df

    return local_df(spark, merges, WP_MERGES_SCHEMA)


def _wp_iteration_ctes(i: int) -> str:
    """WordPiece analogue of :func:`_iteration_ctes`: adds the per-round
    symbol-count CTE ``s{i}`` and scores the argmax ``b{i}`` on the exact
    integer likelihood grid; the merge fold ``f{i}`` is identical."""
    return f"""
    l{i} AS MATERIALIZED (SELECT w, string_split(s, chr(30)) AS lst, cnt FROM w{i}),
    s{i} AS MATERIALIZED (
      SELECT sym, CAST(sum(cnt) AS BIGINT) AS c
      FROM (SELECT unnest(lst) AS sym, cnt FROM l{i})
      GROUP BY sym
    ),
    p{i} AS MATERIALIZED (
      SELECT pr.l AS lhs, pr.r AS rhs, CAST(sum(cnt) AS BIGINT) AS pair_count
      FROM (
        SELECT cnt,
               unnest(list_transform(range(1, len(lst)),
                                     j -> {{'l': lst[j], 'r': lst[j + 1]}})) AS pr
        FROM l{i}
      )
      GROUP BY 1, 2
    ),
    b{i} AS MATERIALIZED (
      SELECT p.lhs, p.rhs, p.pair_count,
             CAST((CAST(p.pair_count AS HUGEINT) * {WP_SCORE_SCALE})
                  // (CAST(la.c AS HUGEINT) * ra.c) AS BIGINT) AS score_scaled
      FROM p{i} p
      JOIN s{i} la ON la.sym = p.lhs
      JOIN s{i} ra ON ra.sym = p.rhs
      ORDER BY score_scaled DESC, p.pair_count DESC, p.lhs, p.rhs
      LIMIT 1
    ),
    f{i} AS (
      SELECT w, lst, cnt, 1 AS pos, lst[1] AS acc FROM l{i}
      UNION ALL
      SELECT f.w, f.lst, f.cnt, f.pos + 1,
             CASE WHEN right(chr(30) || f.acc, 1 + length(b.lhs)) = chr(30) || b.lhs
                       AND f.lst[f.pos + 1] = b.rhs
                  THEN f.acc || b.rhs
                  ELSE f.acc || chr(30) || f.lst[f.pos + 1] END
      FROM f{i} f, b{i} b WHERE f.pos < len(f.lst)
    ),
    w{i + 1} AS MATERIALIZED (SELECT w, acc AS s, cnt FROM f{i} WHERE pos = len(lst))"""


def wordpiece_train_oracle_sql(
    num_merges: int = 10, source: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB replay of :func:`wordpiece_train` — the identical trajectory
    (symbol counts, pair counts, integer-grid scores, argmax tie-breaks,
    merge folds), every round hash-checked."""
    head = f"""WITH RECURSIVE
    w0 AS (
      SELECT w,
             list_aggregate(list_transform(range(1, length(w) + 1), i -> w[i]),
                            'string_agg', chr(30)) AS s,
             CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest({_TOKENIZE.format(text_col=text_col)}) AS w FROM {source})
      WHERE w <> ''
      GROUP BY w
    )"""
    chain = head + ",".join([""] + [_wp_iteration_ctes(i) for i in range(num_merges)])
    rows = "\n      UNION ALL ".join(
        f"SELECT {i} AS merge_rank, lhs, rhs, pair_count, score_scaled FROM b{i}"
        for i in range(num_merges)
    )
    return f"""{chain}
    SELECT merge_rank, lhs, rhs, pair_count, score_scaled FROM ({rows})
    ORDER BY merge_rank
    """


def wordpiece_token_counts_oracle_sql(
    num_merges: int = 10,
    source: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB replay of WordPiece train-then-encode (the
    :func:`bpe_token_counts_oracle_sql` shape under the likelihood-scored
    chain): the final vocab state ``w{M}`` provides per-word token counts;
    documents re-join on the word key."""
    head = f"""WITH RECURSIVE
    w0 AS (
      SELECT w,
             list_aggregate(list_transform(range(1, length(w) + 1), i -> w[i]),
                            'string_agg', chr(30)) AS s,
             CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest({_TOKENIZE.format(text_col=text_col)}) AS w FROM {source})
      WHERE w <> ''
      GROUP BY w
    )"""
    chain = head + ",".join(
        [""] + [_wp_iteration_ctes(i) for i in range(num_merges)]
    )
    return f"""{chain},
    d AS (
      SELECT {id_col}, unnest({_TOKENIZE.format(text_col=text_col)}) AS w
      FROM {source}
    ),
    v AS (SELECT w, len(string_split(s, chr(30))) AS w_tokens FROM w{num_merges})
    SELECT d.{id_col}, CAST(sum(v.w_tokens) AS BIGINT) AS n_tokens
    FROM d JOIN v USING (w)
    WHERE d.w <> ''
    GROUP BY d.{id_col}
    """
