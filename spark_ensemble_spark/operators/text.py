"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure Catalyst column expressions over the ``documents``
table — no UDFs, so they whole-stage-codegen and scale linearly with input
(the 100 TB path is a single parquet scan + projection per operator).

Operators: whitespace + BPE-ish token counting, MD5 document fingerprinting,
quality scoring (length/stopword/punctuation components), n-gram-free
stopword-based language identification.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_ensemble_spark.functions.rounding import floor_round as _floor_round

# Deliberately small marker lists — deterministic and mirrored 1:1 in the SQL
# oracles. Real pipelines would swap in fastText-style models via mapInPandas.
LANG_MARKERS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un", "une"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
    "zh": ["de", "shi", "bu", "le", "wo", "ni"],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

_WS = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed, lowercased text."""
    return F.split(F.lower(F.trim(text)), _WS)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: word pieces of <=4 chars, digits, and
    punctuation each count as one token (a cheap BPE proxy; the regex is the
    public GPT-2-style pre-tokenizer shape without lookaheads)."""
    return F.regexp_count(F.lower(text), F.lit(r"[a-z]{1,4}|[0-9]|[^a-z0-9\s]"))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: MD5 of whitespace-normalized,
    lowercased text. Identical in any engine with md5()."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), _WS, " "))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    matches = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return matches / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[.,!?;:]")) / F.greatest(
        F.length(text), F.lit(1)
    )


def quality_score(text: Column) -> Column:
    """Piecewise-linear quality heuristic in [0, 1]: length component +
    stopword component + punctuation penalty. All-arithmetic (no transcendental
    functions) so any engine computes bit-identical doubles."""
    n_tok = token_count(text)
    length_comp = F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.5
    stop_comp = stopword_ratio(text) * 0.3
    punct_comp = (1.0 - F.least(punct_ratio(text) * 10.0, F.lit(1.0))) * 0.2
    return length_comp + stop_comp + punct_comp


def language_scores(text: Column) -> Dict[str, Column]:
    toks = F.array_distinct(tokens(text))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def language_id(text: Column) -> Column:
    """argmax over marker-hit counts; ties break by the fixed language order
    (first language with the maximal score wins)."""
    scores = language_scores(text)
    langs = list(scores)
    best = scores[langs[0]]
    for lang in langs[1:]:
        best = F.greatest(best, scores[lang])
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return expr


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis projection over a documents table."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_bpe_tokens": bpe_ish_token_count(t),
            "fingerprint": fingerprint(t),
            "stopword_ratio": _floor_round(stopword_ratio(t), 6),
            "punct_ratio": _floor_round(punct_ratio(t), 6),
            "quality": _floor_round(quality_score(t), 6),
            "lang_pred": language_id(t),
        }
    )


# ---------------------------------------------------------------------------
# PII-ish scrubbing: regex redaction of emails / URLs / phone-shaped / IP
# tokens. Pure Catalyst regexp_replace chain (whole-stage codegen, zero
# UDFs) — the standard pre-release scrub pass of a training-corpus pipeline.
# Patterns are deliberately conservative surface patterns, not validators:
# at 100 TB you want a cheap, high-recall first pass; flagged documents can
# route to heavier (model-based) scrubbers downstream.
# ---------------------------------------------------------------------------

REDACTION_PATTERNS = [
    # (name, regex, replacement) — applied in order, earlier wins overlap
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"(?i)\bhttps?://[^\s<>\"']+", "<URL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (
        "phone",
        r"(?<![\w.])(?:\+?\d{1,3}[ .\-]?)?(?:\(\d{2,4}\)[ .\-]?)?\d{3}[ .\-]\d{3,4}(?:[ .\-]\d{2,4})?(?![\w.])",
        "<PHONE>",
    ),
]


def hashed_bow_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Feature hashing ("hashing trick"): signed hashed bag-of-words —
    ``(id, dim, weight)`` rows where ``weight = Σ_token sign(h) [h mod dim]``.

    The vocabulary-FREE text featurizer (Weinberger et al. 2009): no fitted
    dictionary to build, broadcast, or keep in sync — exactly what a 100 TB
    corpus wants, since a vocab pass is another full scan and a 10⁸-term
    broadcast. The sign bit makes collisions cancel in expectation instead of
    accumulating. Plan: explode tokens → hash once (codegen) → groupBy
    (id, dim) with map-side partials; emitted FLAT (zero dims absent) so
    downstream assembles sparse vectors however it likes. ``md5`` mode is the
    cross-engine verification hash (see dedup._hash64)."""
    from spark_ensemble_spark.operators.dedup import _hash64

    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(tokens(F.coalesce(F.col(text_col), F.lit(""))), lambda t: t != "")
        ).alias("__t"),
    ).select(F.col(id_col), _hash64(F.col("__t"), hash_fn).alias("__h"))
    sign = F.when((F.col("__h") % 2) == 0, 1).otherwise(-1)
    return (
        toks.select(
            F.col(id_col),
            F.pmod(F.col("__h"), F.lit(dim)).alias("dim"),
            sign.alias("__s"),
        )
        .groupBy(id_col, "dim")
        .agg(F.sum("__s").alias("weight"))
    )


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (rolling hash).
#
# Schleimer, Wilkerson, Aiken, "Winnowing: Local Algorithms for Document
# Fingerprinting" (SIGMOD 2003) — the MOSS fingerprint: hash every
# character k-gram of the normalized text with a Rabin-Karp polynomial
# rolling hash, slide a window of w consecutive k-gram hashes, and keep the
# minimum of each window. Any shared substring of length >= k + w - 1
# between two documents is guaranteed to share at least one selected
# fingerprint, so fingerprint overlap is a sound near-dup candidate signal.
#
# Implementation is pure Catalyst (transform/slice/array_min folds — zero
# UDFs, zero shuffles: one projection per document). The polynomial hash is
# evaluated per position as sum(code_j * base^(k-1-j)) % mod: with
# base=257, k<=8 and codes <= 122 the unreduced sum stays < 2^63, so the
# single end mod is EXACTLY the classic incremental rolling-hash value and
# any engine (DuckDB included) replays it from the same closed form. k is a
# small constant, so the O(n*k) windowed form is O(n) per document — at
# 100 TB this is a scan-local projection; no state, no exchange.
#
# The one genuine hazard of expressing a rolling hash as nested
# higher-order functions is ELEMENT-WISE RE-EVALUATION: HOF lambdas run on
# the interpreted path (CodegenFallback), where a subexpression referenced
# inside the lambda body is re-evaluated at EVERY element — a naive
# "hash = f(substring(norm, i, 1), …)" form re-runs the regexp_replace
# normalization (and an O(len) substring scan) len×k times per row,
# turning O(len·k) into O(len²·k) with a regex in the inner loop (measured:
# a single 500-doc partition pinned a core for >13 minutes). The fix is
# _let(): binding a value as a single-element-array transform's lambda
# variable forces exactly one evaluation per row, and nested lambdas close
# over it for O(1) element_at access. norm → codes → hashes are each bound
# once; the inner loops touch only bound arrays.
# ---------------------------------------------------------------------------

WINNOW_K = 5
WINNOW_W = 4
WINNOW_BASE = 257
WINNOW_MOD = 1_000_003

_WINNOW_NORM_RE = "[^a-z0-9]"


def _winnow_norm(text: Column) -> Column:
    """Winnowing normalization: lowercase, strip everything outside
    [a-z0-9] (whitespace AND punctuation) — so fingerprints are insensitive
    to formatting and word spacing, per the paper's recommendation."""
    return F.regexp_replace(F.lower(text), _WINNOW_NORM_RE, "")


def _let(value: Column, body) -> Column:
    """Evaluate ``value`` ONCE per row and pass the bound result to
    ``body`` — Catalyst has no let-expression, but a single-element-array
    ``transform`` is one: the lambda variable is the evaluated argument,
    so every reference inside ``body`` (including inside nested lambdas,
    which close over outer lambda variables) reads the bound value instead
    of re-evaluating the defining expression element-wise."""
    return F.element_at(F.transform(F.array(value), body), 1)


def winnow_fingerprints(
    text: Column,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    base: int = WINNOW_BASE,
    mod: int = WINNOW_MOD,
) -> Column:
    """Distinct winnowed fingerprints of ``text`` as a sorted bigint array.

    Documents with fewer than ``k`` normalized characters fingerprint to an
    empty array; documents with between 1 and ``w - 1`` k-grams keep the
    single global minimum (the degenerate one-window case)."""
    max_code = 122  # 'z'; normalized alphabet is [a-z0-9]
    assert max_code * sum(base**j for j in range(k)) < 2**62, "hash overflow"
    coeffs = [base ** (k - 1 - j) for j in range(k)]
    empty = F.array().cast("array<bigint>")

    def kgram_hash(codes: Column):
        # codes is a bound array: k O(1) element_at reads per position.
        def at(i: Column) -> Column:
            total = F.lit(0).cast("long")
            for j, c in enumerate(coeffs):
                total = total + F.element_at(codes, i + F.lit(j)).cast(
                    "long"
                ) * F.lit(c)
            return total % F.lit(mod)

        return at

    def from_hashes(hashes: Column) -> Column:
        nh = F.size(hashes)
        nw = nh - F.lit(w - 1)
        return (
            F.when(
                nw >= 1,
                F.transform(
                    F.sequence(F.lit(1), nw),
                    lambda p: F.array_min(F.slice(hashes, p, w)),
                ),
            )
            .when(nh >= 1, F.array(F.array_min(hashes)))
            .otherwise(empty)
        )

    def from_codes(codes: Column) -> Column:
        nk = F.size(codes) - F.lit(k - 1)
        hashes = F.when(
            F.size(codes) >= F.lit(k),
            F.transform(F.sequence(F.lit(1), nk), kgram_hash(codes)),
        ).otherwise(empty)
        return _let(hashes, from_hashes)

    def from_norm(s: Column) -> Column:
        codes = F.when(
            F.length(s) >= F.lit(k),
            F.transform(F.split(s, ""), lambda ch: F.ascii(ch)),
        ).otherwise(F.array().cast("array<int>"))
        return _let(codes, from_codes)

    wins = _let(_winnow_norm(text), from_norm)
    return F.array_sort(F.array_distinct(wins))


def winnow_table_sql(
    source: str,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    base: int = WINNOW_BASE,
    mod: int = WINNOW_MOD,
) -> str:
    """DuckDB replay of :func:`winnow_fingerprints` over a table expression:
    a SELECT producing ``(id, fps)`` — sorted distinct fingerprint list per
    row — from the same closed-form polynomial and window-min chain, so the
    whole rolling-hash pipeline is cross-engine checkable."""
    norm = f"regexp_replace(lower({text_expr}), '{_WINNOW_NORM_RE}', '', 'g')"
    kh = " + ".join(
        f"ascii(substr(s, i+{j}, 1)) * {base ** (k - 1 - j)}" for j in range(k)
    )
    return f"""
      SELECT id, CASE
          WHEN len(hs) >= {w} THEN list_sort(list_distinct(
              list_transform(range(1, len(hs) - {w - 1} + 1),
                  p -> list_aggregate(list_slice(hs, p, p + {w - 1}), 'min'))))
          WHEN len(hs) >= 1 THEN [list_aggregate(hs, 'min')]
          ELSE CAST([] AS BIGINT[]) END AS fps
      FROM (
        SELECT id, CASE WHEN length(s) >= {k}
            THEN list_transform(range(1, length(s) - {k - 1} + 1), i -> ({kh}) % {mod})
            ELSE CAST([] AS BIGINT[]) END AS hs
        FROM (SELECT {id_expr} AS id, {norm} AS s FROM {source})
      )"""


def winnow_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """``(id, fp)`` exploded winnowed fingerprints — the candidate-signal
    shape :func:`~spark_ensemble_spark.operators.dedup.winnow_dup_pairs`
    consumes. One scan, one projection, no shuffle (beyond the same
    small-input spread gate every interpreted-fold LSH family uses: the
    rolling-hash folds are CodegenFallback, so a single-row-group test file
    must not pin them to one or two tasks; no-op on production inputs that
    already have ≥parallelism splits)."""
    from spark_ensemble_spark.sources.datasets import spread_to_parallelism

    df = spread_to_parallelism(df)
    return df.select(
        F.col(id_col),
        F.explode(winnow_fingerprints(F.col(text_col), k=k, w=w)).alias("fp"),
    )


def redact(text: Column, kinds: Optional[Sequence[str]] = None) -> Column:
    """Replace PII-shaped substrings with typed placeholder tokens.

    ``kinds`` selects a subset of :data:`REDACTION_PATTERNS` by name
    (default: all, in declaration order — email before phone so the digits
    of an address's domain aren't re-matched)."""
    wanted = set(kinds) if kinds is not None else None
    out = text
    for name, pattern, repl in REDACTION_PATTERNS:
        if wanted is None or name in wanted:
            out = F.regexp_replace(out, pattern, repl)
    return out


def redaction_counts(text: Column) -> Dict[str, Column]:
    """Per-kind match counts (cheap audit columns: how much each scrub pass
    would remove — drives routing thresholds without a second scan)."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))
        for name, pattern, _ in REDACTION_PATTERNS
    }
