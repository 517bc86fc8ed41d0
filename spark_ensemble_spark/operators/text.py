"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure Catalyst column expressions over the ``documents``
table — no UDFs, so they whole-stage-codegen and scale linearly with input
(the 100 TB path is a single parquet scan + projection per operator).

Operators: whitespace + BPE-ish token counting, MD5 document fingerprinting,
quality scoring (length/stopword/punctuation components), n-gram-free
stopword-based language identification.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
            "stopword_ratio": F.round(stopword_ratio(t), 6),
            "punct_ratio": F.round(punct_ratio(t), 6),
            "quality": F.round(quality_score(t), 6),
            "lang_pred": language_id(t),
        }
    )
