"""PII detection and redaction over document text.

A standard privacy stage of an LLM training-data pipeline (the C4 /
RefinedWeb / FineWeb recipes all ship one): find personally-identifiable
spans — emails, credit-card numbers, SSNs, phone numbers, IPv4 addresses —
count them per document, and replace them with typed sentinel tokens.

Spark-first shape: ONE narrow projection of JVM-side ``regexp_count`` /
``regexp_replace`` expressions per rule — no UDF, no shuffle, whole rows
never leave the scan task. At 100 TB this is embarrassingly parallel and
pipeline-fuses with whatever filter/tokenize stage runs next; the only
cost is the regex automaton per row, exactly like the reference's
row-local text transforms (reference parity: the reference engine has no
PII surface — this is beyond-reference LLM-pipeline scope, SURVEY.md §6).

Cross-engine determinism: every pattern is written in the common
Java-regex ∩ RE2 dialect — character classes, bounded quantifiers,
non-capturing groups, ``\\b`` word boundaries; NO backreferences (RE2
lacks them), NO ``\\d`` shorthand (Unicode-class drift), NO case flags.
Rules apply in a FIXED order (email first — a local-part can contain
digit runs that the number rules would otherwise chew mid-address — then
credit card, SSN, phone, IPv4), and each rule's count is taken on the
text AFTER the earlier rules redacted it, so the sequential fold is
well-defined and the DuckDB oracle (:func:`scrub_pii_sql`) replays it
token-for-token.

The synthetic ``documents`` fixtures carry no real PII, so
:func:`inject_pii` plants deterministic spans derived from ``doc_id``
with exact integer arithmetic (same posture as
``multimodal.synthetic_bmp_corpus``: the fixture is derived from table
columns on BOTH engines, so detection — the thing under test — has a
true oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (rule name, pattern, sentinel) in scrub order. Patterns are valid and
# equivalent in Java regex (Spark) and RE2 (DuckDB): verified by
# tests/test_operators.py::test_pii_patterns_cross_engine over adversarial
# fixtures, and by the docs_pii_scrub oracle at 2 SFs.
PII_RULES: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "credit_card",
        r"\b[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}\b",
        "<CREDIT_CARD>",
    ),
    (
        "ssn",
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        r"\+?[0-9]{0,2}[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IPV4>",
    ),
]


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sequentially redact every :data:`PII_RULES` pattern from
    ``text_col``, adding one ``n_<rule>`` count column per rule (matches
    found at that rule's turn in the fold) plus the final ``redacted``
    text and ``n_pii`` total. Pure JVM regex projection — scales as the
    scan does."""
    cur: Column = F.col(text_col)
    counts = []
    for name, pat, token in PII_RULES:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    total = None
    for name, _, _ in PII_RULES:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return df.select("*", *counts, cur.alias("redacted")).withColumn(
        "n_pii", total.cast("int")
    )


def scrub_pii_sql(text_expr: str) -> tuple[list[str], str]:
    """DuckDB mirror of :func:`scrub_pii`'s fold over ``text_expr``:
    returns (per-rule count exprs in rule order, redacted-text expr).
    DuckDB's ``regexp_replace`` is single-occurrence by default — the
    ``'g'`` flag replays Spark's replace-all semantics."""
    cur = text_expr
    counts = []
    for name, pat, token in PII_RULES:
        p = pat.replace("'", "''")
        counts.append(f"len(regexp_extract_all({cur}, '{p}')) AS n_{name}")
        cur = f"regexp_replace({cur}, '{p}', '{token}', 'g')"
    return counts, cur


def inject_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Plant deterministic PII spans derived from ``id_col`` (exact integer
    arithmetic — bit-identical on both engines):

    - ``id % 3 == 0``  → an email  ``u<id>@host<id%7>.example.com``
    - ``id % 5 == 0``  → a phone   ``(AAA) BBB-CCCC`` from id digits
    - ``id % 7 == 0``  → an IPv4   ``a.b.c.d`` with octets = id multiples % 256
    - ``id % 11 == 0`` → an SSN    ``AAA-BB-CCCC``
    - ``id % 13 == 0`` → a card    ``AAAA BBBB CCCC DDDD``

    Composite ids get several spans (the interesting case for the
    sequential fold). Returns the frame with ``text_col`` extended."""
    i = F.col(id_col)

    def d3(x: Column) -> Column:  # zero-padded 3-digit block in [100, 999]
        return (F.pmod(x, F.lit(900)) + 100).cast("string")

    def d4(x: Column) -> Column:
        return (F.pmod(x, F.lit(9000)) + 1000).cast("string")

    email = F.concat(
        F.lit(" mail u"), i.cast("string"), F.lit("@host"),
        F.pmod(i, F.lit(7)).cast("string"), F.lit(".example.com"),
    )
    phone = F.concat(
        F.lit(" call ("), d3(i), F.lit(") "), d3(i * 7), F.lit("-"), d4(i * 13)
    )
    ip = F.concat(
        F.lit(" from "), F.pmod(i, F.lit(256)).cast("string"),
        F.lit("."), F.pmod(i * 3, F.lit(256)).cast("string"),
        F.lit("."), F.pmod(i * 5, F.lit(256)).cast("string"),
        F.lit("."), F.pmod(i * 11, F.lit(256)).cast("string"),
    )
    ssn = F.concat(
        F.lit(" ssn "), d3(i * 17), F.lit("-"),
        (F.pmod(i, F.lit(90)) + 10).cast("string"), F.lit("-"), d4(i * 19),
    )
    card = F.concat(
        F.lit(" card "), d4(i), F.lit(" "), d4(i * 3), F.lit(" "),
        d4(i * 7), F.lit(" "), d4(i * 9),
    )
    extended = F.concat(
        F.col(text_col),
        F.when(F.pmod(i, F.lit(3)) == 0, email).otherwise(F.lit("")),
        F.when(F.pmod(i, F.lit(5)) == 0, phone).otherwise(F.lit("")),
        F.when(F.pmod(i, F.lit(7)) == 0, ip).otherwise(F.lit("")),
        F.when(F.pmod(i, F.lit(11)) == 0, ssn).otherwise(F.lit("")),
        F.when(F.pmod(i, F.lit(13)) == 0, card).otherwise(F.lit("")),
    )
    return df.withColumn(text_col, extended)


def inject_pii_sql(text_expr: str = "text", id_expr: str = "doc_id") -> str:
    """DuckDB mirror of :func:`inject_pii` (Spark ``pmod`` on non-negative
    ids ≡ DuckDB ``%``; string casts of BIGINT are identical)."""
    i = id_expr

    def d3(mult: int) -> str:
        return f"CAST(({i} * {mult}) % 900 + 100 AS VARCHAR)"

    def d4(mult: int) -> str:
        return f"CAST(({i} * {mult}) % 9000 + 1000 AS VARCHAR)"

    email = (
        f"' mail u' || CAST({i} AS VARCHAR) || '@host' || "
        f"CAST({i} % 7 AS VARCHAR) || '.example.com'"
    )
    phone = f"' call (' || {d3(1)} || ') ' || {d3(7)} || '-' || {d4(13)}"
    ip = (
        f"' from ' || CAST({i} % 256 AS VARCHAR) || '.' || "
        f"CAST(({i} * 3) % 256 AS VARCHAR) || '.' || "
        f"CAST(({i} * 5) % 256 AS VARCHAR) || '.' || "
        f"CAST(({i} * 11) % 256 AS VARCHAR)"
    )
    ssn = (
        f"' ssn ' || {d3(17)} || '-' || "
        f"CAST({i} % 90 + 10 AS VARCHAR) || '-' || {d4(19)}"
    )
    card = f"' card ' || {d4(1)} || ' ' || {d4(3)} || ' ' || {d4(7)} || ' ' || {d4(9)}"
    return (
        f"{text_expr}"
        f" || (CASE WHEN {i} % 3 = 0 THEN {email} ELSE '' END)"
        f" || (CASE WHEN {i} % 5 = 0 THEN {phone} ELSE '' END)"
        f" || (CASE WHEN {i} % 7 = 0 THEN {ip} ELSE '' END)"
        f" || (CASE WHEN {i} % 11 = 0 THEN {ssn} ELSE '' END)"
        f" || (CASE WHEN {i} % 13 = 0 THEN {card} ELSE '' END)"
    )


def pii_scrub_oracle_sql(table: str = "documents") -> str:
    """Full DuckDB replay of inject → sequential scrub → report."""
    counts, redacted = scrub_pii_sql("text")
    count_cols = ",\n           ".join(counts)
    total = " + ".join(f"n_{name}" for name, _, _ in PII_RULES)
    typed = ", ".join(f"CAST(n_{name} AS INT) AS n_{name}" for name, _, _ in PII_RULES)
    return f"""
    WITH injected AS (
      SELECT doc_id, {inject_pii_sql('text', 'doc_id')} AS text FROM {table}
    ),
    scrubbed AS (
      SELECT doc_id,
           {count_cols},
           {redacted} AS redacted
      FROM injected
    )
    SELECT doc_id, {typed},
           CAST({total} AS INT) AS n_pii, redacted
    FROM scrubbed
    """
