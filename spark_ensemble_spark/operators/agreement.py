"""Inter-annotator agreement: Cohen's kappa (pairwise) and Fleiss' kappa.

The QC stage of preference/label collection (the data BT fits on —
``operators/preference``): before trusting rater labels, measure how much
raters agree BEYOND CHANCE. Cohen's kappa (1960) for each rater pair,
Fleiss' kappa (1971) for the panel:

    kappa = (p_o - p_e) / (1 - p_e)

Exactness contract: every input to the final division is an EXACT
integer aggregate (agreement counts, marginal label counts, squared
sums), combined with 128-bit multiplies (DECIMAL(38,0) on Spark,
HUGEINT in DuckDB); the conversion int -> double and one IEEE division
are bit-identical on both engines, and outputs floor-round onto the
1e-6 grid. No floating-point accumulates across rows anywhere.

Scale shape: the label table shuffles once per aggregate family —
pairwise agreement is ONE self-equi-join on the item key (R² rows per
item, R = raters, tiny), marginals and per-item category counts are
map-side-combined groupBys. Nothing is ever collected.

The testdata has no rater column, so the registry rows inject a
deterministic 3-rater keep/drop panel from ``(doc_id, n_chars)`` (the
PII fixture posture).

Reference parity: no agreement surface in the reference — beyond-
reference LLM-pipeline scope (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ensemble_spark.functions.rounding import floor_round, floor_round_sql


def cohens_kappa_pairs(
    labels: DataFrame,
    item_col: str = "item_id",
    rater_col: str = "rater",
    label_col: str = "label",
) -> DataFrame:
    """Cohen's kappa for every rater pair over a long ``(item, rater,
    label)`` frame (raters need not label every item — each pair is
    scored on its co-labeled items). Returns ``(rater_a, rater_b,
    n_items, n_agree, po, pe, kappa)``, ``rater_a < rater_b``."""
    lab = labels.select(
        F.col(item_col).alias("item"),
        F.col(rater_col).alias("rater"),
        F.col(label_col).alias("label"),
    )
    joined = (
        lab.alias("l")
        .join(lab.alias("r"), "item")
        .where(F.col("l.rater") < F.col("r.rater"))
        .select(
            F.col("l.rater").alias("rater_a"),
            F.col("r.rater").alias("rater_b"),
            F.col("l.label").alias("la"),
            F.col("r.label").alias("lb"),
        )
    )
    # per-pair totals and agreement
    totals = joined.groupBy("rater_a", "rater_b").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.when(F.col("la") == F.col("lb"), 1).otherwise(0)).alias("n_agree"),
    )
    # per-pair marginals of each side, joined on category -> chance term
    ma = joined.groupBy("rater_a", "rater_b", F.col("la").alias("cat")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    mb = joined.groupBy("rater_a", "rater_b", F.col("lb").alias("cat")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    pe_num = (
        ma.join(mb, ["rater_a", "rater_b", "cat"])
        .groupBy("rater_a", "rater_b")
        .agg(
            F.sum(
                F.col("ca").cast("decimal(38,0)") * F.col("cb").cast("decimal(38,0)")
            ).alias("pe_num")
        )
    )
    out = totals.join(pe_num, ["rater_a", "rater_b"])
    n = F.col("n_items").cast("decimal(38,0)")
    agree = F.col("n_agree").cast("decimal(38,0)")
    nn = n * n
    po = F.col("n_agree").cast("double") / F.col("n_items").cast("double")
    pe = F.col("pe_num").cast("double") / nn.cast("double")
    # pe = 1 forces po = 1 (both marginals degenerate on one category):
    # kappa is 0/0 — defined as 0.0 (a chance-saturated panel carries no
    # chance-corrected signal; sklearn returns NaN, which would poison
    # downstream filters).
    kappa = F.when(nn == F.col("pe_num"), F.lit(0.0)).otherwise(
        (agree * n - F.col("pe_num")).cast("double")
        / (nn - F.col("pe_num")).cast("double")
    )
    return out.select(
        "rater_a",
        "rater_b",
        F.col("n_items").cast("long").alias("n_items"),
        F.col("n_agree").cast("long").alias("n_agree"),
        floor_round(po, 6).alias("po"),
        floor_round(pe, 6).alias("pe"),
        floor_round(kappa, 6).alias("kappa"),
    )


def cohens_kappa_pairs_sql(labels_sql: str) -> str:
    """DuckDB replay of :func:`cohens_kappa_pairs`; ``labels_sql`` emits
    ``(item, rater, label)``."""
    po = floor_round_sql("CAST(t.n_agree AS DOUBLE) / t.n_items", 6)
    pe = floor_round_sql(
        "CAST(p.pe_num AS DOUBLE)"
        " / CAST(CAST(t.n_items AS HUGEINT) * t.n_items AS DOUBLE)",
        6,
    )
    kappa = floor_round_sql(
        "CASE WHEN CAST(t.n_items AS HUGEINT) * t.n_items = p.pe_num"
        " THEN CAST(0 AS DOUBLE)"
        " ELSE CAST(CAST(t.n_agree AS HUGEINT) * t.n_items - p.pe_num AS DOUBLE)"
        " / CAST(CAST(t.n_items AS HUGEINT) * t.n_items - p.pe_num AS DOUBLE)"
        " END",
        6,
    )
    return f"""
    WITH lab AS MATERIALIZED ({labels_sql}),
    j AS MATERIALIZED (
      SELECT l.rater AS rater_a, r.rater AS rater_b,
             l.label AS la, r.label AS lb
      FROM lab l JOIN lab r ON l.item = r.item AND l.rater < r.rater
    ),
    t AS MATERIALIZED (
      SELECT rater_a, rater_b, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
      FROM j GROUP BY 1, 2
    ),
    p AS MATERIALIZED (
      SELECT ma.rater_a, ma.rater_b,
             sum(CAST(ma.ca AS HUGEINT) * mb.cb) AS pe_num
      FROM (SELECT rater_a, rater_b, la AS cat, count(*) AS ca
            FROM j GROUP BY 1, 2, 3) ma
      JOIN (SELECT rater_a, rater_b, lb AS cat, count(*) AS cb
            FROM j GROUP BY 1, 2, 3) mb
        USING (rater_a, rater_b, cat)
      GROUP BY 1, 2
    )
    SELECT t.rater_a, t.rater_b, t.n_items, t.n_agree,
           {po} AS po, {pe} AS pe, {kappa} AS kappa
    FROM t JOIN p USING (rater_a, rater_b)
    """


def fleiss_kappa(
    labels: DataFrame,
    item_col: str = "item_id",
    rater_col: str = "rater",
    label_col: str = "label",
) -> DataFrame:
    """Fleiss' kappa over the whole panel (every item must carry the same
    number of ratings R — the fixture guarantees it; the classic
    formulation's requirement). One row:
    ``(n_items, n_raters, p_bar, p_e_bar, kappa)``."""
    lab = labels.select(
        F.col(item_col).alias("item"), F.col(label_col).alias("label")
    )
    nic = lab.groupBy("item", "label").agg(F.count(F.lit(1)).alias("c"))
    per_item = nic.groupBy("item").agg(
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)")
        ).alias("s2"),
        F.sum("c").alias("r"),
    )
    cat = nic.groupBy("label").agg(F.sum("c").cast("decimal(38,0)").alias("tc"))
    agg = per_item.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("s2").alias("s1"),
        F.max("r").alias("n_raters"),
        F.min("r").alias("_rmin"),
    )
    cat_agg = cat.agg(F.sum(F.col("tc") * F.col("tc")).alias("pe_num"))
    out = agg.crossJoin(F.broadcast(cat_agg))
    n = F.col("n_items").cast("decimal(38,0)")
    r = F.col("n_raters").cast("decimal(38,0)")
    nr = n * r
    # P̄ = (S1 - N·R) / (N·R·(R-1));  P̄e = Σ Tc² / (N·R)²
    p_bar = (F.col("s1") - nr).cast("double") / (nr * (r - 1)).cast("double")
    p_e = F.col("pe_num").cast("double") / (nr * nr).cast("double")
    # pe = 1 (pe_num == (NR)²) zeroes the denominator: kappa := 0.0, the
    # same chance-saturated convention as the pairwise form.
    kappa = F.when(nr * nr == F.col("pe_num"), F.lit(0.0)).otherwise(
        (
            (F.col("s1") - nr).cast("double") * (nr * nr).cast("double")
            - F.col("pe_num").cast("double") * (nr * (r - 1)).cast("double")
        )
        / (
            (nr * nr).cast("double") * (nr * (r - 1)).cast("double")
            - F.col("pe_num").cast("double") * (nr * (r - 1)).cast("double")
        )
    )
    return out.where(F.col("_rmin") == F.col("n_raters")).select(
        F.col("n_items").cast("long").alias("n_items"),
        F.col("n_raters").cast("long").alias("n_raters"),
        floor_round(p_bar, 6).alias("p_bar"),
        floor_round(p_e, 6).alias("p_e_bar"),
        floor_round(kappa, 6).alias("kappa"),
    )


def fleiss_kappa_sql(labels_sql: str) -> str:
    """DuckDB replay of :func:`fleiss_kappa`."""
    p_bar = floor_round_sql(
        "CAST(a.s1 - a.nr AS DOUBLE) / CAST(a.nr * (a.r - 1) AS DOUBLE)", 6
    )
    p_e = floor_round_sql(
        "CAST(c.pe_num AS DOUBLE) / CAST(a.nr * a.nr AS DOUBLE)", 6
    )
    kappa = floor_round_sql(
        "CASE WHEN a.nr * a.nr = c.pe_num THEN CAST(0 AS DOUBLE)"
        " ELSE (CAST(a.s1 - a.nr AS DOUBLE) * CAST(a.nr * a.nr AS DOUBLE)"
        " - CAST(c.pe_num AS DOUBLE) * CAST(a.nr * (a.r - 1) AS DOUBLE))"
        " / (CAST(a.nr * a.nr AS DOUBLE) * CAST(a.nr * (a.r - 1) AS DOUBLE)"
        " - CAST(c.pe_num AS DOUBLE) * CAST(a.nr * (a.r - 1) AS DOUBLE))"
        " END",
        6,
    )
    return f"""
    WITH lab AS MATERIALIZED ({labels_sql}),
    nic AS MATERIALIZED (
      SELECT item, label, CAST(count(*) AS BIGINT) AS c
      FROM lab GROUP BY 1, 2
    ),
    per_item AS MATERIALIZED (
      SELECT item, sum(CAST(c AS HUGEINT) * c) AS s2, CAST(sum(c) AS BIGINT) AS r
      FROM nic GROUP BY item
    ),
    a AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS n_items,
             sum(s2) AS s1,
             CAST(max(r) AS HUGEINT) AS r,
             CAST(count(*) AS HUGEINT) * max(r) AS nr,
             min(r) AS rmin, max(r) AS rmax
      FROM per_item
    ),
    c AS MATERIALIZED (
      SELECT sum(CAST(tc AS HUGEINT) * tc) AS pe_num
      FROM (SELECT label, CAST(sum(c) AS BIGINT) AS tc FROM nic GROUP BY label)
    )
    SELECT a.n_items, CAST(a.r AS BIGINT) AS n_raters,
           {p_bar} AS p_bar, {p_e} AS p_e_bar, {kappa} AS kappa
    FROM a, c WHERE a.rmin = a.rmax
    """


# ---------------------------------------------------------------------------
# Deterministic rater fixture (testdata has no rater labels).
# ---------------------------------------------------------------------------


def rater_labels_fixture(docs: DataFrame, n_raters: int = 3) -> DataFrame:
    """A replayable 3-rater keep/drop panel: rater ``r`` labels doc ``d``
    keep iff ``(doc_id * (r + 3) + n_chars) % 5 < 3`` — correlated across
    raters through ``n_chars`` (so agreement is above chance) but not
    identical (so kappa < 1). Narrow explode, zero shuffle."""
    raters = F.sequence(F.lit(0), F.lit(n_raters - 1))
    return docs.select(
        F.col("doc_id").alias("item_id"),
        F.explode(raters).alias("__r"),
        F.col("n_chars"),
    ).select(
        "item_id",
        F.concat(F.lit("rater"), F.col("__r").cast("string")).alias("rater"),
        F.when(
            (F.col("item_id") * (F.col("__r") + 3) + F.col("n_chars")) % 5 < 3,
            F.lit("keep"),
        )
        .otherwise(F.lit("drop"))
        .alias("label"),
    )


def rater_labels_fixture_sql(n_raters: int = 3) -> str:
    return f"""
    SELECT doc_id AS item, 'rater' || CAST(r AS VARCHAR) AS rater,
           CASE WHEN (doc_id * (r + 3) + n_chars) % 5 < 3
                THEN 'keep' ELSE 'drop' END AS label
    FROM documents, (SELECT unnest(range(0, {n_raters})) AS r)
    """
