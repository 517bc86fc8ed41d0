"""Driver-grade oracle verification for queries OUTSIDE the 50-entry window.

The driver's CORRECTNESS gate only sees the curated registry; everything else
registered via @query with an oracle (folded twins, post-registry additions
like the adapted TPC-H set) is verified HERE with the same compare: row count,
column names, and order-insensitive full-precision values. Adding a new
@query(name, oracle) automatically adds it to this gate — no test edit needed.
"""

import math

import duckdb
import pytest

from spark_ensemble_spark.queries import ALL_ORACLES, ALL_SPARK_QUERIES, ORACLES

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

EXTRA = sorted(set(ALL_ORACLES) - set(ORACLES))


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return "<null>" if v is None else str(v)


@pytest.mark.parametrize("name", EXTRA)
def test_extra_oracle(spark, sf_dir, con, name):
    sdf = ALL_SPARK_QUERIES[name](spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns
    rel = con.sql(ALL_ORACLES[name])
    duck_cols = [d[0] for d in rel.description]
    # HUGEINT outputs hash differently on the driver's Arrow path even when
    # values match (see tests/test_oracle_types.py); fail here too so the
    # extra set stays registry-promotable.
    hugeint = [
        (d[0], str(t))
        for d, t in zip(rel.description, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not hugeint, f"{name}: HUGEINT oracle column(s) {hugeint}"
    duck_rows = rel.fetchall()
    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows)
    s_sorted = sorted(spark_cols, key=str.lower)
    d_sorted = sorted(duck_cols, key=str.lower)
    s_vals = sorted(tuple(_norm(row[c]) for c in s_sorted) for row in spark_rows)
    d_vals = sorted(
        tuple(_norm(v) for v in (dict(zip(duck_cols, row))[c] for c in d_sorted))
        for row in duck_rows
    )
    diffs = [(a, b) for a, b in zip(s_vals, d_vals) if a != b][:3]
    assert s_vals == d_vals, f"{name}: first diffs {diffs}"


def test_extra_set_is_nonempty():
    # the adapted TPC-H queries must be present and folded (not displacing
    # driver-verified registry rows)
    for q in (
        "q7_nation_trade",
        "q10_returned_revenue",
        "q14_promo_revenue",
        "q19_banded_revenue",
        "q22_idle_customers",
    ):
        assert q in EXTRA, q
