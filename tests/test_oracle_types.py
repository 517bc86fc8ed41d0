"""Type-representation audit for every registered DuckDB oracle.

The driver's hash compare serializes oracle results through Arrow/pandas;
DuckDB promotes integer ``sum()`` (plain and windowed) to HUGEINT (INT128),
which converts to float64 on that path and renders ``123.0`` where Spark
emits ``123`` — a hash mismatch with identical values (round-4 verdict: all
five red registry rows shared exactly this cause). Values compared as Python
objects stringify identically, so the row-value gates cannot catch it; this
audit checks the *logical output types* instead. Any integer aggregate in an
oracle must be wrapped in ``CAST(... AS BIGINT)``.
"""

import duckdb
import pytest

from spark_ensemble_spark.queries import ALL_ORACLES

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Smallest SF is plenty: only the output *types* matter here.
TYPE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{TYPE_SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_oracle_has_no_hugeint_output(con, name):
    rel = con.sql(ALL_ORACLES[name])
    flagged = [
        (col[0], str(typ))
        for col, typ in zip(rel.description, rel.types)
        if "HUGEINT" in str(typ).upper()
    ]
    assert not flagged, (
        f"{name}: HUGEINT output column(s) {flagged} — wrap the integer "
        f"aggregate in CAST(... AS BIGINT) or the driver's Arrow hash path "
        f"will render these as float64 and red-flag the row"
    )


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_oracle_has_no_decimal_output(con, name):
    """DECIMAL is the r7-r11 sibling of the HUGEINT class: the driver's two
    fetch paths canonicalize DECIMAL differently (float64 repr vs
    scale-preserving string), so any value with a trailing zero
    (0.015625000 vs 0.015625) hash-reds the row with both engines'
    arithmetic identical — VERDICT r11 proved predicted red set == actual
    red set 50/50 at sf0.01.  Emit exact BIGINT micro-units instead."""
    rel = con.sql(ALL_ORACLES[name])
    flagged = [
        (col[0], str(typ))
        for col, typ in zip(rel.description, rel.types)
        if "DECIMAL" in str(typ).upper()
    ]
    assert not flagged, (
        f"{name}: DECIMAL output column(s) {flagged} — emit exact BIGINT "
        f"micro-units (the __score_i idiom) instead; the driver's hash "
        f"path renders DECIMAL differently per fetch path"
    )


def test_decimal_output_gate_catches_seeded_violation(con):
    """The gate itself reds on a seeded DECIMAL output and stays green on
    the safe types (BIGINT / DOUBLE / VARCHAR / BOOLEAN)."""
    bad = con.sql("SELECT CAST(1 AS DECIMAL(10,2)) AS x")
    assert any("DECIMAL" in str(t).upper() for t in bad.types)
    ok = con.sql(
        "SELECT CAST(1 AS BIGINT) AS a, CAST(1.5 AS DOUBLE) AS b,"
        " 'x' AS c, TRUE AS d"
    )
    assert not any(
        "DECIMAL" in str(t).upper() or "HUGEINT" in str(t).upper()
        for t in ok.types
    )
