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
