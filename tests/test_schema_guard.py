"""Guard against testdata re-encodes drifting under the loaders.

Round 3 lost its entire bench and 7 CORRECTNESS rows because the driver
regenerated events.parquet with ts as timestamp[us] while the loader still
assumed nanos-int64 (VERDICT r3 "What's wrong" #1-2). These tests read every
table at sf0.001 through the SAME loader the queries use and assert the
post-load schema the query registry assumes — so the next upstream re-encode
fails HERE in two seconds instead of erroring (or worse, silently corrupting)
a whole driver round.
"""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from spark_ensemble_spark.sources.datasets import TABLES, load_table

# Column -> type-predicate contract per table. Only the columns/properties the
# registry queries actually rely on are pinned; harmless width changes (int32
# vs int64 keys) stay non-breaking.
NUMERIC = (T.IntegerType, T.LongType, T.DoubleType, T.FloatType, T.DecimalType)
TEMPORAL = (T.DateType, T.TimestampType, T.TimestampNTZType)

EXPECTED = {
    "region": {"r_regionkey": NUMERIC, "r_name": T.StringType},
    "nation": {"n_nationkey": NUMERIC, "n_name": T.StringType, "n_regionkey": NUMERIC},
    "customer": {
        "c_custkey": NUMERIC,
        "c_nationkey": NUMERIC,
        "c_acctbal": T.DoubleType,
        "c_mktsegment": T.StringType,
    },
    "supplier": {"s_suppkey": NUMERIC, "s_nationkey": NUMERIC, "s_acctbal": T.DoubleType},
    "part": {
        "p_partkey": NUMERIC,
        "p_brand": T.StringType,
        "p_type": T.StringType,
        "p_size": NUMERIC,
        "p_retailprice": T.DoubleType,
    },
    "orders": {
        "o_orderkey": NUMERIC,
        "o_custkey": NUMERIC,
        "o_orderstatus": T.StringType,
        "o_totalprice": T.DoubleType,
        "o_orderdate": TEMPORAL,
        "o_orderpriority": T.StringType,
    },
    "lineitem": {
        "l_orderkey": NUMERIC,
        "l_partkey": NUMERIC,
        "l_suppkey": NUMERIC,
        "l_quantity": T.DoubleType,
        "l_extendedprice": T.DoubleType,
        "l_discount": T.DoubleType,
        "l_tax": T.DoubleType,
        "l_returnflag": T.StringType,
        "l_linestatus": T.StringType,
        "l_shipdate": TEMPORAL,
    },
    # events.ts MUST come out of the loader as session-tz TIMESTAMP exactly —
    # not NTZ (unix_micros rejects it), not long. This is the r3 failure.
    "events": {
        "event_id": NUMERIC,
        "ts": T.TimestampType,
        "user_id": NUMERIC,
        "event_type": T.StringType,
        "value": T.DoubleType,
        "props": T.StringType,
    },
    "documents": {
        "doc_id": NUMERIC,
        "text": T.StringType,
        "lang": T.StringType,
        "source": T.StringType,
    },
    "embeddings": {"vec_id": NUMERIC, "embedding": T.ArrayType, "label": NUMERIC},
}


@pytest.mark.parametrize("table", TABLES)
def test_loader_schema_contract(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    fields = {f.name: f.dataType for f in df.schema.fields}
    contract = EXPECTED[table]
    missing = set(contract) - set(fields)
    assert not missing, f"{table}: loader lost columns {sorted(missing)}"
    for col, want in contract.items():
        assert isinstance(fields[col], want), (
            f"{table}.{col}: loader returned {fields[col]}, queries assume {want}"
        )


def test_events_ts_range_is_plausible(spark, sf_dir):
    """The r3 streaming bug compressed 30 days of timestamps into ~43 minutes
    WITHOUT a type error. Assert the loaded span is at least a day so a silent
    unit mix-up (nanos-as-micros or the reverse) trips immediately."""
    df = load_table(spark, sf_dir, "events")
    lo, hi = df.agg(F.min("ts"), F.max("ts")).first()
    span_days = (hi - lo).total_seconds() / 86400
    assert span_days > 1, f"events ts span is {span_days:.4f} days — unit bug?"
    assert lo.year >= 2000 and hi.year <= 2100, (lo, hi)


def test_stream_ts_matches_batch(spark, sf_dir):
    """Symmetry guard (VERDICT r3 fix #2): the streamed events frame must see
    the EXACT same min/max ts as the batch loader, whatever the on-disk
    encoding is. Run through a real memory-sink replay."""
    import tempfile

    from spark_ensemble_spark.streaming.events import read_events_stream

    batch = load_table(spark, sf_dir, "events")
    b_lo, b_hi, b_n = batch.agg(F.min("ts"), F.max("ts"), F.count(F.lit(1))).first()

    agg = read_events_stream(spark, sf_dir).groupBy().agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count(F.lit(1)).alias("n")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_schema_guard_stream")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ses-guard-"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    s_lo, s_hi, s_n = spark.table("t_schema_guard_stream").first()
    assert (s_lo, s_hi, s_n) == (b_lo, b_hi, b_n)


def test_registered_query_names_are_identifiers():
    """A rotation edit once deleted a @query NAME line, silently turning
    the SQL into the registration key — the query dropped out of every
    oracle gate while its function kept passing bench by def-name
    (r9c found orders_monthly_stats, strip_boilerplate,
    contamination_overlap dark since the r9 rotation). Names must look
    like identifiers, and every @query-wrapped function's def name must
    be registered."""
    import re

    from spark_ensemble_spark import queries as q

    ident = re.compile(r"^[a-z][a-z0-9_]*$")
    for name in q.ALL_SPARK_QUERIES:
        assert ident.match(name), f"suspicious registry key: {name[:60]!r}"
    # every def that went through @query must be registered under SOME
    # identifier key with the same code object
    registered = {fn.__code__ for fn in q.ALL_SPARK_QUERIES.values()}
    for attr in dir(q):
        fn = getattr(q, attr)
        if callable(fn) and getattr(fn, "__module__", "") == q.__name__:
            src_ok = True
            try:
                import inspect

                src_ok = "@query(" in inspect.getsource(fn)
            except (OSError, TypeError):
                src_ok = False
            if src_ok and hasattr(fn, "__code__"):
                assert fn.__code__ in registered, f"{attr} not registered"
