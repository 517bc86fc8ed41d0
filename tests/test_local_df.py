"""Round-trip guarantees for sources.datasets.local_df (ADVICE r12).

local_df renders literal rows as a pure-JVM VALUES SELECT; it must produce
exactly the same cells and schema as spark.createDataFrame for every input
it accepts — including backslash-bearing strings (Spark SQL processes
C-style escapes in string literals by default) and DDL schemas with
parameterized or nested types (decimal(38,6), array<double>), which the
old schema.split(',') sheared apart.
"""

from pyspark.sql import types as T

from spark_ensemble_spark.sources.datasets import _split_top_level, local_df


def _assert_roundtrip(spark, rows, schema):
    got = local_df(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_backslash_and_quote_strings_roundtrip(spark):
    rows = [
        (1, r"c:\path\to\file"),
        (2, "trailing backslash \\"),
        (3, r"\t not a tab \n not a newline"),
        (4, "real\nnewline and 'quoted' text"),
        (5, "double '' quotes ''"),
        (6, r"mixed \' and '' and \\"),
        (7, ""),
        (8, None),
    ]
    _assert_roundtrip(spark, rows, "id int, s string")


def test_split_top_level_handles_nested_types():
    assert _split_top_level("a int, b string") == ["a int", " b string"]
    assert _split_top_level("a decimal(38,6), b array<double>") == [
        "a decimal(38,6)",
        " b array<double>",
    ]
    assert _split_top_level(
        "a map<string,int>, b struct<x:int,y:decimal(10,2)>, c string"
    ) == [
        "a map<string,int>",
        " b struct<x:int,y:decimal(10,2)>",
        " c string",
    ]


def test_parameterized_type_schema_roundtrip(spark):
    # decimal cells are rendered via str() only if int/float; decimal columns
    # appear in dynamic fast paths through dataType.simpleString() with int
    # cells (ids) — exercise that shape.
    rows = [(1, "a"), (2, "b")]
    got = local_df(spark, rows, "v decimal(38,6), s string")
    assert got.schema == T.StructType(
        [
            T.StructField("v", T.DecimalType(38, 6), True),
            T.StructField("s", T.StringType(), True),
        ]
    )
    vals = sorted((str(r.v), r.s) for r in got.collect())
    assert vals == [("1.000000", "a"), ("2.000000", "b")]


def test_array_type_schema_roundtrip(spark):
    # array<double> column in the DDL must survive the top-level split even
    # though array CELLS are not supported (scalar literals only) — pair it
    # with scalar columns and None cells for the array.
    rows = [(1, None), (2, None)]
    _assert_roundtrip(spark, rows, "id int, xs array<double>")
