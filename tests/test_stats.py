

def test_key_skew_profile_by_hand(spark):
    """8 rows: key 'a'x5, 'b'x2, NULLx1 with rows_per_task=2 →
    a: share 0.625, salt ceil(5/2)=3; skew factor = max(5)/avg(8/3)=1.875;
    NULL profiles as a real key (rank 3, salt 1)."""
    from spark_ensemble_spark.functions.stats import key_skew_profile

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 2 + [(None,)], "k string"
    )
    rows = {
        r.key_value: r
        for r in key_skew_profile(df, "k", top_n=5, rows_per_task=2).collect()
    }
    assert set(rows) == {"a", "b", None}
    a, b, n = rows["a"], rows["b"], rows[None]
    assert (a.cnt, a.key_rank, a.salt_factor) == (5, 1, 3)
    assert a.share == 0.625 and a.skew_factor == 1.875
    assert (b.cnt, b.key_rank, b.salt_factor) == (2, 2, 1)
    assert (n.cnt, n.key_rank, n.salt_factor) == (1, 3, 1)
    assert a.total_rows == 8 and a.distinct_keys == 3


def test_key_skew_profile_top_n_bound(spark):
    """top_n truncates deterministically: count desc, key asc."""
    from spark_ensemble_spark.functions.stats import key_skew_profile

    df = spark.createDataFrame([("x",), ("y",), ("z",)], "k string")
    got = [
        r.key_value
        for r in key_skew_profile(df, "k", top_n=2)
        .orderBy("key_rank")
        .collect()
    ]
    assert got == ["x", "y"]
