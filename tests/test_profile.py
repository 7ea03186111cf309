from hatchery_spark.functions.profile import profile_columns


def test_profile_columns_exact(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "b", 2.5), (None, None, 2.5)],
        "id long, name string, score double",
    )
    out = {r.col_name: r.asDict() for r in profile_columns(df).collect()}
    assert set(out) == {"id", "name", "score"}
    assert all(v["n_rows"] == 4 for v in out.values())
    assert out["id"]["n_nulls"] == 1 and out["id"]["n_distinct"] == 3
    # min/max are cast AFTER aggregation: numeric ordering, not lexicographic
    assert out["id"]["min_value"] == "1" and out["id"]["max_value"] == "3"
    assert out["score"]["min_value"] == "2.5" and out["score"]["max_value"] == "10.0"
    assert out["name"]["n_distinct"] == 2


def test_profile_columns_approx_close(spark):
    """HLL path: same schema, NDV close to exact (HLL++ rsd ~2%)."""
    df = spark.range(5000).selectExpr("id", "cast(id % 7 as string) AS bucket")
    out = {r.col_name: r.asDict()
           for r in profile_columns(df, exact_ndv=False).collect()}
    assert out["bucket"]["n_distinct"] == 7  # tiny NDV: HLL sparse mode is exact
    assert abs(out["id"]["n_distinct"] - 5000) <= 500  # 10% guard at rsd=0.02
    assert out["id"]["n_nulls"] == 0 and out["id"]["n_rows"] == 5000
