"""logfmt: conditional quoting, escape roundtrip, tolerant map reader."""

from pyspark.sql import functions as F

from hatchery_spark.operators.logfmt import (
    kv,
    parse_logfmt,
    render_logfmt,
)


def test_conditional_quoting_and_roundtrip(spark):
    vals = [
        "bare",
        "has space",
        'has"quote',
        "back\\slash",
        "eq=sign",
        'all " of \\ them =',
        "",
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v string")
    lines = render_logfmt(df, [("i", F.col("i")), ("v", F.col("v"))])
    got = {
        int(r.i): r.back
        for r in parse_logfmt(lines.select("line"))
        .select(kv("i").alias("i"), kv("v").alias("back"))
        .collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == v, (v, got[i])
    rendered = {r.i: r.line for r in lines.collect()}
    assert rendered[0] == "i=0 v=bare"  # bare value stays unquoted
    assert rendered[1] == 'i=1 v="has space"'
    assert rendered[3] == 'i=3 v="back\\\\slash"'


def test_unknown_key_is_null_and_order_insensitive(spark):
    df = spark.createDataFrame(
        [('b="x y" a=1 extra=zz',), ("a=2 b=q",)], "line string"
    )
    got = (
        parse_logfmt(df)
        .select(kv("a").alias("a"), kv("b").alias("b"), kv("nope").alias("n"))
        .orderBy("a")
        .collect()
    )
    assert [(r.a, r.b, r.n) for r in got] == [("1", "x y", None), ("2", "q", None)]


def test_no_exchange(spark):
    df = spark.createDataFrame([("k=v",)], "line string")
    out = parse_logfmt(df).select(kv("k").alias("k"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
