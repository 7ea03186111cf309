import pytest
from pyspark.sql import functions as F

from hatchery_spark.datagen import transcripts_df
from hatchery_spark.parse import parse_turns

CRAFTED = [
    # (text, severity, actor, action, resource)
    (
        "[error] actor=user42@example.com action=user_login resource=vault:/r7 ip=10.0.1.2 x",
        "error",
        "user42@example.com",
        "user_login",
        "vault:/r7",
    ),
    ("[info] actor=a action=b resource=c", "info", "a", "b", "c"),
    ("plain prose with no audit line", None, None, None, None),
    ("", None, None, None, None),
    ("[fatal] actor=a action=b resource=c", None, None, None, None),  # bad severity
    ("prefix [warn] actor=x action=y resource=z suffix", "warn", "x", "y", "z"),
]


@pytest.mark.parametrize("engine", ["native", "pandas"])
def test_crafted_strings(spark, engine):
    df = spark.createDataFrame(
        [(t[0],) for t in CRAFTED], "text string"
    ).withColumn("i", F.monotonically_increasing_id())
    out = parse_turns(df, engine=engine).orderBy("i").collect()
    for row, (txt, sev, actor, action, resource) in zip(out, CRAFTED):
        assert row.severity == sev, txt
        assert row.actor == actor
        assert row.action == action
        assert row.resource == resource


def test_engines_agree_on_synthetic(spark):
    df = transcripts_df(spark, 3000).cache()
    a = parse_turns(df, engine="native").orderBy("conv_id", "turn_idx").collect()
    b = parse_turns(df, engine="pandas").orderBy("conv_id", "turn_idx").collect()
    assert a == b
    df.unpersist()


def test_text_untouched(spark):
    df = transcripts_df(spark, 1000)
    out = parse_turns(df)
    # text column is byte-identical (O20 invariant): exceptAll both ways is empty
    assert out.select("conv_id", "turn_idx", "text").exceptAll(
        df.select("conv_id", "turn_idx", "text")
    ).count() == 0


def test_unknown_engine():
    with pytest.raises(ValueError):
        parse_turns(None, engine="rowwise")
