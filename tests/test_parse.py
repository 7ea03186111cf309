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


def test_tolerant_json_parse_statuses(spark):
    """Malformed/missing payloads never abort the task; each row carries a
    countable status and parsed fields are NULL exactly when not ok."""
    from hatchery_spark.parse import tolerant_json_parse

    df = spark.createDataFrame(
        [
            (0, '{"k": 7, "s": "x"}'),
            (1, '{"k": 7'),          # truncated → malformed
            (2, None),               # missing
            (3, '{"s": "only"}'),    # valid, k absent → ok with NULL k
        ],
        "event_id long, payload string",
    )
    out = {
        r.event_id: r.asDict()
        for r in tolerant_json_parse(df, "payload", "k bigint, s string").collect()
    }
    assert out[0]["json_status"] == "ok" and out[0]["k"] == 7 and out[0]["s"] == "x"
    assert out[1]["json_status"] == "malformed" and out[1]["k"] is None
    assert out[2]["json_status"] == "missing"
    assert out[3]["json_status"] == "ok" and out[3]["k"] is None and out[3]["s"] == "only"


def test_tolerant_json_parse_parameterized_types(spark):
    """Field-name recovery goes through the DDL parser, so parameterized
    types like decimal(10,2) work."""
    from hatchery_spark.parse import tolerant_json_parse

    df = spark.createDataFrame([(0, '{"a": 1, "amount": 12.34}')], "i long, payload string")
    out = tolerant_json_parse(df, "payload", "a bigint, amount decimal(10,2)").collect()[0]
    assert out.json_status == "ok" and out.a == 1 and str(out.amount) == "12.34"
