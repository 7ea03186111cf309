from pyspark.sql import functions as F

from hatchery_spark.datagen import service_catalog_df, transcripts_df
from hatchery_spark.enrich import enrich_turns
from hatchery_spark.parse import parse_turns


def test_hit_and_miss_semantics(spark):
    cat = service_catalog_df(spark)
    rows = [
        # tool/role in catalog, parsed severity present
        ("c1", 0, "user", "[error] actor=a action=b resource=c", "slack", "2025-01-01 00:00:00"),
        # tool in catalog, prose text → severity falls back to catalog default
        ("c1", 1, "system", "no audit here", "okta", "2025-01-01 00:00:01"),
        # tool NOT in catalog, prose → everything unknown
        ("c1", 2, "user", "no audit here", "shadowtool", "2025-01-01 00:00:02"),
        # null tool
        ("c1", 3, "user", "no audit here", None, "2025-01-01 00:00:03"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.turn_idx: r for r in enrich_turns(parse_turns(df), cat).collect()}

    assert out[0].severity == "error" and out[0].service == "slack" and out[0].category == "chat"
    assert out[1].severity == "warn" and out[1].service == "okta"  # system default = warn
    assert out[2].severity == "unknown" and out[2].service == "unknown"
    assert out[3].severity == "unknown" and out[3].category == "unknown"


def test_small_catalog_compiles_to_plan_literal(spark):
    # a normal-size catalog is compiled into the plan: no join operator,
    # no broadcast exchange — the lookup rides the fact side's codegen
    cat = service_catalog_df(spark)
    df = transcripts_df(spark, 100)
    plan = enrich_turns(parse_turns(df), cat)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "Join" not in plan
    assert "map_from" in plan or "keys:" in plan or "Project" in plan


def test_oversized_catalog_falls_back_to_broadcast_join(spark):
    from hatchery_spark import enrich as enrich_mod

    cat = service_catalog_df(spark)
    df = transcripts_df(spark, 100)
    old = enrich_mod.MAP_COMPILE_LIMIT
    enrich_mod.MAP_COMPILE_LIMIT = 0
    try:
        plan = enrich_turns(parse_turns(df), cat)._jdf.queryExecution().executedPlan().toString()
    finally:
        enrich_mod.MAP_COMPILE_LIMIT = old
    assert "BroadcastHashJoin" in plan


def test_compiled_and_join_paths_agree(spark):
    from hatchery_spark import enrich as enrich_mod

    cat = service_catalog_df(spark)
    parsed = parse_turns(transcripts_df(spark, 500))
    compiled = enrich_turns(parsed, cat)
    old = enrich_mod.MAP_COMPILE_LIMIT
    enrich_mod.MAP_COMPILE_LIMIT = 0
    try:
        joined = enrich_turns(parsed, cat)
    finally:
        enrich_mod.MAP_COMPILE_LIMIT = old
    assert compiled.columns == joined.columns
    key = lambda r: tuple(("", v) if v is None else ("v", str(v)) for v in r)  # noqa: E731
    a = sorted(map(tuple, compiled.collect()), key=key)
    b = sorted(map(tuple, joined.collect()), key=key)
    assert a == b


def test_no_row_loss_or_dup(spark):
    df = transcripts_df(spark, 2000)
    out = enrich_turns(parse_turns(df), service_catalog_df(spark))
    assert out.count() == 2000
    assert out.groupBy("conv_id", "turn_idx").count().filter("count > 1").count() == 0
