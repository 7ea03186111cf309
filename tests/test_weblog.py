"""W3C extended log: directive-driven binding, encoding, UA taxonomy."""

from pyspark.sql import functions as F

from hatchery_spark.operators.weblog import parse_w3c_logs, render_w3c_logs

SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts string")


def _files(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA).withColumn(
        "ts", F.to_timestamp("ts"))
    return render_w3c_logs(df)


def test_directive_header_and_line_shape(spark):
    # uid 0 → file 0 → order A
    [r] = _files(spark, [("conv-0", 0, "user",
                          "[info] actor=u action=a_event resource=doc:/r5 ip=1.2.3.4",
                          "chat", "2025-06-01 12:34:56")]).collect()
    lines = r.content.splitlines()
    assert lines[0] == "#Version: 1.0"
    assert lines[1] == ("#Fields: date time c-ip cs-username cs-uri-stem "
                        "sc-status cs(User-Agent)")
    assert lines[2].startswith("2025-06-01 12:34:56 10.0.0.0 user0 doc:/r5 200 ")
    assert "%20" in lines[2] and " Chrome/" not in lines[2]   # UA encoded


def test_field_order_differs_by_file_but_parse_agrees(spark):
    rows = [
        ("conv-6", 0, "user", "[warn] actor=a action=b resource=doc:/r1 ip=x",
         "chat", "2025-06-01 00:00:00"),   # uid 6 → file 0 → order A
        ("conv-7", 0, "user", "[error] actor=a action=b resource=doc:/r2 ip=x",
         "chat", "2025-06-01 00:00:01"),   # uid 7 → file 1 → order B
    ]
    files = _files(spark, rows)
    headers = {r.file_id: r.content.splitlines()[1] for r in files.collect()}
    assert headers[0] != headers[1]                     # orders really differ
    out = {r.username: r for r in parse_w3c_logs(files.select("content")).collect()}
    assert out["user6"].uri_stem == "doc:/r1" and out["user6"].status == 200
    assert out["user7"].uri_stem == "doc:/r2" and out["user7"].status == 500
    assert out["user7"].c_ip == "10.0.7.7"


def test_elf_dash_null_and_ua_families(spark):
    rows = [("conv-1", 0, "user", "free form turn 37 with no audit payload",
             "chat", "2025-06-01 00:00:00"),            # no resource → '-'
            ("conv-2", 0, "user", "[info] resource=doc:/r9", "edr",
             "2025-06-01 00:00:01"),
            ("conv-3", 0, "user", "plain", "idp", "2025-06-01 00:00:02")]
    out = {r.username: r for r in
           parse_w3c_logs(_files(spark, rows).select("content")).collect()}
    assert out["user1"].uri_stem is None                 # '-' decoded to NULL
    assert out["user1"].ua_family == "firefox"           # uid 1 % 4
    assert out["user2"].ua_family == "curl"              # uid 2 % 4
    assert out["user3"].ua_family == "bot"               # uid 3 % 4
    assert out["user3"].user_agent == "AgentBot/2.1 (+https://example.com/bot)"


def test_whole_roundtrip_is_codegen(spark):
    files = _files(spark, [("conv-0", 0, "user", "x", "chat",
                            "2025-06-01 00:00:00")])
    plan = (
        parse_w3c_logs(files.select("content"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan
