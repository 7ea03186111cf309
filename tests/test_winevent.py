"""Windows Event XML render + native from_xml parse."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from hatchery_spark.operators.winevent import (
    MARKER,
    parse_winevent,
    render_winevent,
)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp",
    )


def test_roundtrip_with_hostile_text(spark):
    hostile = 'a & b < c > d "quoted" && <Data Name="x">fake</Data>'
    rows = [
        ("conv-7", 0, "user", "[error] plain audit line", "slack",
         datetime(2024, 2, 3, 4, 5, 6, 789000)),
        ("conv-7", 1, "tool", hostile, "s3",
         datetime(2024, 2, 3, 4, 5, 7)),
    ]
    out = parse_winevent(render_winevent(_turns(spark, rows))) \
        .orderBy("turn_idx").collect()
    assert out[0].message == "[error] plain audit line"
    assert out[0].event_id == 4625 and out[0].provider == "slack"
    assert out[0].system_time == "2024-02-03T04:05:06.789"
    # embedded XML-looking text must come back verbatim, not re-parsed
    assert out[1].message == hostile
    assert out[1].event_id == 1000  # no severity prefix
    assert all(r.marker == MARKER for r in out)
    assert all(r.conv_id == "conv-7" and r.user_name == "user7"
               for r in out)


def test_severity_to_event_id_matrix(spark):
    rows = [
        (f"conv-1", i, "user", f"[{sev}] x", "t",
         datetime(2024, 1, 1, 0, 0, i))
        for i, sev in enumerate(["debug", "info", "warn", "error",
                                 "critical"])
    ]
    out = parse_winevent(render_winevent(_turns(spark, rows))) \
        .orderBy("turn_idx").collect()
    assert [r.event_id for r in out] == [100, 200, 300, 4625, 4719]


def test_data_binding_is_by_name_not_position(spark):
    # hand-build an event whose Data children arrive in reversed order;
    # the parser must still bind each field by its Name attribute
    xml = ('<Event><System><Provider Name="p"/><EventID>200</EventID>'
           '<TimeCreated SystemTime="2024-01-01T00:00:00.000"/>'
           '<Computer>host-1</Computer></System><EventData>'
           '<Data Name="Marker">m</Data>'
           '<Data Name="Message">msg</Data>'
           '<Data Name="Turn">5</Data>'
           '<Data Name="Conv">conv-9</Data>'
           '<Data Name="SubjectUserName">user9</Data>'
           '</EventData></Event>')
    df = spark.createDataFrame([(xml,)], "xml string")
    r = parse_winevent(df).collect()[0]
    assert (r.conv_id, r.turn_idx, r.message, r.marker, r.user_name) == \
        ("conv-9", 5, "msg", "m", "user9")


def test_no_python_udf_in_plan(spark):
    rows = [("conv-2", 0, "user", "x", "t", datetime(2024, 1, 1))]
    plan = parse_winevent(render_winevent(_turns(spark, rows))) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
