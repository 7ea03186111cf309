"""Sigma-style rule compiler."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hatchery_spark.operators.sigma import (
    Rule,
    apply_rules,
    compile_rule,
    compile_rule_sql,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "alice", "login_event", "error", "10.0.200.5", 50),
            (2, "bob", "signup_event", "info", "10.0.3.9", 10),
            (3, None, None, None, None, 99),
            (4, "user1x", "signup_event", "warn", "10.0.129.1", 5),
        ],
        "id int, actor string, action string, severity string, "
        "ip string, turn_idx int",
    )


def test_modifiers(spark):
    df = _df(spark)

    def ids(rule):
        out = apply_rules(df, [rule], ["id"])
        return sorted(r["id"] for r in out.collect())

    assert ids(Rule("r", "", {"s": {"severity": ["error", "warn"]}}, "s")) == [1, 4]
    assert ids(Rule("r", "", {"s": {"action": {"startswith": "sign"}}}, "s")) == [2, 4]
    assert ids(Rule("r", "", {"s": {"action": {"endswith": "_event"}}}, "s")) == [1, 2, 4]
    assert ids(Rule("r", "", {"s": {"actor": {"contains": "li"}}}, "s")) == [1]
    assert ids(Rule("r", "", {"s": {"actor": {"re": "^[ab]"}}}, "s")) == [1, 2]
    assert ids(Rule("r", "", {"s": {"ip": {"cidr": "10.0.128.0/17"}}}, "s")) == [1, 4]
    assert ids(Rule("r", "", {"s": {"turn_idx": {"gt": 40}}}, "s")) == [1, 3]
    assert ids(Rule("r", "", {"s": {"actor": None}}, "s")) == [3]


def test_null_never_leaks_through_not(spark):
    # row 3 has NULL actor: `not filter` must still exclude nothing extra —
    # NULL coalesces to false, so `selection and not filter` keeps row 3
    # only if selection matched it
    rule = Rule(
        "r", "",
        {"selection": {"turn_idx": {"gt": 40}},
         "filter": {"actor": {"contains": "li"}}},
        "selection and not filter",
    )
    out = apply_rules(_df(spark), [rule], ["id"])
    assert sorted(r["id"] for r in out.collect()) == [3]


def test_condition_parser_errors():
    with pytest.raises(ValueError, match="unknown selection"):
        compile_rule_sql(Rule("r", "", {"s": {"id": 1}}, "nope"))
    with pytest.raises(ValueError, match="trailing"):
        compile_rule_sql(Rule("r", "", {"s": {"id": 1}}, "s s"))
    with pytest.raises(ValueError, match="unknown sigma modifier"):
        compile_rule_sql(Rule("r", "", {"s": {"id": {"weird": 1}}}, "s"))


def test_sql_render_is_session_free():
    sql = compile_rule_sql(
        Rule("r", "", {"s": {"actor": {"contains": "a%b_c"}}}, "s")
    )
    # LIKE special chars escaped
    assert "%a\\%b\\_c%" in sql and "ESCAPE" in sql


def test_pack_single_pass_plan(spark):
    rules = [
        Rule("r1", "", {"s": {"severity": "error"}}, "s"),
        Rule("r2", "", {"s": {"severity": "warn"}}, "s"),
        Rule("r3", "", {"s": {"turn_idx": {"lt": 20}}}, "s"),
    ]
    out = apply_rules(_df(spark), rules, ["id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one scan, no join/exchange: rule evaluation is a projection + explode
    assert plan.count("Scan") == 1
    assert "Exchange" not in plan and "Join" not in plan


def test_spark_and_sql_agree(spark):
    # same predicate both renders: Spark filter vs SQL text via spark.sql
    df = _df(spark)
    df.createOrReplaceTempView("sigma_t")
    rule = Rule(
        "r", "",
        {"a": {"severity": "error"}, "b": {"severity": "warn"},
         "c": {"actor": {"contains": "user1"}}},
        "(a or b) and not c",
    )
    col, _ = compile_rule(rule)
    got_col = sorted(r["id"] for r in df.where(col).collect())
    assert got_col == [1]
