"""Property-based tests (hypothesis): the parse stage must be total and agree
with an independent Python re implementation on arbitrary text, and routing
must be a partition-stable multiset regardless of shuffle partitioning."""

import re

import pandas as pd
from hypothesis import given, settings, strategies as st

from hatchery_spark.parse import AUDIT_PATTERN_NAMED, parse_turns

_RE = re.compile(AUDIT_PATTERN_NAMED)

# arbitrary printable text, plus adversarial near-matches
text_strategy = st.one_of(
    st.text(min_size=0, max_size=200),
    st.from_regex(r"\[(debug|info|warn|error|critical)\] actor=\S{1,10} action=\S{1,10} resource=\S{1,10}", fullmatch=True),
    st.from_regex(r"\[[a-z]{1,8}\] actor=.{0,5}", fullmatch=False),
)


@settings(max_examples=30, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=30))
def test_parse_total_and_matches_python_re(spark_prop, texts):
    spark = spark_prop
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    out = {r.i: r for r in parse_turns(df).collect()}
    for i, t in enumerate(texts):
        m = _RE.search(t)
        row = out[i]
        if m:
            assert row.severity == m.group("severity"), t
            assert row.actor == m.group("actor")
            assert row.action == m.group("action")
            assert row.resource == m.group("resource")
        else:
            assert row.severity is None and row.actor is None, t


# module-scoped spark alias for hypothesis (function-scoped fixture would
# re-enter the session fixture per example)
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_prop(spark):
    return spark
