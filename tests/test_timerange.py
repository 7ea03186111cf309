from datetime import datetime, timedelta

import pytest

from hatchery_spark.timerange import generate_ticks, ticks_df


def test_ticks_inclusive_end():
    out = list(
        generate_ticks(
            datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 0, 10), timedelta(minutes=5)
        )
    )
    assert [t.minute for t in out] == [0, 5, 10]


def test_tick_zero_single_shot():
    out = list(
        generate_ticks(datetime(2024, 1, 1), datetime(2024, 1, 2), timedelta(0))
    )
    assert out == [datetime(2024, 1, 1)]


def test_end_not_aligned():
    out = list(
        generate_ticks(
            datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 0, 9), timedelta(minutes=4)
        )
    )
    assert [t.minute for t in out] == [0, 4, 8]


def test_invalid_ranges():
    with pytest.raises(ValueError):
        list(generate_ticks(datetime(2024, 1, 2), datetime(2024, 1, 1), timedelta(1)))
    with pytest.raises(ValueError):
        list(generate_ticks(datetime(2024, 1, 1), datetime(2024, 1, 2), timedelta(-1)))


def test_ticks_df_matches_generator(spark):
    rows = ticks_df(spark, "2024-01-01 00:00:00", "2024-01-02 00:00:00", "6 hours").collect()
    want = list(
        generate_ticks(datetime(2024, 1, 1), datetime(2024, 1, 2), timedelta(hours=6))
    )
    assert [r.tick for r in rows] == want
