"""Iceberg writer-protocol coverage beyond the gating tests in
tests/test_sinks_parse_ext.py.

No Iceberg runtime jar ships in this sandbox, so the real write path cannot
run; these tests cover (a) a configured catalog WITHOUT the runtime classes
must not flip the availability gate, and (b) the mode → createOrReplace/append
protocol selection, via a recorded writer standing in for DataFrameWriterV2.
"""

import pytest
from pyspark.sql import functions as F

import hatchery_spark.sinks as sinks
from hatchery_spark.sinks import write_table


@pytest.fixture()
def tiny(spark):
    return spark.range(3).withColumn("ts", F.to_timestamp(F.lit("2025-06-01 00:00:00")))


def test_catalog_conf_without_classes_is_still_unavailable(spark):
    # a catalog conf alone must not flip the gate — the runtime classes are
    # absent here, and writeTo would fail with an opaque JVM error otherwise
    spark.conf.set(
        "spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog"
    )
    try:
        assert not sinks.iceberg_available(spark)
    finally:
        spark.conf.unset("spark.sql.catalog.ice")


class _RecordingWriter:
    def __init__(self, calls):
        self.calls = calls

    def using(self, fmt):
        self.calls.append(("using", fmt))
        return self

    def createOrReplace(self):
        self.calls.append(("createOrReplace",))

    def append(self):
        self.calls.append(("append",))


def test_write_protocol_selection(spark, tiny, monkeypatch):
    calls = []
    monkeypatch.setattr(sinks, "iceberg_available", lambda s: True)
    monkeypatch.setattr(
        type(tiny), "writeTo", lambda self, target: _RecordingWriter(calls), raising=True
    )
    write_table(tiny, "cat.db.t", table_format="iceberg", mode="overwrite")
    write_table(tiny, "cat.db.t", table_format="iceberg", mode="append")
    assert calls == [
        ("using", "iceberg"),
        ("createOrReplace",),
        ("using", "iceberg"),
        ("append",),
    ]


def test_master_preconfigured_env(monkeypatch):
    from hatchery_spark.session import master_preconfigured

    monkeypatch.setenv("MASTER", "spark://cluster:7077")
    assert master_preconfigured()
