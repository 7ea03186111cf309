import importlib
import sys

import pytest

sys.path.insert(0, "/root/repo")

entry_mod = importlib.import_module("__spark_entry__")

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"route_id", "row_count"} <= set(df.columns)


def test_every_oracle_has_a_query():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25


def test_rows_only_queries_documented():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    rows_only = set(qs) - set(oracles)
    # rows-only set is intentional: seeded-hash / pandas-UDF internals
    assert rows_only == {
        "doc_minhash_neardup",
        "doc_simhash_candidates",
        "emb_lsh_topk",
        "emb_near_dup",
        "media_features",
        "pipeline_lineage_metrics",
        "pipeline_kv_explode",
        "doc_dedup_resolve",
        "emb_ivf_topk",
    }


@pytest.mark.parametrize(
    "name",
    ["pipeline_sink_counts", "rel_agg_pricing", "doc_token_count", "emb_cosine_topk"],
)
def test_representative_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    assert df.count() > 0
