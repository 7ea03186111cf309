"""Certified distributed top-k (operators/topk.py).

The property that matters: ``rank_certified=true`` rows ALWAYS match the
brute-force global top-k — including under an adversarial stripe layout
built to fool the candidate phase — and the flag correctly refuses to
certify when the tail is genuinely open.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hatchery_spark.operators.topk import topk_certified


def _rows(pairs):
    # pairs: (key, stripe, copies)
    out = []
    for key, stripe, n in pairs:
        out.extend((key, stripe) for _ in range(n))
    return out


def _build(spark, pairs):
    return spark.createDataFrame(
        _rows(pairs), schema="key string, stripe long"
    )


def _brute_topk(spark, pairs, k):
    df = _build(spark, pairs).groupBy("key").count()
    return [
        (r["key"], r["count"])
        for r in df.orderBy(F.desc("count"), "key").limit(k).collect()
    ]


def test_hot_cold_certified_rows_match_bruteforce(spark):
    # 3 hot keys spread across 4 stripes, a tail of 12 cold keys
    pairs = [(f"hot-{i}", s, 40 + i) for i in range(3) for s in range(4)]
    pairs += [(f"cold-{j:02d}", j % 4, 2 + j % 3) for j in range(12)]
    out = topk_certified(_build(spark, pairs), ["key"], "stripe", k=5)
    got = {r["key"]: r for r in out.collect()}
    assert len(got) == 5
    truth = _brute_topk(spark, pairs, 5)
    for rank, (key, cnt) in enumerate(truth, start=1):
        if got.get(key) and got[key]["rank_certified"]:
            assert got[key]["rank"] == rank
            assert got[key]["total"] == cnt
    # the hot keys must certify: totals (160..168) dwarf the tail bound
    for i in range(3):
        assert got[f"hot-{i}"]["rank_certified"] is True


def test_adversarial_spread_key_is_never_wrongly_certified(spark):
    # stealth: 2nd-biggest globally but rank 3 in EVERY stripe at k=2 —
    # it never becomes a candidate, so the reported tail is wrong, and
    # the certificate must refuse exactly those rows.
    pairs = [("alpha", s, 20) for s in range(4)]          # 80 total
    pairs += [(f"loud-{s}", s, 10) for s in range(4)]     # 10 each, local #2
    pairs += [("stealth", s, 9) for s in range(4)]        # 36 total, local #3
    out = topk_certified(_build(spark, pairs), ["key"], "stripe", k=2)
    got = {r["key"]: r for r in out.collect()}
    assert "stealth" not in got  # never surfaced locally
    assert got["alpha"]["rank_certified"] is True
    assert got["alpha"]["rank"] == 1 and got["alpha"]["total"] == 80
    # the reported #2 is a loud-* with total 10 < true #2 (stealth, 36):
    # ub_absent = sum of stripe 2nd-place counts = 40 — the flag refuses
    tail = [r for r in got.values() if r["rank"] == 2]
    assert tail and tail[0]["total"] == 10
    assert tail[0]["ub_absent"] == 40
    assert tail[0]["rank_certified"] is False
    # safety invariant: every certified row agrees with brute force
    truth = dict(
        (k, (i + 1, c))
        for i, (k, c) in enumerate(_brute_topk(spark, pairs, 10))
    )
    for r in got.values():
        if r["rank_certified"]:
            assert truth[r["key"]] == (r["rank"], r["total"])


def test_small_stripes_tau_zero_certifies_everything(spark):
    # fewer distinct keys than k in every stripe: tau=0, ub_absent=0,
    # every candidate total > 0 is provably exact
    pairs = [("a", 0, 5), ("b", 0, 3), ("a", 1, 2), ("c", 1, 4)]
    out = topk_certified(_build(spark, pairs), ["key"], "stripe", k=5)
    rows = {r["key"]: r for r in out.collect()}
    assert set(rows) == {"a", "b", "c"}
    assert all(r["ub_absent"] == 0 and r["rank_certified"] for r in rows.values())
    assert (rows["a"]["total"], rows["a"]["rank"]) == (7, 1)
    assert (rows["c"]["total"], rows["c"]["rank"]) == (4, 2)
    assert (rows["b"]["total"], rows["b"]["rank"]) == (3, 3)


def test_tie_at_bound_is_not_certified(spark):
    # a key whose total EQUALS ub_absent could be tied by an unseen key:
    # strict > must refuse
    # stripe 0: A 7, B 3 (tau=3); stripe 1: A 5, B 4, C 4 (tau=4, B wins
    # the tie by key order) -> ub_absent = 7 and B's total is EXACTLY 7
    pairs = [("A", 0, 7), ("B", 0, 3), ("A", 1, 5), ("B", 1, 4), ("C", 1, 4)]
    out = topk_certified(_build(spark, pairs), ["key"], "stripe", k=2)
    got = {r["key"]: r for r in out.collect()}
    assert got["B"]["total"] == 7 and got["B"]["ub_absent"] == 7
    assert got["B"]["rank_certified"] is False
    assert got["A"]["total"] == 12 and got["A"]["rank_certified"] is True
