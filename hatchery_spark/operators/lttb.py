"""Largest-Triangle-Three-Buckets time-series downsampling.

LTTB (Steinarsson, "Downsampling Time Series for Visual Representation",
U. Iceland 2013) is the de-facto standard for shrinking an observability
series to m points while keeping its visual shape: the first and last
points survive, the interior is split into m-2 even buckets, and each
bucket keeps the point forming the LARGEST TRIANGLE with the previously
kept point and the average of the next bucket. Grafana, InfluxDB, and
Timescale all ship it; a 10^12-turn pipeline needs it the moment anyone
plots per-stream rates.

Determinism contract (what makes the sequential pick oracle-replayable):

* inputs are BIGINT: ``t_s`` (epoch seconds) and a pre-scaled integer
  value ``v_i`` — callers scale floats BEFORE the operator so both
  engines see identical integers;
* the next-bucket centroid is a rational (s_t/k, s_v/k); the area
  comparison multiplies through by k, so the compared quantity
  ``|(t_a*k - s_t)*(v_b - v_a) - (t_a - t_b)*(s_v - v_a*k)|`` is a pure
  BIGINT — no float ties for engines to break differently;
* equal areas break to the SMALLEST index (scan order), mirrored in SQL
  as ``ORDER BY area DESC, idx ASC``.

Bucketing: point index idx (1-based, per series, caller-ordered); idx 1
and idx n are kept; interior idx maps to bucket ``1 + ((idx-2)*(m-2)) //
(n-2)``. Series with n <= m pass through whole — downsampling something
already small would only distort it.

Plan shape: ONE series-key exchange (applyInPandas grouping); the per-
series pick is inherently sequential (bucket i's anchor is bucket i-1's
winner) but series are independent, so the job fans out across
executors exactly like the Gorilla encoder (functions/gorilla.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def lttb_downsample(
    df: DataFrame,
    g_col: str,
    idx_col: str = "idx",
    t_col: str = "t_s",
    v_col: str = "v_i",
    m: int = 12,
) -> DataFrame:
    """Downsample each series in ``df`` to at most ``m`` points.

    ``df`` columns: ``g_col`` (series key), ``idx_col`` (1-based dense
    per-series position — compute it upstream with the SAME window
    ordering the oracle uses, e.g. row_number over (ts, turn_idx)),
    ``t_col``/``v_col`` BIGINT.

    Returns ``g, idx, t_s, v_i`` — ``idx`` is the point's original
    position, so callers can verify which points survived.
    """
    if m < 3:
        raise ValueError(f"m must be >= 3 (first + last + >=1 bucket), got {m}")

    schema = "g string, idx long, t_s long, v_i long"

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("idx", kind="mergesort")
        t = pdf["t_s"].to_numpy(np.int64)
        v = pdf["v_i"].to_numpy(np.int64)
        g = pdf["g"].iloc[0]
        n = len(t)
        idx = pdf["idx"].to_numpy(np.int64)
        if n and (idx[0] != 1 or idx[-1] != n):
            raise ValueError(
                f"series {g!r}: idx must be dense 1..n (got "
                f"{idx[0]}..{idx[-1]} over {n} rows)"
            )
        if n <= m:
            return pd.DataFrame(
                {"g": g, "idx": idx, "t_s": t, "v_i": v}
            )
        b = m - 2
        # interior bucket id per point (1..b); endpoints excluded
        inner = idx[1:-1]
        bucket = 1 + ((inner - 2) * b) // (n - 2)
        keep = [0]  # positions (0-based) kept; start with the first point
        a = 0
        for i in range(1, b + 1):
            cand = np.nonzero(bucket == i)[0] + 1  # positions in t/v
            if i < b:
                nxt = np.nonzero(bucket == i + 1)[0] + 1
            else:
                nxt = np.array([n - 1])
            k = np.int64(len(nxt))
            s_t = t[nxt].sum(dtype=np.int64)
            s_v = v[nxt].sum(dtype=np.int64)
            area = np.abs(
                (t[a] * k - s_t) * (v[cand] - v[a])
                - (t[a] - t[cand]) * (s_v - v[a] * k)
            )
            a = int(cand[int(np.argmax(area))])  # argmax: first max wins
            keep.append(a)
        keep.append(n - 1)
        kp = np.array(keep)
        return pd.DataFrame(
            {"g": g, "idx": idx[kp], "t_s": t[kp], "v_i": v[kp]}
        )

    src = df.select(
        df[g_col].cast("string").alias("g"),
        df[idx_col].cast("long").alias("idx"),
        df[t_col].cast("long").alias("t_s"),
        df[v_col].cast("long").alias("v_i"),
    )
    from hatchery_spark.functions.udx import grouped_apply

    # one Python call per partition, not per series (many small groups —
    # the applyInPandas per-group frame setup dominated the stage)
    return grouped_apply(src, ["g"], pick, schema)


def lttb_oracle_sql(
    src_sql: str,
    g_expr: str,
    t_expr: str,
    v_expr: str,
    order_expr: str,
    m: int = 12,
) -> str:
    """DuckDB replay: the bucket arithmetic is static, so only the
    anchor is sequential — one CTE per interior bucket (m-2 of them),
    each a rank-1 window seeded by the previous CTE's winner. Small
    series (n <= m) pass through in a separate branch."""
    b = m - 2
    parts = [f"""
        WITH src AS ({src_sql}),
        pts AS (
          SELECT {g_expr} AS g,
                 cast(row_number() OVER (PARTITION BY {g_expr}
                                         ORDER BY {order_expr}) AS bigint)
                   AS idx,
                 cast({t_expr} AS bigint) AS t,
                 cast({v_expr} AS bigint) AS v,
                 cast(count(*) OVER (PARTITION BY {g_expr}) AS bigint) AS n
          FROM src),
        small AS (SELECT g, idx, t, v FROM pts WHERE n <= {m}),
        big AS (SELECT * FROM pts WHERE n > {m}),
        bkt AS (
          SELECT g, idx, t, v, n,
                 CASE WHEN idx = 1 THEN 0
                      WHEN idx = n THEN {b} + 1
                      ELSE 1 + ((idx - 2) * {b}) // (n - 2) END AS bucket
          FROM big),
        nav AS (
          SELECT g, bucket - 1 AS i,
                 sum(t) AS s_t, sum(v) AS s_v,
                 cast(count(*) AS bigint) AS k
          FROM bkt WHERE bucket BETWEEN 2 AND {b} GROUP BY g, bucket
          UNION ALL
          SELECT g, {b} AS i, t AS s_t, v AS s_v, 1 AS k
          FROM bkt WHERE bucket = {b} + 1),
        sel0 AS (SELECT g, idx, t, v FROM bkt WHERE bucket = 0)"""]
    for i in range(1, b + 1):
        parts.append(f""",
        sel{i} AS (
          SELECT g, idx, t, v FROM (
            SELECT c.g, c.idx, c.t, c.v,
                   row_number() OVER (PARTITION BY c.g ORDER BY
                     abs((a.t * nv.k - nv.s_t) * (c.v - a.v)
                         - (a.t - c.t) * (nv.s_v - a.v * nv.k)) DESC,
                     c.idx ASC) AS rn
            FROM bkt c
            JOIN sel{i - 1} a ON a.g = c.g
            JOIN nav nv ON nv.g = c.g AND nv.i = {i}
            WHERE c.bucket = {i})
          WHERE rn = 1)""")
    sels = "\n          UNION ALL ".join(
        f"SELECT g, idx, t, v FROM sel{i}" for i in range(b + 1)
    )
    parts.append(f"""
        SELECT g, idx, t AS t_s, v AS v_i FROM (
          {sels}
          UNION ALL SELECT g, idx, t, v FROM bkt WHERE bucket = {b} + 1
          UNION ALL SELECT g, idx, t, v FROM small)""")
    return "".join(parts)
