"""Distributed least-squares fitting via normal equations.

The supervised counterpart of similarity.pca_power_project: a quality /
signal regression trained over the full corpus in ONE aggregate pass.
For two features + intercept the normal-equation system is 3×3, so the
corpus-sized work is exactly nine partially-aggregated sums (map-side
combined, no shuffle wider than the 1-row agg); the solve is a
closed-form adjugate on the driver and scoring is a pure codegen
projection. Nothing about the shape changes at 100 TB — driver traffic
is nine doubles.

Cross-engine exactness: the aggregated sums are rounded to ``rd_sums``
decimals (floating sums differ across engines only in trailing ulps —
far inside the grid at these magnitudes), the solve is replayed by the
oracle with the IDENTICAL cofactor expression sequence on those same
rounded inputs, and the weights/predictions are rounded again. All
arithmetic is +,*,/ — no transcendentals, so no libm divergence exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _solve3(
    n: float, s1: float, s2: float, s11: float, s12: float, s22: float,
    sy: float, s1y: float, s2y: float, rd_w: int,
) -> tuple[float, float, float]:
    """w = A⁻¹b for symmetric A=[[n,s1,s2],[s1,s11,s12],[s2,s12,s22]],
    b=[sy,s1y,s2y] — adjugate form, in the EXACT expression order the SQL
    oracle uses (floats are order-sensitive; the replay must be literal)."""
    c00 = s11 * s22 - s12 * s12
    c01 = -(s1 * s22 - s12 * s2)
    c02 = s1 * s12 - s11 * s2
    c11 = n * s22 - s2 * s2
    c12 = -(n * s12 - s1 * s2)
    c22 = n * s11 - s1 * s1
    det = n * c00 + s1 * c01 + s2 * c02
    if det == 0:
        raise ValueError("singular normal equations (collinear features)")
    w0 = (c00 * sy + c01 * s1y + c02 * s2y) / det
    w1 = (c01 * sy + c11 * s1y + c12 * s2y) / det
    w2 = (c02 * sy + c12 * s1y + c22 * s2y) / det
    return round(w0, rd_w), round(w1, rd_w), round(w2, rd_w)


def ols_fit_predict(
    df: DataFrame,
    x1: Column,
    x2: Column,
    y: Column,
    keys: list[str],
    rd_sums: int = 6,
    rd_w: int = 9,
    rd_pred: int = 4,
) -> DataFrame:
    """Fit y ~ w0 + w1·x1 + w2·x2 over the whole frame, return per-row
    ``(keys..., pred, residual)`` plus the fitted weights as columns."""
    feats = df.select(*keys, x1.alias("x1"), x2.alias("x2"), y.alias("y"))
    s = feats.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.round(F.sum("x1"), rd_sums).alias("s1"),
        F.round(F.sum("x2"), rd_sums).alias("s2"),
        F.round(F.sum(F.col("x1") * F.col("x1")), rd_sums).alias("s11"),
        F.round(F.sum(F.col("x1") * F.col("x2")), rd_sums).alias("s12"),
        F.round(F.sum(F.col("x2") * F.col("x2")), rd_sums).alias("s22"),
        F.round(F.sum("y"), rd_sums).alias("sy"),
        F.round(F.sum(F.col("x1") * F.col("y")), rd_sums).alias("s1y"),
        F.round(F.sum(F.col("x2") * F.col("y")), rd_sums).alias("s2y"),
    ).collect()[0]  # 1 row, 9 doubles — bounded at any corpus size
    w0, w1, w2 = _solve3(
        s.n, s.s1, s.s2, s.s11, s.s12, s.s22, s.sy, s.s1y, s.s2y, rd_w
    )
    pred = F.round(F.lit(w0) + F.lit(w1) * F.col("x1") + F.lit(w2) * F.col("x2"),
                   rd_pred)
    return feats.select(
        *keys,
        pred.alias("pred"),
        F.round(F.col("y") - pred, rd_pred).alias("residual"),
        F.lit(w0).alias("w0"),
        F.lit(w1).alias("w1"),
        F.lit(w2).alias("w2"),
    )


def ols_oracle_sql(
    feats_cte: str,
    keys: str,
    rd_sums: int = 6,
    rd_w: int = 9,
    rd_pred: int = 4,
) -> str:
    """DuckDB replay of fit+predict over a CTE named ``f`` exposing
    (keys..., x1, x2, y) — the same sums, the same cofactor expression
    order, the same roundings."""
    return f"""
WITH f AS ({feats_cte}),
s AS (SELECT cast(count(*) AS double) AS n,
       round(sum(x1), {rd_sums}) AS s1, round(sum(x2), {rd_sums}) AS s2,
       round(sum(x1*x1), {rd_sums}) AS s11, round(sum(x1*x2), {rd_sums}) AS s12,
       round(sum(x2*x2), {rd_sums}) AS s22,
       round(sum(y), {rd_sums}) AS sy, round(sum(x1*y), {rd_sums}) AS s1y,
       round(sum(x2*y), {rd_sums}) AS s2y
      FROM f),
c AS (SELECT *,
       s11*s22 - s12*s12 AS c00, -(s1*s22 - s12*s2) AS c01,
       s1*s12 - s11*s2 AS c02, n*s22 - s2*s2 AS c11,
       -(n*s12 - s1*s2) AS c12, n*s11 - s1*s1 AS c22
      FROM s),
d AS (SELECT *, n*c00 + s1*c01 + s2*c02 AS det FROM c),
w AS (SELECT
       round((c00*sy + c01*s1y + c02*s2y) / det, {rd_w}) AS w0,
       round((c01*sy + c11*s1y + c12*s2y) / det, {rd_w}) AS w1,
       round((c02*sy + c12*s1y + c22*s2y) / det, {rd_w}) AS w2
      FROM d)
SELECT {keys},
       round(w.w0 + w.w1*f.x1 + w.w2*f.x2, {rd_pred}) AS pred,
       round(f.y - round(w.w0 + w.w1*f.x1 + w.w2*f.x2, {rd_pred}), {rd_pred})
         AS residual,
       w.w0 AS w0, w.w1 AS w1, w.w2 AS w2
FROM f CROSS JOIN w"""
