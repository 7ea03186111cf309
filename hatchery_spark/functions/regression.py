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


def logreg_irls_fit_predict(
    df: DataFrame,
    x1: Column,
    x2: Column,
    y: Column,
    keys: list[str],
    iters: int = 3,
    rd_sums: int = 6,
    rd_w: int = 9,
    rd_z: int = 9,
    rd_p: int = 7,
) -> DataFrame:
    """Logistic-regression quality classifier trained by IRLS/Newton over
    the full corpus: per round ONE partially-aggregated pass computes the
    weighted normal-equation sums (A = Σ p(1-p)·xxᵀ, b = Σ (y-p)·x, nine
    doubles to the driver), the 3×3 solve reuses ``_solve3``, and scoring
    stays codegen. iters rounds = iters corpus passes — the classic
    fixed-iteration Newton shape, same as pagerank/BT.

    Cross-engine exactness: z is rounded before exp and p after (libm exp
    may differ in the last ulp between engines — the rounding grid is 1e9×
    coarser), sums and weights are rounded like the OLS path, and the
    oracle replays every round literally.
    """
    feats = df.select(*keys, x1.alias("x1"), x2.alias("x2"),
                      y.cast("double").alias("y")).persist()
    w = (0.0, 0.0, 0.0)
    for _ in range(iters):
        z = F.round(
            F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2"),
            rd_z,
        )
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), rd_p)
        r = p * (F.lit(1.0) - p)
        g = F.col("y") - p
        s = feats.agg(
            F.round(F.sum(r), rd_sums).alias("sr"),
            F.round(F.sum(r * F.col("x1")), rd_sums).alias("sr1"),
            F.round(F.sum(r * F.col("x2")), rd_sums).alias("sr2"),
            F.round(F.sum(r * F.col("x1") * F.col("x1")), rd_sums).alias("sr11"),
            F.round(F.sum(r * F.col("x1") * F.col("x2")), rd_sums).alias("sr12"),
            F.round(F.sum(r * F.col("x2") * F.col("x2")), rd_sums).alias("sr22"),
            F.round(F.sum(g), rd_sums).alias("g0"),
            F.round(F.sum(g * F.col("x1")), rd_sums).alias("g1"),
            F.round(F.sum(g * F.col("x2")), rd_sums).alias("g2"),
        ).collect()[0]
        d = _solve3(s.sr, s.sr1, s.sr2, s.sr11, s.sr12, s.sr22,
                    s.g0, s.g1, s.g2, rd_w)
        w = tuple(round(wi + di, rd_w) for wi, di in zip(w, d))
    z = F.round(
        F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2"), rd_z
    )
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), rd_p)
    return feats.select(
        *keys,
        p.alias("p"),
        F.col("y").cast("int").alias("label"),
        (p >= 0.5).cast("int").alias("pred_label"),
    )


def logreg_oracle_sql(
    feats_cte: str,
    keys: str,
    iters: int = 3,
    rd_sums: int = 6,
    rd_w: int = 9,
    rd_z: int = 9,
    rd_p: int = 7,
) -> str:
    """DuckDB replay of the IRLS fit: one (p, sums, cofactor solve, weight
    update) CTE block per round, then the scoring projection."""
    parts = [f"WITH f AS ({feats_cte}),\nw0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)"]
    for t in range(1, iters + 1):
        parts.append(f""",
p{t} AS (SELECT f.*, round(1/(1+exp(-round(w.w0 + w.w1*f.x1 + w.w2*f.x2,
                                           {rd_z}))), {rd_p}) AS p
         FROM f CROSS JOIN w{t - 1} w),
s{t} AS (SELECT
  round(sum(p*(1-p)), {rd_sums}) AS sr,
  round(sum(p*(1-p)*x1), {rd_sums}) AS sr1,
  round(sum(p*(1-p)*x2), {rd_sums}) AS sr2,
  round(sum(p*(1-p)*x1*x1), {rd_sums}) AS sr11,
  round(sum(p*(1-p)*x1*x2), {rd_sums}) AS sr12,
  round(sum(p*(1-p)*x2*x2), {rd_sums}) AS sr22,
  round(sum(y-p), {rd_sums}) AS g0,
  round(sum((y-p)*x1), {rd_sums}) AS g1,
  round(sum((y-p)*x2), {rd_sums}) AS g2
  FROM p{t}),
c{t} AS (SELECT *,
  sr11*sr22 - sr12*sr12 AS c00, -(sr1*sr22 - sr12*sr2) AS c01,
  sr1*sr12 - sr11*sr2 AS c02, sr*sr22 - sr2*sr2 AS c11,
  -(sr*sr12 - sr1*sr2) AS c12, sr*sr11 - sr1*sr1 AS c22
  FROM s{t}),
d{t} AS (SELECT *, sr*c00 + sr1*c01 + sr2*c02 AS det FROM c{t}),
w{t} AS (SELECT
  round(w.w0 + round((d.c00*d.g0 + d.c01*d.g1 + d.c02*d.g2)/d.det, {rd_w}),
        {rd_w}) AS w0,
  round(w.w1 + round((d.c01*d.g0 + d.c11*d.g1 + d.c12*d.g2)/d.det, {rd_w}),
        {rd_w}) AS w1,
  round(w.w2 + round((d.c02*d.g0 + d.c12*d.g1 + d.c22*d.g2)/d.det, {rd_w}),
        {rd_w}) AS w2
  FROM w{t - 1} w CROSS JOIN d{t} d)""")
    parts.append(f"""
SELECT {keys},
  round(1/(1+exp(-round(w.w0 + w.w1*f.x1 + w.w2*f.x2, {rd_z}))), {rd_p}) AS p,
  cast(f.y AS int) AS label,
  cast(round(1/(1+exp(-round(w.w0 + w.w1*f.x1 + w.w2*f.x2, {rd_z}))), {rd_p})
       >= 0.5 AS int) AS pred_label
FROM f CROSS JOIN w{iters} w""")
    return "".join(parts)
