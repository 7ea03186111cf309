"""Holt linear-trend forecasting (double exponential smoothing) over
per-actor daily activity, in exact integer fixed point.

EWMA (operators/sketches.py twin) tracks a level; CUSUM and the
seasonal-MAD baseline catch shifts and weekday shape — none of them
model a TREND, so a steadily ramping actor (exfil that doubles every
few days, a runaway retry loop) looks "normal" to all three until it
clears a static band. Holt's method (Holt 1957; Hyndman & Athanasopoulos
FPP §8.2) forecasts level + trend one step ahead and alerts on the
forecast residual instead.

With α = β = 1/2 the recurrences are pure integer arithmetic on
``SCALE``-multiplied counts (floor-div by 2 via the pmod identity, so
negative TRENDS stay exact on both engines):

    fc_t = l_{t-1} + b_{t-1}                       (one-step forecast)
    l_t  = (y_t + l_{t-1} + b_{t-1}) fdiv 2        (α = 1/2)
    b_t  = ((l_t - l_{t-1}) + b_{t-1}) fdiv 2      (β = 1/2)

No float exists anywhere → no rounding ties → the DuckDB oracle replays
every state bit-for-bit through a recursive CTE.

Scale shape: ONE (actor, day) partial agg over the corpus; the dense
grid, the per-actor fold (an ``aggregate`` HOF that carries the state
path as an array — series length is the day span, corpus-independent),
and the alert flags all run on the O(actors × days) grid. The min/max
date frame is a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 256            # fixed-point multiplier on daily counts
MIN_RESID_FP = 4 * SCALE  # alert floor: ≥ 4 events/day off forecast
#: alert when 2·|resid| > forecast AND |resid| ≥ floor — a relative
#: test via integer cross-multiplication (no float division anywhere)


def _fdiv2(x: Column) -> Column:
    """Floor division by 2 that both engines replay exactly for
    negative values: subtracting the non-negative pmod makes the
    numerator EVEN, so the division is exact and floor-vs-truncate
    semantics cannot diverge."""
    return ((x - F.pmod(x, F.lit(2))) / F.lit(2)).cast("long")


def holt_forecast(
    df: DataFrame,
    actor: Column,
    day: Column,
) -> DataFrame:
    """Per (actor, day) on the dense day grid: observed count, one-step
    Holt forecast, residual, alert — all BIGINT fixed point.

    Returns (actor, day_idx, y_n, forecast_fp, resid_fp, alert).
    Day 0 seeds l=y, b=0 and never alerts (fc := y)."""
    counts0 = df.groupBy(actor.alias("actor"), day.alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    span = counts0.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    counts = counts0.crossJoin(F.broadcast(span)).select(
        "actor",
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("day_idx"),
        "n",
    )
    actors = counts.select("actor").distinct()
    grid = (
        actors.crossJoin(F.broadcast(span))
        .select(
            "actor",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.datediff(F.col("d1"), F.col("d0")).cast("long"),
                )
            ).alias("day_idx"),
        )
        .join(counts, ["actor", "day_idx"], "left")
        .select(
            "actor",
            "day_idx",
            (F.coalesce(F.col("n"), F.lit(0)) * SCALE)
            .cast("long")
            .alias("y"),
        )
    )
    series = grid.groupBy("actor").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("day_idx"), F.col("y")))
        ).alias("s")
    )
    state = "struct<day_idx:bigint,y:bigint,l:bigint,b:bigint,fc:bigint>"
    path = F.aggregate(
        F.slice(F.col("s"), 2, F.size(F.col("s"))),
        F.array(
            F.struct(
                F.element_at(F.col("s"), 1).day_idx.alias("day_idx"),
                F.element_at(F.col("s"), 1).y.alias("y"),
                F.element_at(F.col("s"), 1).y.alias("l"),
                F.lit(0).cast("long").alias("b"),
                F.element_at(F.col("s"), 1).y.alias("fc"),
            )
        ).cast(f"array<{state}>"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.struct(
                    x.day_idx.alias("day_idx"),
                    x.y.alias("y"),
                    _fdiv2(
                        x.y
                        + F.element_at(acc, -1).l
                        + F.element_at(acc, -1).b
                    ).cast("long").alias("l"),
                    _fdiv2(
                        _fdiv2(
                            x.y
                            + F.element_at(acc, -1).l
                            + F.element_at(acc, -1).b
                        ).cast("long")
                        - F.element_at(acc, -1).l
                        + F.element_at(acc, -1).b
                    ).cast("long").alias("b"),
                    (
                        F.element_at(acc, -1).l + F.element_at(acc, -1).b
                    ).alias("fc"),
                )
            ),
        ),
    )
    out = series.select("actor", F.explode(path).alias("p")).select(
        "actor",
        F.col("p.day_idx").alias("day_idx"),
        (F.col("p.y") / SCALE).cast("long").alias("y_n"),
        F.col("p.fc").alias("forecast_fp"),
        (F.col("p.y") - F.col("p.fc")).alias("resid_fp"),
        (
            (F.abs(F.col("p.y") - F.col("p.fc")) * 2 > F.col("p.fc"))
            & (F.abs(F.col("p.y") - F.col("p.fc")) >= MIN_RESID_FP)
            & (F.col("p.day_idx") > 0)
        ).alias("alert"),
    )
    return out


def holt_oracle_sql(src_sql: str, actor_expr: str, day_expr: str) -> str:
    """DuckDB replay: dense grid + recursive-CTE state walk — every
    level/trend/forecast value must match the HOF fold bit-for-bit."""
    return f"""
        WITH RECURSIVE src AS ({src_sql}),
        counts0 AS (
          SELECT {actor_expr} AS actor, {day_expr} AS day,
                 cast(count(*) AS bigint) AS n
          FROM src GROUP BY 1, 2),
        span AS (SELECT min(day) AS d0, max(day) AS d1 FROM counts0),
        counts AS (
          SELECT actor,
                 cast(date_diff('day', span.d0, day) AS bigint) AS day_idx,
                 n
          FROM counts0, span),
        days AS (
          SELECT cast(u.i AS bigint) AS day_idx
          FROM span,
               unnest(range(0, date_diff('day', d0, d1) + 1)) AS u(i)),
        grid AS (
          SELECT a.actor, d.day_idx,
                 coalesce(c.n, 0) * {SCALE} AS y
          FROM (SELECT DISTINCT actor FROM counts) a
          CROSS JOIN days d
          LEFT JOIN counts c ON c.actor = a.actor
                            AND c.day_idx = d.day_idx),
        holt AS (
          SELECT actor, day_idx, y, y AS l, cast(0 AS bigint) AS b, y AS fc
          FROM grid WHERE day_idx = 0
          UNION ALL
          SELECT s.actor, s.day_idx, s.y,
                 s.lnew AS l,
                 (s.lnew - s.l_prev + s.b_prev
                  - ((((s.lnew - s.l_prev + s.b_prev) % 2) + 2) % 2)) // 2
                   AS b,
                 s.l_prev + s.b_prev AS fc
          FROM (
            SELECT g.actor, g.day_idx, g.y, h.l AS l_prev, h.b AS b_prev,
                   (g.y + h.l + h.b
                    - ((((g.y + h.l + h.b) % 2) + 2) % 2)) // 2 AS lnew
            FROM holt h JOIN grid g
              ON g.actor = h.actor AND g.day_idx = h.day_idx + 1) s)
        SELECT actor, day_idx,
               y // {SCALE} AS y_n,
               fc AS forecast_fp,
               y - fc AS resid_fp,
               abs(y - fc) * 2 > fc AND abs(y - fc) >= {MIN_RESID_FP}
                 AND day_idx > 0 AS alert
        FROM holt"""
