"""Normal-equation OLS fit."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hatchery_spark.functions.regression import _solve3, ols_fit_predict


def test_solve3_matches_numpy():
    rng = np.random.RandomState(7)
    X = np.column_stack([np.ones(200), rng.rand(200), rng.rand(200)])
    y = X @ np.array([2.0, -1.5, 0.25]) + rng.randn(200) * 0.01
    A = X.T @ X
    b = X.T @ y
    got = _solve3(
        A[0, 0], A[0, 1], A[0, 2], A[1, 1], A[1, 2], A[2, 2],
        b[0], b[1], b[2], rd_w=9,
    )
    expect = np.linalg.solve(A, b)
    assert np.allclose(got, expect, atol=1e-8)


def test_exact_linear_relationship_recovered(spark):
    # y = 1 + 2*x1 + 3*x2 exactly -> residuals all zero, weights exact
    rows = [(i, i / 7.0, (i * i % 11) / 3.0) for i in range(60)]
    df = spark.createDataFrame(rows, "k long, a double, b double")
    out = ols_fit_predict(
        df,
        x1=F.col("a"),
        x2=F.col("b"),
        y=F.lit(1.0) + 2 * F.col("a") + 3 * F.col("b"),
        keys=["k"],
    ).collect()
    r = out[0]
    # sums are rounded to 6 decimals before the solve, so recovery is
    # exact to ~1e-6, not bit-exact
    assert abs(r.w0 - 1.0) < 1e-6 and abs(r.w1 - 2.0) < 1e-6
    assert abs(r.w2 - 3.0) < 1e-6
    assert all(abs(row.residual) <= 1e-3 for row in out)


def test_collinear_features_raise(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(10)],
                               "k long, a double")
    with pytest.raises(ValueError, match="singular"):
        ols_fit_predict(
            df, x1=F.col("a"), x2=2 * F.col("a"), y=F.col("a"), keys=["k"]
        ).collect()


def test_single_aggregate_plan(spark):
    """Corpus-sized work is one partial-aggregated pass: the scoring plan
    has no exchange beyond the 1-row aggregate already consumed."""
    df = spark.createDataFrame(
        [(i, i / 3.0, i / 5.0) for i in range(40)], "k long, a double, b double"
    )
    out = ols_fit_predict(
        df, x1=F.col("a"), x2=F.col("b"), y=F.col("a") + F.col("b"), keys=["k"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_logreg_irls_matches_numpy_reference(spark):
    """3-round IRLS on separable-ish data: the Spark loop must reproduce a
    literal numpy replay (same roundings, same cofactor solve) and the
    learned boundary must classify the generating rule correctly."""
    from hatchery_spark.functions.regression import logreg_irls_fit_predict

    rows = [
        (i, (i % 13) / 6.0, ((i * 7) % 11) / 5.0) for i in range(120)
    ]
    # label: linear rule with margin -> IRLS should reach >95% accuracy
    data = [(k, a, b, 1 if (2.0 * a - 1.5 * b - 0.4) > 0 else 0)
            for k, a, b in rows]
    df = spark.createDataFrame(data, "k long, a double, b double, y int")
    out = logreg_irls_fit_predict(
        df, x1=F.col("a"), x2=F.col("b"), y=F.col("y"), keys=["k"], iters=3
    ).collect()

    # literal numpy replay of the rounded IRLS recursion
    X = np.array([[1.0, a, b] for _, a, b in rows])
    yv = np.array([d[3] for d in data], dtype=float)
    w = np.zeros(3)
    for _ in range(3):
        z = np.round(X @ w, 9)
        p = np.round(1.0 / (1.0 + np.exp(-z)), 7)
        r = p * (1 - p)
        A = (X * r[:, None]).T @ X
        g = X.T @ (yv - p)
        A6 = np.round(
            [A[0, 0], A[0, 1], A[0, 2], A[1, 1], A[1, 2], A[2, 2]], 6
        )
        g6 = np.round(g, 6)
        d = _solve3(*A6, *g6, rd_w=9)
        w = np.array([round(wi + di, 9) for wi, di in zip(w, d)])
    z = np.round(X @ w, 9)
    p_ref = np.round(1.0 / (1.0 + np.exp(-z)), 7)

    got = {r.k: r for r in out}
    for i, (k, _, _) in enumerate(rows):
        assert got[k].p == pytest.approx(p_ref[i], abs=1e-9)
    acc = np.mean([got[k].pred_label == d[3] for k, *_ , in rows
                   for d in [data[k]]])
    assert acc > 0.95
