"""Error-bound pins for the approximate aggregates (A5 scale path).

At 10^12 rows the exact count-distinct / percentile paths shuffle every
distinct value; the approx variants (HLL++ / KLL-style quantile sketch)
are the scale answer.  These tests pin the error CONTRACT so a Spark
upgrade or config drift that degrades sketch accuracy fails CI.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_approx_count_distinct_error_bound(spark):
    # 40,000 distinct keys over 120,000 rows
    df = spark.range(120_000).select((F.col("id") % 40_000).alias("k"))
    exact = df.select(F.countDistinct("k")).first()[0]
    for rsd, tol in ((0.05, 3), (0.02, 3)):
        approx = df.select(F.approx_count_distinct("k", rsd=rsd)).first()[0]
        rel = abs(approx - exact) / exact
        assert rel <= tol * rsd, f"rsd={rsd}: rel err {rel:.4f} > {tol}x rsd"
    assert exact == 40_000


def test_percentile_approx_vs_exact(spark):
    # skewed doubles: x^2 over a uniform grid
    df = spark.range(50_000).select((F.col("id") * F.col("id")).cast("double").alias("v"))
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    exact = df.select(F.percentile("v", F.array(*[F.lit(q) for q in qs]))).first()[0]
    approx = df.select(
        F.percentile_approx("v", F.array(*[F.lit(q) for q in qs]), F.lit(10_000))
    ).first()[0]
    n = 50_000
    for q, e, a in zip(qs, exact, approx):
        # percentile_approx(accuracy=A) guarantees rank error <= n/A
        rank_tol = n / 10_000 + 1
        # translate rank tolerance to value tolerance on the x^2 grid:
        # neighbors at rank r differ by <= (2r+1); bound loosely
        r = q * n
        val_tol = (2 * (r + rank_tol) + 1) * rank_tol
        assert abs(a - e) <= val_tol, (q, e, a)
