"""Deterministic sampling / split / heavy-hitters oracles.

Covers what the driver queries can't: layout independence (the r4-ADVICE
IVF-seed lesson), the xxhash64 production path, boundary ties at k, and
the zero-shuffle plan contract.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from gips_spark.operators import sampling
from gips_spark.operators.relational import heavy_hitters


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("lang"),
    ).cache()


@pytest.mark.parametrize("method", ["xxhash64", "portable"])
def test_split_layout_independent(spark, docs, method):
    a = sampling.stratified_split(docs, method=method)
    b = sampling.stratified_split(docs.repartition(13, "lang"), method=method)
    rows_a = dict(a.select("doc_id", "split").collect())
    rows_b = dict(b.select("doc_id", "split").collect())
    assert rows_a == rows_b
    # proportions roughly 80/10/10 overall AND within each stratum
    from collections import Counter

    overall = Counter(rows_a.values())
    assert abs(overall["train"] / 2000 - 0.8) < 0.05
    per = a.groupBy("lang", "split").count().collect()
    for r in per:
        frac = {"train": 0.8, "val": 0.1, "test": 0.1}[r["split"]]
        assert abs(r["count"] / 400 - frac) < 0.1


def test_split_fraction_validation(docs):
    with pytest.raises(ValueError, match="fractions sum"):
        sampling.stratified_split(docs, fractions=(("a", 0.5), ("b", 0.2)))
    with pytest.raises(ValueError, match="unknown hash method"):
        sampling.hash_bucket("doc_id", method="md5")


def test_stratified_sample(spark, docs):
    out = sampling.stratified_sample(
        docs, "lang", {"s0": 1.0, "s1": 0.25, "s2": 0.0}, method="portable"
    )
    got = out.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    assert by["s0"] == 400                      # fraction 1.0 keeps all
    assert "s2" not in by and "s3" not in by    # 0.0 and missing drop all
    assert abs(by["s1"] / 400 - 0.25) < 0.1
    # determinism across partitionings
    again = sampling.stratified_sample(
        docs.repartition(7), "lang", {"s0": 1.0, "s1": 0.25, "s2": 0.0},
        method="portable",
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_heavy_hitters_exact_with_boundary_ties(spark):
    # frequencies: v0..v9 appear (10-i) times → ties everywhere when
    # truncated; k=3 boundary has a unique order by (n desc, val asc)
    rows = [(f"v{i}",) for i in range(10) for _ in range(10 - i)]
    # plant a tie: v8 and v9 both get +5 (so counts 2+5=7, 1+5=6 → make
    # them equal to v3's 7 and v4's 6)
    rows += [("v8",)] * 5 + [("v9",)] * 5
    df = spark.createDataFrame(rows, "val string")
    top = heavy_hitters(df, "val", 4).collect()
    got = [(r["rank"], r["val"], r["n"]) for r in sorted(top, key=lambda r: r["rank"])]
    # counts: v0=10 v1=9 v2=8 v3=7 v8=7 v4=6 v9=6 ... tie at n=7 broken
    # by val asc → v3 before v8; k=4 cuts INSIDE the tie pair
    assert got == [(1, "v0", 10), (2, "v1", 9), (3, "v2", 8), (4, "v3", 7)]


def test_sampling_plans_zero_shuffle(spark, docs):
    for df in (
        sampling.stratified_split(docs),
        sampling.stratified_sample(docs, "lang", {"s0": 0.5}),
    ):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan and "EvalPython" not in plan


def test_group_quota_determinism_and_cap(spark):
    """group_quota: per-group cap enforced, layout-independent row SET,
    qrank contiguous from 1, xxhash64 and portable paths both valid."""
    from gips_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, f"s{i % 7}") for i in range(500)], "doc_id long, source string"
    )
    for method in ("portable", "xxhash64"):
        out = sampling.group_quota(df, "source", 9, method=method).collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r["source"], []).append(r["qrank"])
        assert len(by_g) == 7
        for g, rks in by_g.items():
            assert sorted(rks) == list(range(1, 10))
        again = sampling.group_quota(
            df.repartition(13, "doc_id"), "source", 9, method=method
        ).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # quota larger than group: everything survives
    assert sampling.group_quota(df, "source", 1000).count() == 500


@pytest.mark.parametrize("method", ["xxhash64", "portable"])
def test_group_quota_two_level_bit_identical(spark, method):
    """r6 scale fix: the bucketed two-level plan (prefilter_buckets) must
    be BIT-IDENTICAL to the single-window plan — rows AND qranks — on a
    planted mega-domain (60% of rows in one group)."""
    from gips_spark.operators import sampling

    rows = [(i, "mega" if i % 5 < 3 else f"s{i % 11}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    one = sampling.group_quota(
        df, "source", 17, method=method, prefilter_buckets=None
    ).collect()
    two = sampling.group_quota(
        df.repartition(13, "doc_id"), "source", 17, method=method,
        prefilter_buckets=8,
    ).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, two))
    # default path is the two-level plan and matches too
    dflt = sampling.group_quota(df, "source", 17, method=method).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, dflt))


def test_group_quota_two_level_bounds_stage1(spark):
    """The stage-1 window key (group, pmod(order_hash, B)) actually
    spreads a mega-group: no (group, bucket) cell holds more than
    ~rows/B·(1+slack) of the mega-group's rows."""
    from gips_spark.operators import sampling

    n, B = 20_000, 16
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("mega").alias("source")
    )
    bkt = F.pmod(
        sampling.hash_bucket("doc_id", 1 << 20, method="xxhash64", seed=42),
        F.lit(B),
    )
    per = df.groupBy(bkt.alias("b")).count().collect()
    assert len(per) == B
    assert max(r["count"] for r in per) < (n / B) * 1.25
