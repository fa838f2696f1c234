"""Sequence-packing operators (operators/packing.py): GPT-style
concatenate-and-chunk layout + no-straddle next-fit, invariants and
cross-checks."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gips_spark.operators import packing


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(11)
    rows = [
        (int(i), " ".join(["w"] * int(rng.integers(0, 40)))) for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_sequences_python_cross_check(spark, docs):
    out = packing.pack_sequences(
        docs, pack_tokens=64, n_buckets=8, hash_method="portable"
    ).collect()
    got = {r["doc_id"]: r for r in out}
    rows = docs.select(
        "doc_id",
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .alias("n"),
    ).collect()
    by_bucket = {}
    for r in sorted(rows, key=lambda x: x["doc_id"]):
        b = ((r["doc_id"] % 1_000_003) * 2_654_435_761 + 12_345) % 999_983 % 8
        by_bucket.setdefault(b, []).append((r["doc_id"], r["n"]))
    for b, lst in by_bucket.items():
        start = 0
        for doc_id, n in lst:
            g = got[doc_id]
            assert g["bucket"] == b
            assert g["start_tok"] == start
            assert g["pack_seq"] == start // 64
            assert g["offset_in_pack"] == start % 64
            start += n


def test_pack_sequences_layout_independent(spark, docs):
    a = packing.pack_sequences(docs, pack_tokens=64, n_buckets=8).collect()
    b = packing.pack_sequences(
        docs.repartition(13, "text"), pack_tokens=64, n_buckets=8
    ).collect()
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(a) == key(b)


def test_nextfit_invariants(spark, docs):
    cap = 64
    out = packing.pack_sequences_nextfit(
        docs, pack_tokens=cap, n_buckets=8
    ).collect()
    packs = {}
    for r in out:
        packs.setdefault((r["bucket"], r["pack_seq"]), []).append(r)
    assert len(out) == docs.count()
    for (_, _), members in packs.items():
        members.sort(key=lambda r: r["doc_id"])
        total = sum(r["n_tokens"] for r in members)
        if any(r["oversize"] for r in members):
            # an oversize doc owns its pack exclusively
            assert len(members) == 1 and members[0]["n_tokens"] > cap
        else:
            assert total <= cap
        # running offsets are exact
        run = 0
        for r in members:
            assert r["offset_in_pack"] == run
            run += r["n_tokens"]


def test_nextfit_oversize_and_order(spark):
    rows = [
        (1, " ".join(["a"] * 10)),
        (2, " ".join(["b"] * 100)),  # oversize at cap 64
        (3, " ".join(["c"] * 60)),
        (4, " ".join(["d"] * 5)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in packing.pack_sequences_nextfit(
            df, pack_tokens=64, n_buckets=1
        ).collect()
    }
    assert out[2]["oversize"] and out[2]["offset_in_pack"] == 0
    # doc 1 in pack 0; oversize doc 2 alone in pack 1; doc 3 in pack 2
    # (60 doesn't fit after... it opens fresh); doc 4 joins doc 3's pack
    # (60 + 5 > 64 -> actually opens pack 3)
    assert out[1]["pack_seq"] == 0
    assert out[2]["pack_seq"] == 1
    assert out[3]["pack_seq"] == 2
    assert out[4]["pack_seq"] == 3  # 60+5 > 64


def test_pack_sequences_plan_single_shuffle_jvm(spark, docs):
    plan = (
        packing.pack_sequences(docs, pack_tokens=64, n_buckets=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in plan
